#!/bin/bash
# Fetch the TUM-RGBD sequences used by the configs and install camera
# parameters (reference scripts/download_tum_rgbd.sh).
set -e
mkdir -p datasets/TUM_RGBD
cd datasets/TUM_RGBD
for seq in \
  rgbd_dataset_freiburg1_desk \
  rgbd_dataset_freiburg2_xyz \
  rgbd_dataset_freiburg3_long_office_household; do
  family=$(echo "$seq" | sed -E 's/.*freiburg([0-9]).*/freiburg\1/')
  wget "https://cvg.cit.tum.de/rgbd/dataset/${family}/${seq}.tgz"
  tar -xzf "${seq}.tgz"
  rm "${seq}.tgz"
done
cd ../..
cp datasets/tum_rgbd.json datasets/TUM_RGBD/camera_parameters.json
