#!/bin/bash
# Fetch the 7-Scenes sequences used by the configs and install camera
# parameters (reference scripts/download_7_scenes.sh).
set -e
mkdir -p datasets/7_Scenes
cd datasets/7_Scenes
for scene in chess fire office pumpkin; do
  wget "http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8/${scene}.zip"
  unzip -q "${scene}.zip"
  rm "${scene}.zip"
  # unpack the first sequence of each scene as <scene>-01
  (cd "${scene}" && unzip -q seq-01.zip)
  mkdir -p "${scene}-01"
  mv "${scene}/seq-01" "${scene}-01/seq-01"
done
cd ../..
cp datasets/7_scenes.json datasets/7_Scenes/camera_parameters.json
