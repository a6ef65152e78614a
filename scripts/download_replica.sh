#!/bin/bash
# Fetch the Replica SLAM sequences (NICE-SLAM packaging) and install the
# camera parameters (reference scripts/download_replica.sh).
set -e
mkdir -p datasets
wget https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip -P datasets
unzip -q datasets/Replica.zip -d datasets
cp datasets/replica.json datasets/Replica/camera_parameters.json
