#!/bin/sh
# Build the native geometry library (run once; nerf_vo_tpu/native/__init__.py
# also builds on first import if g++ is available).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    src/geometry.cc -o libnvtgeom.so
echo "built $(pwd)/libnvtgeom.so"
