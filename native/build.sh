#!/bin/sh
# Build the native host-preprocessing library (ctypes-loaded; no pybind11).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fopenmp -shared -fPIC depth_ops.cc -o libdepthops.so
echo "built $(pwd)/libdepthops.so"
