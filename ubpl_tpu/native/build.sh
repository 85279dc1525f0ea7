#!/usr/bin/env bash
# Build libubpl_io.so (threaded PNG/JPEG decode + resize for the host pipeline).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libubpl_io.so io.cc -lpng -ljpeg -lz -lpthread
echo "built $(pwd)/libubpl_io.so"
