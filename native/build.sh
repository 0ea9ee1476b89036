#!/bin/sh
# Build the native data plane: native/build.sh [outdir]
set -e
cd "$(dirname "$0")"
OUT="${1:-.}"
g++ -O3 -march=native -ffast-math -funroll-loops -fPIC -shared -std=c++17 dataplane.cpp \
    -o "$OUT/libddt_dataplane.so" -ljpeg -lpng -lpthread
echo "built $OUT/libddt_dataplane.so"
