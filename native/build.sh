#!/bin/sh
# Build the tario native data-path library.
# Optional $1: output path (the auto-builder passes a temp name and
# renames atomically so concurrent workers never dlopen a partial .so).
set -e
cd "$(dirname "$0")"
out="${1:-libtario.so}"
g++ -O3 -march=native -shared -fPIC -std=c++17 tario.cpp -o "$out" -ljpeg -lpthread
echo "built $out"
