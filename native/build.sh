#!/bin/sh
# Build the tario native data-path library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 tario.cpp -o libtario.so -ljpeg -lpthread
echo "built $(pwd)/libtario.so"
