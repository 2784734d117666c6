#!/bin/sh
# Builds the native decode runtime (libmtt_runtime.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -o libmtt_runtime.so decode.cpp -ljpeg -lpng
echo "built $(pwd)/libmtt_runtime.so"
