#!/bin/sh
# Build native components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -fPIC -shared -o lib/librle.so rle/rle.cc
echo "built native/lib/librle.so"
