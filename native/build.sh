#!/bin/bash
# Build the native host-runtime library into native/build/.
set -e
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -G Ninja -DCMAKE_BUILD_TYPE=Release .. >/dev/null
ninja
echo "built: $(ls -la libhslam_loader.so | awk '{print $9, $5}')"
