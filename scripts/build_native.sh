#!/bin/bash
# Build the native host-runtime pieces (ctypes-loaded shared objects).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -std=c++20 -shared -fPIC -o native/libaccel_pack.so native/accel_pack.cpp
echo "built native/libaccel_pack.so"
