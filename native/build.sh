#!/bin/sh
# Build the native data-plane library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread sdumc_data.cc -o libsdumc_data.so
echo "built $(pwd)/libsdumc_data.so"
