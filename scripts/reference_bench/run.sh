#!/bin/bash
# Build + run the reference-kernel baseline benchmark on this host CPU.
# Writes REFERENCE_BENCH.json at the repo root.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -std=c++11 -DNDEBUG -msse2 -mavx -mavx2 -fopenmp \
    -I/root/reference/include \
    -I/root/reference/src/Kernels/default \
    -I/root/reference/src/Kernels/AVX-SSE \
    bench_reference.cpp \
    /root/reference/src/Kernels/default/DefaultKernel.cpp \
    /root/reference/src/Kernels/AVX-SSE/SSEKernel.cpp \
    /root/reference/src/Kernels/AVX-SSE/AVXKernel.cpp \
    -o build/bench_reference
./build/bench_reference ../../REFERENCE_BENCH.json
echo "wrote REFERENCE_BENCH.json"
