#!/bin/bash
# Build the reference kernels (unmodified, from /root/reference) together with
# the golden generator, run it, and write tests/golden/golden.json.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -std=c++11 -DNDEBUG -msse2 -fopenmp \
    -I/root/reference/include \
    -I/root/reference/src/Kernels/default \
    -I/root/reference/src/Kernels/AVX-SSE \
    gen_golden.cpp \
    /root/reference/src/Kernels/default/DefaultKernel.cpp \
    /root/reference/src/Kernels/AVX-SSE/SSEKernel.cpp \
    -o build/gen_golden
./build/gen_golden golden.json
python3 -c "import json; d=json.load(open('golden.json')); print(len(d), 'golden cases')"
