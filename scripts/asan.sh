#!/bin/bash
# AddressSanitizer + UBSan job for the native C++ layer (SURVEY.md §5:
# the host C++ replaces single-threaded reference code with allocation-
# heavy, multi-threaded loaders, so it gets the sanitizer treatment the
# reference never had).
#
# Builds every .cpp under miniasm_tpu/io/native with ASan+UBSan and runs
# the native-touching test files against that build.  LD_PRELOAD is
# required because the sanitized code lives in a dlopen'd library under
# an unsanitized python.  Leak checking is disabled (CPython itself
# "leaks" interned objects at exit); all memory-error and UB interceptors
# stay active.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${ASAN_BUILD_DIR:-/tmp/miniasm_asan}
mkdir -p "$OUT"
g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
    -fno-omit-frame-pointer -shared -fPIC -std=c++17 -pthread \
    -o "$OUT/libminiasm_native.so" miniasm_tpu/io/native/*.cpp -lz

# The driver stays off the jax/XLA path: XLA's runtime trips ASan's
# interceptors on its own (unsanitizable) code, so the sanitized process
# exercises the ctypes surface directly (scripts/asan_driver.py).
LIBASAN=$(g++ -print-file-name=libasan.so)
ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
LD_PRELOAD="$LIBASAN" \
PYTHONPATH= \
MINIASM_TPU_NATIVE_SO="$OUT/libminiasm_native.so" \
python scripts/asan_driver.py
echo "ASan/UBSan: clean"
