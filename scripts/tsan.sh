#!/bin/bash
# ThreadSanitizer job for the native C++ layer (SURVEY.md §5 race
# detection).  The loader pipeline runs a reader thread, parser workers,
# an in-order consumer, an async rank-sort thread, and the threaded
# radix's bucket workers — all absent from the single-threaded
# reference, so data-race coverage is this rebuild's own obligation.
#
# Reuses the sanitizer driver (it exercises every threaded entry point:
# the MT loader's full pipeline, rank_async + join, free-with-threads-
# mid-flight, and the multi-threaded exact radix).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${TSAN_BUILD_DIR:-/tmp/miniasm_tsan}
mkdir -p "$OUT"
g++ -O1 -g -fsanitize=thread -fno-omit-frame-pointer -shared -fPIC \
    -std=c++17 -pthread \
    -o "$OUT/libminiasm_native.so" miniasm_tpu/io/native/*.cpp -lz

LIBTSAN=$(g++ -print-file-name=libtsan.so)
TSAN_OPTIONS=halt_on_error=1:report_bugs=1 \
LD_PRELOAD="$LIBTSAN" \
PYTHONPATH= \
MINIASM_TPU_NATIVE_SO="$OUT/libminiasm_native.so" \
python scripts/asan_driver.py
echo "TSan: clean"
