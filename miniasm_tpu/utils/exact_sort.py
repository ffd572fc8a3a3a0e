"""Exact-permutation emulation of the reference's radix sort.

The reference sorts hits and arcs with an in-place MSD radix sort
(KRADIX_SORT_INIT, ksort.h:134-183): 8-bit digits top-down, cycle-leader
distribution, insertion sort for buckets <= 64 (RS_MIN_SIZE).  That sort is
NOT stable — the relative order of equal keys is a deterministic function
of the input permutation — and the tie order leaks into the output (hit
dump order, arc slot order, hence del_multi/biloop/unitig decisions).
Byte-parity therefore requires reproducing the exact permutation, not just
a sorted order.

The permutation depends only on the key sequence (records move atomically,
decisions read only keys), so running the same algorithm on (key, index)
pairs yields the reference's exact row permutation.

Used on the host at the two points the reference sorts: once over hits
after reading (hit.c:104) and once over arcs at first cleanup
(asg.c:22-25, gated by is_srt).  A native C++ implementation (io/native)
is used when compiled; the Python fallback is exact but slow on large
inputs.
"""

from __future__ import annotations

import numpy as np

RS_MIN_SIZE = 64


def radix_argsort(keys: np.ndarray) -> np.ndarray:
    """Return the permutation the reference radix sort would produce for
    these u64 keys."""
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    try:
        from ..io.native import build

        lib = build.get_lib()
        if lib is not None:
            return _native(lib, keys)
    except Exception:
        pass
    return _python(keys)


def _native(lib, keys: np.ndarray) -> np.ndarray:
    import ctypes

    n = len(keys)
    idx = np.arange(n, dtype=np.int64)
    kcopy = keys.copy()
    lib.ma_radix_argsort_u64(
        kcopy.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n))
    return idx


def _python(keys: np.ndarray) -> np.ndarray:
    keys = keys.copy()
    n = len(keys)
    idx = np.arange(n, dtype=np.int64)
    if n <= RS_MIN_SIZE:
        _insert(keys, idx, 0, n)
        return idx
    _rs_sort(keys, idx, 0, n, 56)
    return idx


def _insert(keys, idx, lo, hi):
    """Stable sort of a small range (matches the reference's strictly-less
    insertion sort, ksort.h:138-147)."""
    order = np.argsort(keys[lo:hi], kind="stable")
    keys[lo:hi] = keys[lo:hi][order]
    idx[lo:hi] = idx[lo:hi][order]


def _rs_sort(keys, idx, lo, hi, s):
    """One MSD pass: counting, cycle-leader distribution, recursion
    (ksort.h:149-177)."""
    d = ((keys[lo:hi] >> np.uint64(s)) & np.uint64(0xFF)).astype(np.int64)
    cnt = np.bincount(d, minlength=256)
    ends = lo + np.cumsum(cnt)
    starts = ends - cnt
    b = starts.copy()  # per-bucket fill pointer

    k = 0
    while k < 256:
        if b[k] != ends[k]:
            l = int((keys[b[k]] >> np.uint64(s)) & np.uint64(0xFF))
            if l != k:
                tmp_k = keys[b[k]]
                tmp_i = idx[b[k]]
                while True:
                    swap_k, swap_i = tmp_k, tmp_i
                    tmp_k, tmp_i = keys[b[l]], idx[b[l]]
                    keys[b[l]] = swap_k
                    idx[b[l]] = swap_i
                    b[l] += 1
                    l = int((tmp_k >> np.uint64(s)) & np.uint64(0xFF))
                    if l == k:
                        break
                keys[b[k]] = tmp_k
                idx[b[k]] = tmp_i
                b[k] += 1
            else:
                b[k] += 1
        else:
            k += 1

    if s:
        s2 = s - 8 if s > 8 else 0
        for k2 in range(256):
            if cnt[k2] > RS_MIN_SIZE:
                _rs_sort(keys, idx, int(starts[k2]), int(ends[k2]), s2)
            elif cnt[k2] > 1:
                _insert(keys, idx, int(starts[k2]), int(ends[k2]))
