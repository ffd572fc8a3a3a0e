"""Unitig sequence splicing (reference ma_ug_seq, asm.c:236-290).

Each read contributes its trimmed prefix (forward) or the reverse
complement of its trimmed suffix (reverse) to the unitig at its golden-path
offset; unfilled bases stay 'N'.  The complement table is the standard
IUPAC complement with U->A and case preserved, identical to the
reference's comp_tab (asm.c:225-233), including its backtick->'@' quirk.

The production path streams the reads file in C++ (io/native/fastx.cpp)
so -f does not bottleneck in Python at C. elegans scale; the Python path
below is the fallback/spec.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..io.fastx import read_fastx

_PAIRS = {"A": "T", "B": "V", "C": "G", "D": "H", "G": "C", "H": "D",
          "K": "M", "M": "K", "R": "Y", "T": "A", "U": "A", "V": "B",
          "Y": "R"}


def _comp_tab() -> np.ndarray:
    tab = np.arange(256, dtype=np.uint8)
    for a, b in _PAIRS.items():
        tab[ord(a)] = ord(b)
        tab[ord(a.lower())] = ord(b.lower())
    tab[ord("`")] = ord("@")  # reference comp_tab[96] == 64 (asm.c:232)
    tab[128:] = ord("N")
    return tab


COMP_TAB = _comp_tab()


class _MaUgSeqOut(ctypes.Structure):
    _fields_ = [
        ("total_len", ctypes.c_int64),
        ("n_utg", ctypes.c_int64),
        ("offsets", ctypes.POINTER(ctypes.c_int64)),
        ("seq", ctypes.POINTER(ctypes.c_char)),
    ]


def _read_tables(ug, n_seq):
    """Per-read (utg, ori, start, len) golden-path table (asm.c:247-260)."""
    t_utg = np.full(n_seq, -1, dtype=np.int64)
    t_ori = np.zeros(n_seq, dtype=np.uint8)
    t_start = np.zeros(n_seq, dtype=np.int64)
    t_len = np.zeros(n_seq, dtype=np.int64)
    for i, u in enumerate(ug.u):
        l = 0
        for (vtx, ll) in u.a:
            x = vtx >> 1
            assert t_len[x] == 0  # a read joins at most one unitig (asm.c:255)
            t_utg[x] = i
            t_ori[x] = vtx & 1
            t_start[x] = l
            t_len[x] = ll
            l += ll
    return t_utg, t_ori, t_start, t_len


def _ug_seq_native(ug, d, sub_s, sub_e, fn: str) -> bool:
    from ..io.native import available
    from ..io.native.build import get_lib

    if not available():
        return False
    lib = get_lib()
    lib.ma_ug_seq_native.restype = ctypes.POINTER(_MaUgSeqOut)
    lib.ma_ug_seq_native.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32)]
    lib.ma_ug_seq_free.argtypes = [ctypes.POINTER(_MaUgSeqOut)]

    n_seq = d.n_seq
    t_utg, t_ori, t_start, t_len = _read_tables(ug, n_seq)
    blob = ("\0".join(d.names) + "\0").encode("latin-1") if n_seq else b"\0"
    has_sub = sub_s is not None
    ss = np.ascontiguousarray(sub_s if has_sub else np.zeros(n_seq),
                              dtype=np.uint32)
    se = np.ascontiguousarray(sub_e if has_sub else np.zeros(n_seq),
                              dtype=np.uint32)
    tu = np.ascontiguousarray(t_utg, dtype=np.int64)
    to = np.ascontiguousarray(t_ori, dtype=np.uint8)
    tst = np.ascontiguousarray(t_start, dtype=np.uint32)
    tl = np.ascontiguousarray(t_len, dtype=np.uint32)
    ulen = np.ascontiguousarray([u.len for u in ug.u], dtype=np.uint32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    res = lib.ma_ug_seq_native(
        fn.encode(), n_seq, blob, len(blob), 1 if has_sub else 0,
        ptr(ss, ctypes.c_uint32), ptr(se, ctypes.c_uint32),
        ptr(tu, ctypes.c_int64), ptr(to, ctypes.c_uint8),
        ptr(tst, ctypes.c_uint32), ptr(tl, ctypes.c_uint32),
        len(ug.u), ptr(ulen, ctypes.c_uint32))
    if not res:
        return False
    r = res.contents
    offs = np.ctypeslib.as_array(r.offsets, shape=(len(ug.u) + 1,))
    blob_out = ctypes.string_at(r.seq, int(r.total_len))
    for i, u in enumerate(ug.u):
        u.s = blob_out[offs[i]:offs[i + 1]].decode("latin-1")
    lib.ma_ug_seq_free(res)
    return True


def ug_seq(ug, d, sub_s, sub_e, fn: str) -> None:
    """Fill Unitig.s in place from the reads file."""
    if not os.environ.get("MINIASM_TPU_NO_NATIVE"):
        if _ug_seq_native(ug, d, sub_s, sub_e, fn):
            return
    n_seq = d.n_seq
    t_utg, t_ori, t_start, t_len = _read_tables(ug, n_seq)
    bufs = [np.full(u.len, ord("N"), dtype=np.uint8) for u in ug.u]

    for name, seq in read_fastx(fn):
        rid = d.get(name)
        if rid < 0 or t_len[rid] == 0:
            continue
        if sub_s is not None:
            s0, e0 = int(sub_s[rid]), int(sub_e[rid])
            assert e0 - s0 <= len(seq)
            seq = seq[s0:e0]
        arr = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        L = int(t_len[rid])
        st = int(t_start[rid])
        buf = bufs[t_utg[rid]]
        if not t_ori[rid]:  # forward: first L bases
            buf[st:st + L] = arr[:L]
        else:  # reverse: complement of the last L bases, reversed
            buf[st:st + L] = COMP_TAB[arr[::-1][:L]]

    for u, b in zip(ug.u, bufs):
        u.s = b.tobytes().decode("latin-1")
