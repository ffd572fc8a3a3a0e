"""Unitig sequence splicing (reference ma_ug_seq, asm.c:236-290).

Each read contributes its trimmed prefix (forward) or the reverse
complement of its trimmed suffix (reverse) to the unitig at its golden-path
offset; unfilled bases stay 'N'.  The complement table is the standard
IUPAC complement with U->A and case preserved, identical to the
reference's comp_tab (asm.c:225-233).
"""

from __future__ import annotations

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
    tab[128:] = ord("N")
    return tab


COMP_TAB = _comp_tab()


def ug_seq(ug, d, sub_s, sub_e, fn: str) -> None:
    """Fill Unitig.s in place from the reads file."""
    n_seq = d.n_seq
    t_utg = np.full(n_seq, -1, dtype=np.int64)
    t_ori = np.zeros(n_seq, dtype=np.uint8)
    t_start = np.zeros(n_seq, dtype=np.int64)
    t_len = np.zeros(n_seq, dtype=np.int64)
    bufs = []
    for i, u in enumerate(ug.u):
        bufs.append(np.full(u.len, ord("N"), dtype=np.uint8))
        l = 0
        for (vtx, ll) in u.a:
            x = vtx >> 1
            assert t_len[x] == 0  # a read joins at most one unitig (asm.c:255)
            t_utg[x] = i
            t_ori[x] = vtx & 1
            t_start[x] = l
            t_len[x] = ll
            l += ll

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
