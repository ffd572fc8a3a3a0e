"""Device-resident hit store.

The reference keeps hits as a heap array of 32-byte packed structs sorted by
a u64 radix key qns=(qid<<32|qstart) (ma_hit_t, miniasm.h:29-34; sort
hit.c:12-22).  Here hits are SoA int32/uint32 columns; grouping uses a
stable two-key sort by (qid, qs), which preserves the reference's tie order
(insertion order) exactly because the reference's LSB radix sort is stable
and its key is only (qid, qs).

Construction order parity (reference hit.c:82-99): for each surviving PAF
record, the forward hit is appended, then — when bi_dir and qid != tid —
its mirror (q and t swapped).  We reproduce this with an interleave +
stable compaction, all vectorized.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io.paf import PafLoad
from ..utils.timers import log

COLS = ("qid", "qs", "qe", "tid", "ts", "te", "ml", "bl", "rev", "del_")


@dataclasses.dataclass
class Hits:
    """SoA hit columns. May live as numpy (host) or jax (device) arrays."""

    qid: np.ndarray   # int32   query read id
    qs: np.ndarray    # uint32  query start
    qe: np.ndarray    # uint32  query end
    tid: np.ndarray   # int32   target read id
    ts: np.ndarray    # uint32
    te: np.ndarray    # uint32
    ml: np.ndarray    # uint32  matching bases (PAF col 10)
    bl: np.ndarray    # uint32  block length (PAF col 11)
    rev: np.ndarray   # uint8   strand (1 = reverse)

    @property
    def n(self) -> int:
        return len(self.qid)

    def cols(self):
        return [self.qid, self.qs, self.qe, self.tid, self.ts, self.te,
                self.ml, self.bl, self.rev]

    def take(self, idx) -> "Hits":
        return Hits(*[np.asarray(c)[idx] for c in self.cols()])

    def copy(self) -> "Hits":
        return Hits(*[np.array(c) for c in self.cols()])


def build_hits(load: PafLoad, bi_dir: bool = True) -> Hits:
    """Mirror + stable sort (reference hit.c:92-104). Host-side numpy; the
    result is uploaded to device once per pipeline run."""
    n = load.n
    if not bi_dir:
        h = Hits(load.qid.astype(np.int32), load.qs, load.qe,
                 load.tid.astype(np.int32), load.ts, load.te,
                 load.ml, load.bl, load.rev)
    else:
        # interleave fwd/mirror, keep mirror slots only when qid != tid
        keep = np.ones(2 * n, dtype=bool)
        keep[1::2] = load.qid != load.tid

        def inter(a, b, dtype):
            out = np.empty(2 * n, dtype=dtype)
            out[0::2] = a
            out[1::2] = b
            return out

        h = Hits(
            qid=inter(load.qid, load.tid, np.int32),
            qs=inter(load.qs, load.ts, np.uint32),
            qe=inter(load.qe, load.te, np.uint32),
            tid=inter(load.tid, load.qid, np.int32),
            ts=inter(load.ts, load.qs, np.uint32),
            te=inter(load.te, load.qe, np.uint32),
            ml=inter(load.ml, load.ml, np.uint32),
            bl=inter(load.bl, load.bl, np.uint32),
            rev=inter(load.rev, load.rev, np.uint8),
        ).take(keep)
    tot_len = int(np.sum(load.d.lens_array(), dtype=np.uint64))
    log("hit_read", "read %d hits; stored %d hits and %d sequences (%d bp)",
        load.n_lines, h.n, load.d.n_seq, tot_len)
    return sort_hits(h)


def sort_hits(h: Hits) -> Hits:
    """Sort by the reference's radix key qns = qid<<32|qs (hit.c:12-13)
    with the reference's EXACT (unstable) tie permutation — the in-place MSD
    radix of ksort.h is not stable and its tie order leaks into output order
    (see utils/exact_sort.py)."""
    from ..utils.exact_sort import radix_argsort

    key = (np.asarray(h.qid, dtype=np.uint64) << np.uint64(32)) \
        | np.asarray(h.qs, dtype=np.uint64)
    order = radix_argsort(key)
    return h.take(order)


def mark_unused(d, h: Hits) -> None:
    """Mark reads that appear in no surviving hit as deleted (reference
    ma_hit_mark_unused, hit.c:24-36)."""
    used = np.zeros(d.n_seq, dtype=bool)
    used[h.qid] = True
    used[h.tid] = True
    d.mark_deleted(~used)
