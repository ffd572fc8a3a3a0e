"""Containment removal + dense renumbering (reference ma_hit_contained,
hit.c:225-256).

Device part: classify every hit with the final parameters and scatter
containment deletions onto the trim table.  Host part: propagate deletions
into the name dictionary, drop reads appearing in no hit (hit.c:24-36),
squeeze ids (order-preserving), and remap/compact hits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT
from ..utils.timers import log


def contained_marks(qid, tid, qs, qe, ts, te, rev,
                    sub_s, sub_e, n_seq: int,
                    max_hang: int, int_frac: float, min_ovlp: int):
    """Device kernel: per-read containment deletion mask."""
    i32 = jnp.int32
    qid = jnp.asarray(qid).astype(i32)
    tid = jnp.asarray(tid).astype(i32)
    sub_s = jnp.asarray(sub_s).astype(i32)
    sub_e = jnp.asarray(sub_e).astype(i32)
    ql = sub_e[qid] - sub_s[qid]
    tl = sub_e[tid] - sub_s[tid]
    c = hit2arc(qid, qs, qe, tid, ts, te, rev, ql, tl,
                max_hang, int_frac, min_ovlp)
    r = c["r"]
    del_mask = jnp.zeros(n_seq, dtype=bool)
    del_mask = del_mask.at[jnp.where(r == MA_HT_QCONT, qid, 0)].max(r == MA_HT_QCONT)
    del_mask = del_mask.at[jnp.where(r == MA_HT_TCONT, tid, 0)].max(r == MA_HT_TCONT)
    return del_mask


def hit_contained(opt, d, sub_s, sub_e, sub_del, hits):
    """Full pass. Mutates `d` (squeeze); returns (hits', sub_s', sub_e',
    sub_del') with dense new ids."""
    n_seq = d.n_seq
    dmask = np.asarray(contained_marks(
        hits.qid, hits.tid, hits.qs, hits.qe, hits.ts, hits.te, hits.rev,
        sub_s, sub_e, n_seq, opt.max_hang, opt.int_frac, opt.min_ovlp))
    return apply_contained(d, sub_s, sub_e, sub_del, dmask, hits)


def apply_contained(d, sub_s, sub_e, sub_del, cont_mask, hits):
    """Host half of ma_hit_contained (hit.c:237-256): propagate deletions,
    drop unused reads, squeeze ids, remap + compact hits."""
    from ..core.hits import Hits

    n_seq = d.n_seq
    sub_del = np.asarray(sub_del) | np.asarray(cont_mask)

    # sub deletions -> dict deletions (hit.c:237-238)
    d.mark_deleted(sub_del)
    # reads appearing in no hit -> deleted (ma_hit_mark_unused, hit.c:24-36)
    used = np.zeros(n_seq, dtype=bool)
    used[np.asarray(hits.qid)] = True
    used[np.asarray(hits.tid)] = True
    d.mark_deleted(~used)

    mp = d.squeeze()  # order-preserving dense renumber (sdict.c:69-86)
    keep_read = mp >= 0
    sub_s = np.asarray(sub_s)[keep_read]
    sub_e = np.asarray(sub_e)[keep_read]
    sub_del = sub_del[keep_read]

    qn = mp[np.asarray(hits.qid)]
    tn = mp[np.asarray(hits.tid)]
    keep = (qn >= 0) & (tn >= 0)
    new = Hits(qn.astype(np.int32), *[np.asarray(c) for c in hits.cols()[1:3]],
               tn.astype(np.int32), *[np.asarray(c) for c in hits.cols()[4:9]]).take(keep)
    log("hit_contained", "%d sequences and %d hits remain after containment removal",
        d.n_seq, new.n)
    return new, sub_s, sub_e, sub_del
