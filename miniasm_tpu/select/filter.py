"""Arc-classification hit filter + crude coverage estimate (reference
ma_hit_flt, hit.c:195-216).

Keeps hits that classify as proper overlaps or containments under relaxed
parameters (the caller passes max_hang*1.5, min_ovlp*0.5; int_frac is the
hardcoded 0.5 of hit.c:205) and estimates global coverage for the log.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT


def hit_flt(qid, tid, qs, qe, ts, te, rev,
            sub_s, sub_e, sub_del, max_hang: int, min_ovlp: int):
    """Returns (keep bool, dp int32 per-hit depth contribution)."""
    i32 = jnp.int32
    qid = jnp.asarray(qid).astype(i32)
    tid = jnp.asarray(tid).astype(i32)
    sub_s = jnp.asarray(sub_s).astype(i32)
    sub_e = jnp.asarray(sub_e).astype(i32)
    sub_del = jnp.asarray(sub_del)
    ql = sub_e[qid] - sub_s[qid]
    tl = sub_e[tid] - sub_s[tid]
    alive = ~(sub_del[qid] | sub_del[tid])

    c = hit2arc(qid, qs, qe, tid, ts, te, rev, ql, tl,
                max_hang, 0.5, min_ovlp)
    r = c["r"]
    keep = alive & ((r >= 0) | (r == MA_HT_QCONT) | (r == MA_HT_TCONT))
    dp = jnp.where(r >= 0, r, jnp.where(r == MA_HT_QCONT, ql, tl))
    dp = jnp.where(keep, dp, 0)
    return keep, dp


def flt_coverage(kept_qid, dp_sum, sub_s, sub_e, n_kept) -> float:
    """Crude coverage = total depth / total length of queries present in the
    surviving hits (hit.c:209-212). Host-side; log-only in the reference."""
    import numpy as np

    kept_qid = np.asarray(kept_qid)[:n_kept]
    if len(kept_qid) == 0:
        return 0.0
    uq = np.unique(kept_qid)
    tot_len = int(np.sum(np.asarray(sub_e)[uq].astype(np.int64)
                         - np.asarray(sub_s)[uq].astype(np.int64)))
    return float(dp_sum) / tot_len if tot_len else 0.0
