"""Fused device pipeline for Steps 2-3 (read selection).

One jitted kernel performs: crude coverage sweep -> coordinate cut -> arc
filter -> fine coverage sweep -> second cut -> interval merge -> containment
marking.  Hits stay on device the whole time; physical compaction is
replaced by a validity mask (row order is preserved, so the result is
exactly the reference's compacted array filtered at the end).

Shapes are padded to power-of-two buckets so the jit cache is reused
across similarly-sized inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT
from .subregion import hit_sub
from .cut import hit_cut


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=(
    "n_seq_cap", "min_span", "min_dp", "min_iden", "max_hang", "int_frac",
    "min_ovlp", "do_flt"))
def _select_kernel(colmat, n_seq, *, n_seq_cap, min_span, min_dp, min_iden,
                   max_hang, int_frac, min_ovlp, do_flt):
    """colmat: (10, N) int32 [qid qs qe tid ts te ml bl rev valid]."""
    qid, qs, qe, tid, ts, te, ml, bl, rev, valid = [colmat[i] for i in range(10)]
    valid = valid.astype(bool) & (qid < n_seq)
    del_dummy = n_seq_cap  # dummy segment for masked rows

    def masked(v):
        return (jnp.where(v, qid, del_dummy), jnp.where(v, tid, del_dummy + 1))

    # --- Step 2: crude selection, end_clip = 0 (main.c:122) ---
    qid_m, tid_m = masked(valid)
    s1, e1, d1 = hit_sub(qid_m, tid_m, jnp.where(valid, qs, 0),
                         jnp.where(valid, qe, 0), ml, bl,
                         n_seq_cap + 1, min_dp, min_iden, 0)
    keep, qs, qe, ts, te = hit_cut(qid, tid, qs, qe, ts, te, rev,
                                   s1, e1, d1, min_span)
    valid = valid & keep
    n_cut1 = jnp.sum(valid)

    # --- arc filter with relaxed params (main.c:125, hit.c:195-216) ---
    if do_flt:
        sl = e1.astype(jnp.int32) - s1.astype(jnp.int32)
        c = hit2arc(qid, qs, qe, tid, ts, te, rev, sl[qid], sl[tid],
                    int(max_hang * 1.5), 0.5, int(min_ovlp * 0.5))
        r = c["r"]
        alive = ~(d1[qid] | d1[tid])
        keep = alive & ((r >= 0) | (r == MA_HT_QCONT) | (r == MA_HT_TCONT))
        dp = jnp.where(r >= 0, r, jnp.where(r == MA_HT_QCONT, sl[qid], sl[tid]))
        dp_sum = jnp.sum(jnp.where(valid & keep, dp, 0).astype(jnp.float32))
        valid = valid & keep
    else:
        dp_sum = jnp.float32(0)
    n_flt = jnp.sum(valid)

    # --- Step 3: fine selection, end_clip = min_span/2 (main.c:132) ---
    qid_m, tid_m = masked(valid)
    s2, e2, d2 = hit_sub(qid_m, tid_m, jnp.where(valid, qs, 0),
                         jnp.where(valid, qe, 0), ml, bl,
                         n_seq_cap + 1, min_dp, min_iden, min_span // 2)
    keep, qs, qe, ts, te = hit_cut(qid, tid, qs, qe, ts, te, rev,
                                   s2, e2, d2, min_span)
    valid = valid & keep
    n_cut2 = jnp.sum(valid)

    # --- interval merge (ma_sub_merge, hit.c:218-223) ---
    ms = s1 + s2
    me = s1 + e2
    mdel = d1 | d2

    # --- containment marks with final params (hit.c:230-236) ---
    sl = me.astype(jnp.int32) - ms.astype(jnp.int32)
    c = hit2arc(qid, qs, qe, tid, ts, te, rev, sl[qid], sl[tid],
                max_hang, int_frac, min_ovlp)
    r = jnp.where(valid, c["r"], 0)
    cont = jnp.zeros(n_seq_cap + 2, dtype=bool)
    cont = cont.at[jnp.where(r == MA_HT_QCONT, qid, n_seq_cap + 1)].set(True)
    cont = cont.at[jnp.where(r == MA_HT_TCONT, tid, n_seq_cap + 1)].set(True)

    out = jnp.stack([qid, qs.astype(jnp.int32), qe.astype(jnp.int32),
                     tid, ts.astype(jnp.int32), te.astype(jnp.int32),
                     ml, bl, rev, valid.astype(jnp.int32)])
    counts = jnp.stack([n_cut1, n_flt, n_cut2,
                        dp_sum.astype(jnp.int32)])  # dp_sum: log-only, approx
    subtab = jnp.stack([ms.astype(jnp.int32), me.astype(jnp.int32),
                        mdel.astype(jnp.int32), cont[:-1].astype(jnp.int32)])
    return out, subtab, counts


def select_fused(hits, d, opt, *, do_flt=True):
    """Run Steps 2+3 device-fused; returns (hits_kept, sub_s, sub_e,
    sub_del, cont_mask, log dict).  Host-side squeeze happens in the
    caller."""
    from ..core.hits import Hits

    n = hits.n
    n_seq = d.n_seq
    cap = _next_pow2(max(n, 1))
    n_seq_cap = _next_pow2(max(n_seq, 1))
    colmat = np.zeros((10, cap), dtype=np.int32)
    for i, c in enumerate(hits.cols()):
        colmat[i, :n] = np.asarray(c, dtype=np.int64).astype(np.int32)
    colmat[9, :n] = 1

    out, subtab, counts = _select_kernel(
        jnp.asarray(colmat), n_seq,
        n_seq_cap=n_seq_cap, min_span=opt.min_span, min_dp=opt.min_dp,
        min_iden=float(opt.min_iden), max_hang=opt.max_hang,
        int_frac=float(opt.int_frac), min_ovlp=opt.min_ovlp, do_flt=do_flt)
    out = np.asarray(out)
    subtab = np.asarray(subtab)[:, :n_seq + 1]
    counts = [int(x) for x in np.asarray(counts)]

    valid = out[9].astype(bool)
    kept = Hits(out[0][valid].astype(np.int32),
                out[1][valid].astype(np.uint32), out[2][valid].astype(np.uint32),
                out[3][valid].astype(np.int32),
                out[4][valid].astype(np.uint32), out[5][valid].astype(np.uint32),
                out[6][valid].astype(np.uint32), out[7][valid].astype(np.uint32),
                out[8][valid].astype(np.uint8))
    sub_s = subtab[0][:n_seq].astype(np.uint32)
    sub_e = subtab[1][:n_seq].astype(np.uint32)
    sub_del = subtab[2][:n_seq].astype(bool)
    cont = subtab[3][:n_seq].astype(bool)
    return kept, sub_s, sub_e, sub_del, cont, counts
