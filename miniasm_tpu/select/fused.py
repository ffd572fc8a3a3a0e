"""Fused device pipeline for Steps 2-3 (read selection).

One jitted kernel performs: crude coverage sweep -> coordinate cut -> arc
filter -> fine coverage sweep -> second cut -> interval merge -> containment
marking (and optionally final arc classification).  Hits stay on device the
whole time; physical compaction is replaced by a validity mask (row order
is preserved, so the result is exactly the reference's compacted array
filtered at the end).

TPU performance notes (measured on v5e):
  - XLA's general multi-operand sort is O(n log^2 n) bitonic and falls off
    a cliff at tens of millions of rows; the coverage sweep therefore uses
    the row-wise formulation (hit_sub_rows) with only gathers, small
    row-sorts and row-cumsums;
  - compaction uses nonzero+gather, not a sort;
  - arcs are filtered down to live reads ON DEVICE before download (at high
    coverage most arcs touch contained reads and would be dropped by the
    host squeeze anyway — this cuts the download by orders of magnitude).

Shapes are padded to power-of-two buckets so the jit cache is reused
across similarly-sized inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT
from .subregion import hit_sub_rows
from .cut import hit_cut


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=(
    "n_seq_cap", "k_cap", "min_span", "min_dp", "min_iden", "max_hang",
    "int_frac", "min_ovlp", "do_flt", "emit_arcs"))
def _select_kernel(colmat, n_seq, *, n_seq_cap, k_cap, min_span, min_dp,
                   min_iden, max_hang, int_frac, min_ovlp, do_flt,
                   emit_arcs=False):
    """colmat: (10, N) int32 [qid qs qe tid ts te ml bl rev valid]; qid of
    padding rows must be >= n_seq_cap (sorted sentinel)."""
    qid, qs, qe, tid, ts, te, ml, bl, rev, valid = [colmat[i] for i in range(10)]
    valid = valid.astype(bool)

    # --- Step 2: crude selection, end_clip = 0 (main.c:122) ---
    s1, e1, d1 = hit_sub_rows(qid, tid, qs, qe, ml, bl, valid,
                              n_seq_cap + 1, k_cap, min_dp, min_iden, 0)
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
    s2, e2, d2 = hit_sub_rows(qid, tid, qs, qe, ml, bl, valid,
                              n_seq_cap + 1, k_cap, min_dp, min_iden,
                              min_span // 2)
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

    counts = jnp.stack([n_cut1, n_flt, n_cut2,
                        dp_sum.astype(jnp.int32)])  # dp_sum: log-only, approx
    subtab = jnp.stack([ms.astype(jnp.int32), me.astype(jnp.int32),
                        mdel.astype(jnp.int32), cont[:-1].astype(jnp.int32)])

    if not emit_arcs:
        out = jnp.stack([qid, qs.astype(jnp.int32), qe.astype(jnp.int32),
                         tid, ts.astype(jnp.int32), te.astype(jnp.int32),
                         ml, bl, rev, valid.astype(jnp.int32)])
        return out, subtab, counts

    # --- graph-build outputs (ma_sg_gen, asm.c:9-39), staying on device ---
    # `c` already holds the final-parameter classification of every row.
    # `used` must reflect hits BEFORE containment removal (hit.c:24-36).
    used = jnp.zeros(n_seq_cap + 2, dtype=bool)
    used = used.at[jnp.where(valid, qid, n_seq_cap + 1)].set(True)
    used = used.at[jnp.where(valid, tid, n_seq_cap + 1)].set(True)
    is_self = qid == tid
    pal_rows = (valid & (c["r"] >= 0) & is_self & (qs == ts) & (qe == te)
                & (rev != 0))
    pal = jnp.zeros(n_seq_cap + 2, dtype=bool)
    pal = pal.at[jnp.where(pal_rows, qid, n_seq_cap + 1)].set(True)

    # device-side equivalent of the host squeeze's read-drop condition
    # (hit.c:237-251): a read survives iff used and not sub-deleted and not
    # contained.  Arcs touching dropped reads are filtered here, before the
    # download — the host only remaps ids of survivors.
    read_alive = used[:-1] & ~mdel[:n_seq_cap + 1] & ~cont[:-1]
    arc_rows = (valid & (c["r"] >= 0) & ~is_self
                & read_alive[jnp.minimum(qid, n_seq_cap)]
                & read_alive[jnp.minimum(tid, n_seq_cap)])
    # stable compaction via nonzero+gather (order-preserving, sort-free)
    n = qid.shape[0]
    idx = jnp.nonzero(arc_rows, size=n, fill_value=n - 1)[0]
    arcmat = jnp.stack([c["u"][idx], c["l"][idx], c["v"][idx], c["ol"][idx]])
    n_arc = jnp.sum(arc_rows)
    aux = jnp.stack([used[:-1].astype(jnp.int32), pal[:-1].astype(jnp.int32)])
    return arcmat, n_arc, aux, subtab, counts


def _upload(hits, n_seq, n_seq_cap):
    n = hits.n
    cap = _next_pow2(max(n, 1))
    colmat = np.zeros((10, cap), dtype=np.int32)
    for i, c in enumerate(hits.cols()):
        colmat[i, :n] = np.asarray(c).astype(np.int32, copy=False)
    colmat[0, n:] = n_seq_cap + 1  # sorted sentinel for padding rows
    colmat[9, :n] = 1
    return jnp.asarray(colmat)


def _k_cap(hits, n_seq) -> int:
    deg = np.bincount(np.asarray(hits.qid), minlength=max(n_seq, 1))
    return _next_pow2(max(int(deg.max()) if len(deg) else 1, 16))


def select_build(hits, d, opt):
    """Steps 2-3 + graph-arc classification in one device kernel; downloads
    only the (device-filtered) arc columns and per-read masks.  Returns
    (arcs dict, used, pal, sub_s, sub_e, sub_del, cont, counts)."""
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    dev = _upload(hits, n_seq, n_seq_cap)
    return _select_build_dev(dev, _k_cap(hits, n_seq), n_seq, n_seq_cap, opt)


def select_build_colmat(colmat, n_hits: int, d, opt):
    """select_build over a pre-assembled colmat (native one-shot loader)."""
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    deg = np.bincount(colmat[0, :n_hits], minlength=max(n_seq, 1))
    k_cap = _next_pow2(max(int(deg.max()) if len(deg) else 1, 16))
    return _select_build_dev(jnp.asarray(colmat), k_cap, n_seq, n_seq_cap, opt)


def _select_build_dev(dev, k_cap, n_seq, n_seq_cap, opt):
    arcmat, n_arc, aux, subtab, counts = _select_kernel(
        dev, n_seq,
        n_seq_cap=n_seq_cap, k_cap=k_cap,
        min_span=opt.min_span, min_dp=opt.min_dp,
        min_iden=float(opt.min_iden), max_hang=opt.max_hang,
        int_frac=float(opt.int_frac), min_ovlp=opt.min_ovlp, do_flt=True,
        emit_arcs=True)
    n_arc = int(n_arc)
    arcs = np.asarray(arcmat[:, :n_arc])  # device slice -> small download
    aux = np.asarray(aux)[:, :n_seq]
    subtab = np.asarray(subtab)[:, :n_seq]
    counts = [int(x) for x in np.asarray(counts)]
    return (
        {"u": arcs[0].astype(np.int32), "l": arcs[1].astype(np.int32),
         "v": arcs[2].astype(np.int32), "ol": arcs[3].astype(np.int32)},
        aux[0].astype(bool), aux[1].astype(bool),
        subtab[0].astype(np.uint32), subtab[1].astype(np.uint32),
        subtab[2].astype(bool), subtab[3].astype(bool), counts)


def select_fused(hits, d, opt, *, do_flt=True):
    """Run Steps 2+3 device-fused; returns (hits_kept, sub_s, sub_e,
    sub_del, cont_mask, counts).  Host-side squeeze happens in the
    caller."""
    from ..core.hits import Hits

    n = hits.n
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    dev = _upload(hits, n_seq, n_seq_cap)
    out, subtab, counts = _select_kernel(
        dev, n_seq,
        n_seq_cap=n_seq_cap, k_cap=_k_cap(hits, n_seq),
        min_span=opt.min_span, min_dp=opt.min_dp,
        min_iden=float(opt.min_iden), max_hang=opt.max_hang,
        int_frac=float(opt.int_frac), min_ovlp=opt.min_ovlp, do_flt=do_flt)
    out = np.asarray(out)
    subtab = np.asarray(subtab)[:, :n_seq]
    counts = [int(x) for x in np.asarray(counts)]

    valid = out[9].astype(bool)
    kept = Hits(out[0][valid].astype(np.int32),
                out[1][valid].astype(np.uint32), out[2][valid].astype(np.uint32),
                out[3][valid].astype(np.int32),
                out[4][valid].astype(np.uint32), out[5][valid].astype(np.uint32),
                out[6][valid].astype(np.uint32), out[7][valid].astype(np.uint32),
                out[8][valid].astype(np.uint8))
    sub_s = subtab[0].astype(np.uint32)
    sub_e = subtab[1].astype(np.uint32)
    sub_del = subtab[2].astype(bool)
    cont = subtab[3].astype(bool)
    return kept, sub_s, sub_e, sub_del, cont, counts
