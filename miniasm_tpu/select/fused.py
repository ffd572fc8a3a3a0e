"""Fused device pipeline for Steps 2-3 (read selection).

One jitted kernel performs: crude coverage sweep -> coordinate cut -> arc
filter -> fine coverage sweep -> second cut -> interval merge -> containment
marking (and optionally final arc classification).  Hits stay on device the
whole time; physical compaction is replaced by a validity mask (row order
is preserved, so the result is exactly the reference's compacted array
filtered at the end).

TPU performance notes (measured on v5e):
  - the coverage sweep uses the flat segmented formulation (hit_sub_flat):
    one 2-key lax.sort over the 2N events + flat scans; padded per-query
    row matrices lose to it because their construction gather is the
    dominant cost at TPU gather throughput;
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
from .subregion import hit_sub_flat
from .cut import hit_cut


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@functools.partial(jax.jit, static_argnames=(
    "n_seq_cap", "min_span", "min_dp", "max_hang",
    "int_frac", "min_ovlp", "do_flt", "emit_arcs", "arc_cap"))
def _select_kernel(colmat, *, n_seq_cap, min_span, min_dp,
                   max_hang, int_frac, min_ovlp, do_flt,
                   emit_arcs=False, arc_cap=0):
    """colmat: (7, N) int32 [qid qs qe tid ts te flags]; flags bit0=valid,
    bit1=rev, bit2=iden_ok (precomputed ml >= bl*min_iden, hit.c:127); qid
    of padding rows must be >= n_seq_cap (sorted sentinel)."""
    qid, qs, qe, tid, ts, te, flags = [colmat[i] for i in range(7)]
    valid = (flags & 1).astype(bool)
    rev = (flags >> 1) & 1
    iden_ok = ((flags >> 2) & 1).astype(bool)

    # --- Step 2: crude selection, end_clip = 0 (main.c:122) ---
    s1, e1, d1 = hit_sub_flat(qid, tid, qs, qe, iden_ok, valid,
                              n_seq_cap + 1, min_dp, 0)
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
    s2, e2, d2 = hit_sub_flat(qid, tid, qs, qe, iden_ok, valid,
                              n_seq_cap + 1, min_dp, min_span // 2)
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

    if not emit_arcs:
        counts = jnp.stack([n_cut1, n_flt, n_cut2,
                            dp_sum.astype(jnp.int32)])  # dp_sum: log-only
        subtab = jnp.stack([ms.astype(jnp.int32), me.astype(jnp.int32),
                            mdel.astype(jnp.int32), cont[:-1].astype(jnp.int32)])
        # bed/paf path: only coordinates + validity change; qid/tid/ml/bl/
        # rev are re-attached host-side from the caller's copy
        out = jnp.stack([qs.astype(jnp.int32), qe.astype(jnp.int32),
                         ts.astype(jnp.int32), te.astype(jnp.int32),
                         valid.astype(jnp.int32)])
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
    # into a statically-capped buffer: everything the host needs comes back
    # in ONE device_get (transfer round-trips dominate at this scale)
    n = qid.shape[0]
    n_arc = jnp.sum(arc_rows)
    idx = jnp.nonzero(arc_rows, size=arc_cap, fill_value=n - 1)[0]
    arcmat = jnp.stack([c["u"][idx], c["l"][idx], c["v"][idx], c["ol"][idx]])
    meta = jnp.stack([ms.astype(jnp.int32), me.astype(jnp.int32),
                      mdel.astype(jnp.int32), cont[:-1].astype(jnp.int32),
                      used[:-1].astype(jnp.int32), pal[:-1].astype(jnp.int32)])
    counts = jnp.stack([n_cut1, n_flt, n_cut2, dp_sum.astype(jnp.int32),
                        n_arc])  # dp_sum: log-only, approx
    return arcmat, meta, counts


def _bucket(n: int) -> int:
    """Pad row counts to a 64K multiple: bounded jit-shape churn (the
    persistent compile cache absorbs it) with <=5% upload overhead, vs the
    up-to-2x overhead of power-of-two padding."""
    step = 65536
    if n <= 4096:
        return _next_pow2(max(n, 1))
    return ((n + step - 1) // step) * step


def pack_flags(ml, bl, rev, valid, min_iden: float):
    """flags column: bit0 valid, bit1 rev, bit2 iden_ok.  The identity test
    is float32 like the reference's float ma_opt_t.min_iden (hit.c:127)."""
    iden_ok = ~(np.asarray(ml).astype(np.float32)
                < np.asarray(bl).astype(np.float32) * np.float32(min_iden))
    return (np.asarray(valid).astype(np.int32)
            | (np.asarray(rev).astype(np.int32) << 1)
            | (iden_ok.astype(np.int32) << 2))


def _upload(hits, n_seq_cap, min_iden):
    n = hits.n
    cap = _bucket(n)
    colmat = np.zeros((7, cap), dtype=np.int32)
    cols = list(hits.cols())  # qid qs qe tid ts te ml bl rev
    for i, c in enumerate(cols[:6]):
        colmat[i, :n] = np.asarray(c).astype(np.int32, copy=False)
    colmat[6, :n] = pack_flags(cols[6], cols[7], cols[8], 1, min_iden)
    colmat[0, n:] = n_seq_cap + 1  # sorted sentinel for padding rows
    return jnp.asarray(colmat)


def select_build(hits, d, opt):
    """Steps 2-3 + graph-arc classification in one device kernel; downloads
    only the (device-filtered) arc columns and per-read masks.  Returns
    (arcs dict, used, pal, sub_s, sub_e, sub_del, cont, counts)."""
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    dev = _upload(hits, n_seq_cap, float(opt.min_iden))
    return _select_build_dev(dev, n_seq, n_seq_cap, opt)


def select_build_colmat(colmat, n_hits: int, d, opt):
    """select_build over a pre-assembled (7, cap) colmat (native one-shot
    loader, which also packs the flags column)."""
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    return _select_build_dev(jnp.asarray(colmat), n_seq, n_seq_cap, opt)


@functools.partial(jax.jit, static_argnames=("n_seq_cap", "cap"))
def mirror_gather(orig, perm, *, n_seq_cap, cap):
    """Reconstruct the mirrored, exact-radix-ordered hit colmat on device
    from the UNMIRRORED original columns and the sorted permutation
    (orig_i<<1 | is_mirror, -1 = padding).  The mirror swaps query/target
    (hit.c:92-98); rev/iden flags are shared.  One HBM gather replaces
    ~25% of the tunnel upload.

    `orig` is either (7, ocap) int32 full columns or the packed
    (19, ocap) uint8 form from the native loader's kind-2 chunks: three
    little-endian byte planes per id/coordinate column plus one flags
    byte (pafread.cpp ma_hits_fill_chunk)."""
    perm = perm[:cap]
    i = jnp.maximum(perm >> 1, 0)
    m = (perm & 1).astype(bool)
    ok = perm >= 0
    if orig.dtype == jnp.uint8:
        b = orig.astype(jnp.int32)
        cols = [b[3 * c] | (b[3 * c + 1] << 8) | (b[3 * c + 2] << 16)
                for c in range(6)] + [b[18]]
    else:
        cols = [orig[k] for k in range(7)]
    qid_o, qs_o, qe_o, tid_o, ts_o, te_o, fl_o = [c[i] for c in cols]

    def pick(a, b):
        return jnp.where(m, b, a)

    qid = jnp.where(ok, pick(qid_o, tid_o), n_seq_cap + 1)
    qs = jnp.where(ok, pick(qs_o, ts_o), 0)
    qe = jnp.where(ok, pick(qe_o, te_o), 0)
    tid = jnp.where(ok, pick(tid_o, qid_o), 0)
    ts = jnp.where(ok, pick(ts_o, qs_o), 0)
    te = jnp.where(ok, pick(te_o, qe_o), 0)
    fl = jnp.where(ok, fl_o, 0)
    return jnp.stack([qid, qs, qe, tid, ts, te, fl])


def select_build_staged(orig_dev, perm_dev, d, opt):
    """select_build over the staged loader's (originals, permutation)
    device pair."""
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    dev = mirror_gather(orig_dev, perm_dev, n_seq_cap=n_seq_cap,
                        cap=perm_dev.shape[0])
    return _select_build_dev(dev, n_seq, n_seq_cap, opt)


def _select_build_dev(dev, n_seq, n_seq_cap, opt):
    cap = dev.shape[1]
    arc_cap = min(_next_pow2(max(65536, 4 * n_seq_cap)), _next_pow2(cap))
    while True:
        arcmat, meta, counts = _select_kernel(
            dev, n_seq_cap=n_seq_cap,
            min_span=opt.min_span, min_dp=opt.min_dp,
            max_hang=opt.max_hang, int_frac=float(opt.int_frac),
            min_ovlp=opt.min_ovlp, do_flt=True,
            emit_arcs=True, arc_cap=arc_cap)
        # ONE transfer for everything (round-trips dominate wall-clock)
        arcmat, meta, counts = jax.device_get((arcmat, meta, counts))
        n_arc = int(counts[4])
        if n_arc <= arc_cap:
            break
        arc_cap = _next_pow2(n_arc)  # rare: redo with a bigger static cap
    arcs = arcmat[:, :n_arc]
    meta = meta[:, :n_seq]
    counts = [int(x) for x in counts[:4]]
    return (
        {"u": arcs[0].astype(np.int32), "l": arcs[1].astype(np.int32),
         "v": arcs[2].astype(np.int32), "ol": arcs[3].astype(np.int32)},
        meta[4].astype(bool), meta[5].astype(bool),
        meta[0].astype(np.uint32), meta[1].astype(np.uint32),
        meta[2].astype(bool), meta[3].astype(bool), counts)


def select_fused(hits, d, opt, *, do_flt=True):
    """Run Steps 2+3 device-fused; returns (hits_kept, sub_s, sub_e,
    sub_del, cont_mask, counts).  Host-side squeeze happens in the
    caller."""
    from ..core.hits import Hits

    n = hits.n
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    dev = _upload(hits, n_seq_cap, float(opt.min_iden))
    out, subtab, counts = _select_kernel(
        dev, n_seq_cap=n_seq_cap,
        min_span=opt.min_span, min_dp=opt.min_dp,
        max_hang=opt.max_hang, int_frac=float(opt.int_frac),
        min_ovlp=opt.min_ovlp, do_flt=do_flt)
    out, subtab, counts = jax.device_get((out, subtab, counts))
    subtab = subtab[:, :n_seq]
    counts = [int(x) for x in counts]

    # re-attach the untouched columns from the host copy (the kernel only
    # changes coordinates + validity)
    valid = out[4, :n].astype(bool)
    kept = Hits(np.asarray(hits.qid)[valid].astype(np.int32),
                out[0, :n][valid].astype(np.uint32),
                out[1, :n][valid].astype(np.uint32),
                np.asarray(hits.tid)[valid].astype(np.int32),
                out[2, :n][valid].astype(np.uint32),
                out[3, :n][valid].astype(np.uint32),
                np.asarray(hits.ml)[valid].astype(np.uint32),
                np.asarray(hits.bl)[valid].astype(np.uint32),
                np.asarray(hits.rev)[valid].astype(np.uint8))
    sub_s = subtab[0].astype(np.uint32)
    sub_e = subtab[1].astype(np.uint32)
    sub_del = subtab[2].astype(bool)
    cont = subtab[3].astype(bool)
    return kept, sub_s, sub_e, sub_del, cont, counts
