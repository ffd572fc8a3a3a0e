"""Dual-sided fused selection kernel (Steps 2-3 + arc classification).

v2 of the device pipeline.  The reference materializes a mirrored hit array
(each PAF record pushed twice with query/target swapped, hit.c:92-98) and
runs every pass over 2N records.  Here the device consumes the UNMIRRORED
originals straight from the parser and processes each record's two
orientations ("q-side" = the record itself, "m-side" = its implied mirror)
as extra elementwise lanes of the same row:

  - the coverage sweeps (ma_hit_sub, hit.c:109-160) take 4 events per
    original (start/end on the query + start/end on the target), which is
    exactly the mirrored array's 2-events-per-row;
  - coordinate cutting (ma_hit_cut, hit.c:162-193) is symmetric under the
    mirror, so one computation serves both sides;
  - classification (ma_hit2arc, miniasm.h:86-104) is NOT symmetric (the
    int_frac test depends on which read is "query"), so each side carries
    its own validity bit from the filter stage on (a record can survive as
    a mirror only, matching the reference's per-record compaction);
  - the sorted order of the mirrored array (exact ksort radix permutation)
    matters only for the arc insertion order of ma_sg_gen; arcs come back
    with their (original, side) index and the HOST applies the rank table
    computed by the native loader over the few surviving arcs.

TPU cost model this kernel is built around (measured on v5e):
  - gathers ~7 ns/index -> minimized: two packed table gathers per cut pass
    (sub_s/sub_e/del packed into one u32 per read);
  - lax.sort ~2 ns/elem/key -> two 2-key event sorts, nothing else;
  - scans, scatters, segment reductions, elementwise: ~free ->
    forward-fill scans replace every sorted-index gather;
  - one dispatch + one fetch for the whole stage (sync round trips through
    the host cost ~28 ms each).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT
from ..utils.scan import seg_reduce_argmax

I32 = jnp.int32
BIG = jnp.int32(2**31 - 1)


def _pack_tab(s, e, dele, pack_se: bool):
    """Pack per-read trim tables for single-gather reads.

    pack_se (max read length < 65535): one u32 word  s<<16 | e, with the
    all-ones word as the `del` sentinel (a real (s, e) cannot produce it
    because e <= max_len < 65535).  Otherwise two words: s | del<<31
    (mirroring the reference's ma_sub_t s:31,del:1 bitfield) and e."""
    su = s.astype(jnp.uint32)
    eu = e.astype(jnp.uint32)
    if pack_se:
        w = (su << 16) | eu
        w = jnp.where(dele, jnp.uint32(0xFFFFFFFF), w)
        return (w.astype(I32),)
    w1 = su | (dele.astype(jnp.uint32) << 31)
    return (w1.astype(I32), eu.astype(I32))


def _unpack_tab(words, idx, pack_se: bool):
    """Gather packed tables at idx -> (s, e, del) int32/bool."""
    if pack_se:
        w = words[0][idx].astype(jnp.uint32)
        dele = w == jnp.uint32(0xFFFFFFFF)
        s = jnp.where(dele, jnp.uint32(0), w >> 16).astype(I32)
        e = jnp.where(dele, jnp.uint32(0), w & jnp.uint32(0xFFFF)).astype(I32)
        return s, e, dele
    w1 = words[0][idx].astype(jnp.uint32)
    dele = (w1 >> 31) != 0
    s = (w1 & jnp.uint32(0x7FFFFFFF)).astype(I32)
    e = words[1][idx]
    return s, e, dele


def _sub_pass(qid, tid, cqs, cqe, cts, cte, vq, vm, iden, not_self,
              T: int, min_dp: int, end_clip: int, pack15: bool = False,
              tr_cap: int | None = None, pack_ev: bool = False):
    """Coverage sweep over the 4 events per original (ma_hit_sub,
    hit.c:109-160).  Returns (s, e, del, has_query, n_remained, n_tr)
    with tables of length T (slot T-1 is never a real read).

    TPU cost notes (measured on v5e at 56.6M events): gathers price
    ~20 ns per OUTPUT element at this size (a 56.6M forward-fill gather
    alone is 1.25 s), scatter reductions ~8 ns/source, sorts ~4.5 ns/elem
    for 2 keys, cumulative ops and elementwise ~free.  The pass therefore
    avoids all full-size gathers/scatters: one 2-key event sort, a depth
    cumsum, then a SECOND sort that compacts the few depth transitions to
    the front (see sweep_events), after which all segment logic runs at
    transition scale (~2 per read).  has_query rides the same compaction
    (each segment's first event row is included, then presence is one
    transition-scale segment_max) instead of two N-source scatters
    (~250 ms) or a searchsorted (whose while-loop lowering costs ~210 ms
    at this size).  The per-segment depth
    rebase is free: every ok side contributes a (+1,-1) pair, so segment
    sums are zero and the global cumsum IS the segment-local depth."""
    # pack_ev packs seg into 16 bits, so the pad must fit too: 0xFFFF is
    # safe because the gate requires n_seq + 2 <= 0xFFFF (real ids stay
    # strictly below the pad; the pad maps to an unused table slot)
    segpad = jnp.int32(0xFFFF if pack_ev else T)

    okq = vq & not_self & iden
    okm = vm & not_self & iden
    esq = cqs + end_clip
    eeq = cqe - end_clip
    est = cts + end_clip
    eet = cte - end_clip
    okq = okq & (eeq > esq)
    okm = okm & (eet > est)

    segq = jnp.where(vq, qid, segpad)
    segm = jnp.where(vm, tid, segpad)
    seg = jnp.concatenate([segq, segq, segm, segm])
    key = jnp.concatenate([
        jnp.where(okq, esq * 2, BIG), jnp.where(okq, eeq * 2 + 1, BIG),
        jnp.where(okm, est * 2, BIG), jnp.where(okm, eet * 2 + 1, BIG)])

    # presence == has_query: a read keeps its table entry whenever any of
    # its rows' sides is valid, even when all its events are skipped (self
    # matches / identity failures), matching the del=1 rule of hit.c:115,152;
    # computed from the sorted seg column inside sweep_events (has_query=None)
    return sweep_events(seg, key, None, T, min_dp, end_clip, pack15,
                        tr_cap=tr_cap, pack_ev=pack_ev)


def sweep_events(seg, key, has_query, T: int, min_dp: int, end_clip: int,
                 pack15: bool, tr_cap: int | None = None,
                 pack_ev: bool = False):
    """Core of the coverage sweep over a prebuilt (seg, key) event array
    (key = clipped_pos*2 | is_end, BIG = skipped).  Split out so the
    sharded step (parallel/full.py) can feed locally-built + exchanged
    event sets through the identical computation.

    Returns (s, e, del, has_query, n_rem, n_tr).  n_tr is the true number
    of depth transitions; results are only valid when n_tr <= tr_cap (the
    caller re-runs with a bigger cap otherwise — see select_build2).
    has_query=None computes presence from the sorted events (valid rows
    keep their real seg id even when their event key is BIG).

    Depth transitions alternate start/end GLOBALLY in the sorted event
    order: within a segment the depth enters and leaves at 0 < min_dp, so
    crossings alternate up/down beginning with an up, and segments are
    contiguous — hence after compacting the transitions to the front with
    one more sort, each end-transition's paired start is simply the
    previous compacted element.  This replaces the forward-fill gather
    and the full-size segment_min of the earlier design (1.25 s + 0.5 s
    at 56.6M events) with a ~0.25 s sort plus transition-scale ops."""
    n4 = seg.shape[0]
    if tr_cap is None:
        tr_cap = n4  # always safe: one crossing consumes one event
    tr_cap = min(tr_cap, n4)
    if pack_ev:
        # small-scale fast path (T <= 0xFFFF AND every key < 0xFFFF, i.e.
        # max_len < 32767): pack (seg, key) into one uint32 and run a
        # 1-key sort (~35% cheaper than 2-key at these sizes); skipped
        # events carry 0xFFFF in the key field as the sentinel
        SENT = jnp.uint32(0xFFFF)
        packed = ((seg.astype(jnp.uint32) << 16)
                  | jnp.where(key == BIG, SENT, key.astype(jnp.uint32)))
        packed = jax.lax.sort([packed], num_keys=1)[0]
        seg = (packed >> 16).astype(I32)
        keyu = packed & SENT
        valid_ev = keyu != SENT
        key = jnp.where(valid_ev, keyu.astype(I32), BIG)
    else:
        seg, key = jax.lax.sort([seg, key], num_keys=2)
        valid_ev = key != BIG
    is_end = (key & 1) == 1
    delta = jnp.where(valid_ev, jnp.where(is_end, -1, 1), 0).astype(I32)
    depth = jnp.cumsum(delta)  # == segment-local depth (see docstring)
    old_depth = depth - delta

    is_start_tr = valid_ev & (old_depth < min_dp) & (depth >= min_dp)
    is_end_tr = valid_ev & (old_depth >= min_dp) & (depth < min_dp)
    tr = is_start_tr | is_end_tr

    compute_pres = has_query is None
    if compute_pres:
        # presence rides the same compaction: include each segment's FIRST
        # event row, then presence is a transition-scale reduction.  The
        # first included row of a segment is its first event (or the first
        # start transition when they coincide), which never splits a
        # (start, end) pair — ends still read their start as the previous
        # compacted element.  All-BIG segments contribute an inert row
        # (its garbage pos is never a predecessor: no transitions there).
        first_occ = (jnp.concatenate([jnp.ones(1, bool),
                                      seg[1:] != seg[:-1]])
                     & (seg < jnp.int32(T)))
        inc = tr | first_occ
    else:
        inc = tr
    n_tr = jnp.sum(inc)

    # compact the included rows to the front, preserving order: one
    # payload-FREE 1-key sort of the masked iota (the sorted values ARE
    # the original indices), then (seg, key) gather at transition scale —
    # ~35% cheaper than carrying both columns through the sort
    tkey = jnp.where(inc, jnp.arange(n4, dtype=I32), BIG)
    tidx = jax.lax.sort([tkey], num_keys=1)[0][:tr_cap]
    tclamp = jnp.minimum(tidx, n4 - 1)
    seg_c = seg[tclamp]
    key_c = key[tclamp]
    okc = jnp.arange(tr_cap, dtype=I32) < n_tr
    pos_c = (key_c >> 1).astype(I32)
    is_end_c = (key_c & 1) == 1
    # each end-transition's paired start is the previous compacted element
    start_c = jnp.concatenate([jnp.zeros(1, I32), pos_c[:-1]])
    seg_cm = jnp.where(okc, jnp.minimum(seg_c, T), T)
    if compute_pres:
        has_query = jax.ops.segment_max(okc.astype(I32), seg_cm,
                                        num_segments=T + 1)[:T] > 0
    # a first_occ-only row can never read as an end transition: the first
    # real event of a segment is always a START event (every end's paired
    # start has a smaller key), so its low bit is 0; the one exception is
    # an all-BIG segment's row (key == BIG, low bit 1), masked explicitly
    end_rows = okc & is_end_c & (key_c != BIG)

    if pack15:
        NEG = jnp.int32(0x7FFF)
        length15 = jnp.minimum(pos_c - start_c, NEG)
        # the reference keeps the FIRST longest region (`len > max.e -
        # max.s`, hit.c:142); end positions are strictly increasing within
        # a segment, so "first row attaining the max" == "smallest end"
        # == "smallest start" (start = end - len), and the lexicographic
        # min of (neg_len<<15 | start_pos) picks it exactly
        packed = jnp.where(end_rows & (length15 > 0),
                           ((NEG - length15) << 15) | start_c, BIG)
        w = jax.ops.segment_min(packed, seg_cm, num_segments=T + 1)[:T]
        has_region = has_query & (w != BIG)
        seg_maxlen = jnp.where(has_region, NEG - (w >> 15), -1)
        s_tab = jnp.where(has_region, w & NEG, 0)
        e_tab = jnp.where(has_region, s_tab + seg_maxlen, 0)
    else:
        length = jnp.where(end_rows, pos_c - start_c, -1)
        bl_seg, wi_seg = seg_reduce_argmax(seg_cm, length, T + 1)
        seg_maxlen = jnp.where(has_query, jnp.maximum(bl_seg[:T], -1), -1)
        widx = jnp.minimum(jnp.where(has_query, wi_seg[:T], 0), tr_cap - 1)
        has_region = has_query & (seg_maxlen > 0)
        s_tab = jnp.where(has_region, start_c[widx], 0)
        e_tab = jnp.where(has_region, pos_c[widx], 0)

    s = jnp.where(has_region, s_tab - end_clip, 0)
    e = jnp.where(has_region, e_tab + end_clip, 0)
    dele = has_query & ~has_region
    n_rem = jnp.sum(has_region)
    return s, e, dele, has_query, n_rem, n_tr


def _cut_pass(qid, tid, cqs, cqe, cts, cte, rev, words, pack_se: bool,
              min_span: int):
    """ma_hit_cut (hit.c:162-193), one computation for both sides (the
    keep test and the coordinate rewrite are symmetric under the mirror).
    Returns (keep, qs2, qe2, ts2, te2, slq, slt) with coordinates as int32
    bit patterns of the reference's uint32 results; slq/slt are the
    trimmed read lengths (e-s of the gathered table entries, 0 for deleted
    reads) so the following hit2arc needs no extra table gathers."""
    rq_s, rq_e, rq_del = _unpack_tab(words, qid, pack_se)
    rt_s, rt_e, rt_del = _unpack_tab(words, tid, pack_se)
    alive = ~(rq_del | rt_del)

    qs0, qe0, ts0, te0 = cqs, cqe, cts, cte
    # strand-aware projection (hit.c:170-180); all operands fit int32 and
    # the reference's s-side comparisons are signed (ma_sub_t.s is an int-
    # promoted 31-bit bitfield) while projections keep qs1/ts1 >= 0
    qs1 = jnp.where(rev,
                    jnp.where(te0 < rt_e, qs0, qs0 + (te0 - rt_e)),
                    jnp.where(ts0 > rt_s, qs0, qs0 + (rt_s - ts0)))
    qe1 = jnp.where(rev,
                    jnp.where(ts0 > rt_s, qe0, qe0 - (rt_s - ts0)),
                    jnp.where(te0 < rt_e, qe0, qe0 - (te0 - rt_e)))
    ts1 = jnp.where(rev,
                    jnp.where(qe0 < rq_e, ts0, ts0 + (qe0 - rq_e)),
                    jnp.where(qs0 > rq_s, ts0, ts0 + (rq_s - qs0)))
    te1 = jnp.where(rev,
                    jnp.where(qs0 > rq_s, te0, te0 - (rq_s - qs0)),
                    jnp.where(qe0 < rq_e, te0, te0 - (qe0 - rq_e)))

    # clamp + rebase (hit.c:181-184): s-side signed max (qs1/ts1 >= 0 so it
    # equals the unsigned max), e-side UNSIGNED min (the reference compares
    # int qe against the uint32 ma_sub_t.e, so a negative qe converts huge)
    u32 = jnp.uint32
    qs2 = (jnp.maximum(qs1, rq_s) - rq_s).astype(u32)
    ts2 = (jnp.maximum(ts1, rt_s) - rt_s).astype(u32)
    qe2 = jnp.where(qe1.astype(u32) < rq_e.astype(u32),
                    qe1.astype(u32), rq_e.astype(u32)) - rq_s.astype(u32)
    te2 = jnp.where(te1.astype(u32) < rt_e.astype(u32),
                    te1.astype(u32), rt_e.astype(u32)) - rt_s.astype(u32)

    qspan = (qe2 - qs2).astype(I32)
    tspan = (te2 - ts2).astype(I32)
    keep = alive & (qspan >= min_span) & (tspan >= min_span)
    return (keep, qs2.astype(I32), qe2.astype(I32), ts2.astype(I32),
            te2.astype(I32), rq_e - rq_s, rt_e - rt_s)


@functools.partial(jax.jit, static_argnames=(
    "n_seq_cap", "min_span", "min_dp", "max_hang", "int_frac", "min_ovlp",
    "bi_dir", "pack_se", "arc_cap", "pack_io", "pack15", "tr_cap",
    "paf_tables", "pack_ev"))
def _select2_kernel(colmat, *, n_seq_cap, min_span, min_dp, max_hang,
                    int_frac, min_ovlp, bi_dir, pack_se, arc_cap, pack_io,
                    pack15, tr_cap, paf_tables=False, pack_ev=False):
    """colmat: (7, N) int32 originals [qid qs qe tid ts te flags], or the
    H2D-packed (4, N) layout [qid|flags<<28, tid, qs<<16|qe, ts<<16|te]
    (43% fewer tunnel bytes; the native loader emits it whenever every
    record's coordinates fit 16 bits).  flags bit0=valid bit1=rev
    bit2=iden_ok; padding rows are all-zero (flags=0 -> inert).  pack_io
    (coordinates < 65535 AND n_seq_cap <= 32768, so vertices fit u16 too)
    packs the fetched arc and meta rows two-per-word to halve the D2H
    transfer."""
    if colmat.shape[0] == 4:
        w0 = colmat[0].astype(jnp.uint32)
        qid = (w0 & jnp.uint32(0x0FFFFFFF)).astype(I32)
        fl = (w0 >> 28).astype(I32)
        tid = colmat[1].astype(I32)
        qsqe = colmat[2].astype(jnp.uint32)
        tste = colmat[3].astype(jnp.uint32)
        qs = (qsqe >> 16).astype(I32)
        qe = (qsqe & 0xFFFF).astype(I32)
        ts = (tste >> 16).astype(I32)
        te = (tste & 0xFFFF).astype(I32)
    else:
        qid, qs, qe, tid, ts, te, fl = [colmat[i].astype(I32)
                                        for i in range(7)]
    T = n_seq_cap + 2
    oqs, ots = qs, ts  # ORIGINAL starts: the mirrored-hit sort keys
    valid0 = (fl & 1) != 0
    rev = (fl >> 1) & 1
    iden = ((fl >> 2) & 1).astype(bool)
    is_self = qid == tid
    not_self = ~is_self
    vq = valid0
    vm = valid0 & not_self if bi_dir else jnp.zeros_like(valid0)

    # --- Step 2: crude sweep, end_clip=0 (main.c:122) + cut ---
    s1, e1, d1, _, n_rem1, n_tr1 = _sub_pass(qid, tid, qs, qe, ts, te, vq,
                                             vm, iden, not_self, T, min_dp,
                                             0, pack15, tr_cap, pack_ev)
    w1 = _pack_tab(s1, e1, d1, pack_se)
    keep, qs, qe, ts, te, slq, slt = _cut_pass(qid, tid, qs, qe, ts, te,
                                               rev, w1, pack_se, min_span)
    vq = vq & keep
    vm = vm & keep
    n_cut1 = jnp.sum(vq) + jnp.sum(vm)

    # --- arc filter, relaxed params (main.c:125; hit.c:195-216) ---
    cq = hit2arc(qid, qs, qe, tid, ts, te, rev, slq, slt,
                 int(max_hang * 1.5), 0.5, int(min_ovlp * 0.5))
    cm = hit2arc(tid, ts, te, qid, qs, qe, rev, slt, slq,
                 int(max_hang * 1.5), 0.5, int(min_ovlp * 0.5))
    # cut survivors have both reads non-deleted, so the reference's explicit
    # sq->del||st->del skip is already implied by vq/vm
    def flt_keep(c):
        r = c["r"]
        return (r >= 0) | (r == MA_HT_QCONT) | (r == MA_HT_TCONT)

    def flt_dp(c, sq, st):
        r = c["r"]
        return jnp.where(r >= 0, r, jnp.where(r == MA_HT_QCONT, sq, st))

    vq = vq & flt_keep(cq)
    vm = vm & flt_keep(cm)
    n_flt = jnp.sum(vq) + jnp.sum(vm)
    dump = T - 1
    # crude coverage needs only the global sums (hit.c:210-213): dp summed
    # over surviving rows, read lengths over reads that still have a hit.
    # Values are < 2^17, so a (low-10-bit, high) split keeps exact int32
    # sums without x64 (one f32/f64 sum would round; a scatter-add would
    # cost ~6 ms).
    dpv = (jnp.where(vq, flt_dp(cq, slq, slt), 0)
           + jnp.where(vm, flt_dp(cm, slt, slq), 0))
    dp_lo = jnp.sum(dpv & 1023)
    dp_hi = jnp.sum(dpv >> 10)

    # --- Step 3: fine sweep, end_clip=min_span/2 (main.c:132) + cut ---
    # its has_query table == "read kept a hit after the filter", which is
    # exactly the hit_flt coverage denominator set
    s2, e2, d2, has_flt, n_rem2, n_tr2 = _sub_pass(
        qid, tid, qs, qe, ts, te, vq, vm, iden, not_self, T, min_dp,
        min_span // 2, pack15, tr_cap, pack_ev)
    sl1 = e1 - s1
    len_lo = jnp.sum(jnp.where(has_flt, sl1 & 1023, 0))
    len_hi = jnp.sum(jnp.where(has_flt, sl1 >> 10, 0))
    w2 = _pack_tab(s2, e2, d2, pack_se)
    keep, qs, qe, ts, te, slq, slt = _cut_pass(qid, tid, qs, qe, ts, te,
                                               rev, w2, pack_se, min_span)
    vq = vq & keep
    vm = vm & keep
    n_cut2 = jnp.sum(vq) + jnp.sum(vm)

    # --- merge (ma_sub_merge, hit.c:218-223) ---
    ms = s1 + s2
    me = s1 + e2
    mdel = d1 | d2

    # --- containment marks + final classification (hit.c:225-236,
    #     asm.c:9-39) with merged lengths e2-s2 (== the cut-pass spans) ---
    cq = hit2arc(qid, qs, qe, tid, ts, te, rev, slq, slt,
                 max_hang, int_frac, min_ovlp)
    cm = hit2arc(tid, ts, te, qid, qs, qe, rev, slt, slq,
                 max_hang, int_frac, min_ovlp)
    rq = jnp.where(vq, cq["r"], 0)
    rm = jnp.where(vm, cm["r"], 0)
    # per row, the qid slot collects used/contained/palindrome bits and the
    # tid slot used/contained bits; TWO scatter-max ops cover what would be
    # five boolean scatters (scatters price ~8.7 ns per source index).
    # QCONT marks the side's query, TCONT its target (hit.c:234-235); the
    # m-side's query is tid.  Rows never reach slot dump with nonzero bits
    # (rq/rm/pal are gated on vq/vm), and real ids are < T-1, so no
    # dump-clear is needed.
    vqm = vq | vm
    pal_rows = vq & (cq["r"] >= 0) & is_self & (qs == ts) & (qe == te) & (rev != 0)
    qbits = (vqm.astype(I32)
             | (((rq == MA_HT_QCONT) | (rm == MA_HT_TCONT)).astype(I32) << 1)
             | (pal_rows.astype(I32) << 2))
    tbits = (vqm.astype(I32)
             | (((rq == MA_HT_TCONT) | (rm == MA_HT_QCONT)).astype(I32) << 1))
    tab = (jnp.zeros(T, I32)
           .at[jnp.minimum(qid, dump)].max(qbits)
           .at[jnp.minimum(tid, dump)].max(tbits))
    used = (tab & 1) != 0
    cont = (tab & 2) != 0
    pal = (tab & 4) != 0

    # device-side squeeze precondition (hit.c:237-251): a read survives iff
    # used, not sub-deleted, not contained; arcs touching dropped reads are
    # filtered before download
    read_alive = used & ~mdel & ~cont
    aq = read_alive[jnp.minimum(qid, dump)]
    at = read_alive[jnp.minimum(tid, dump)]
    m_contained = (jnp.sum(vq & aq & at) + jnp.sum(vm & aq & at))

    arc_q = vq & (cq["r"] >= 0) & not_self & aq & at
    arc_m = vm & (cm["r"] >= 0) & not_self & aq & at
    arc_rows = jnp.concatenate([arc_q, arc_m])
    n = qid.shape[0]
    n_arc = jnp.sum(arc_rows)
    # Compact the arc row indices with a 1-key sort (ascending iota of
    # the selected rows == nonzero order), then ORDER the compacted arcs
    # by their mirrored-hit key (qid<<32|qs of the side, ORIGINAL
    # coordinates — the reference sorts hits before cutting, hit.c:100)
    # with a SECOND stable sort at arc scale (~2M rows, ~free) instead of
    # key-sorting all 2n rows: same stable by-key row-order-tie
    # permutation the host previously rebuilt via key_fetch+argsort, so
    # the host skips ordering entirely unless BOTH a graph key and a hit
    # key are duplicated (counts[13] reports the hit-key duplicates; see
    # pipeline's order step for the proof).  arc_cap can exceed the 2n
    # row count (pow2 retry caps vs ladder-quantized n): pad, don't
    # slice.
    sidx = jax.lax.sort([jnp.where(arc_rows, jnp.arange(2 * n, dtype=I32),
                                   BIG)], num_keys=1)[0]
    if arc_cap <= 2 * n:
        idx = sidx[:arc_cap]
    else:
        idx = jnp.concatenate([sidx, jnp.full(arc_cap - 2 * n, BIG, I32)])
    idx = jnp.minimum(idx, 2 * n - 1)
    ok = jnp.arange(arc_cap, dtype=I32) < n_arc
    # arc-scale key ordering: gather the hit keys at the compacted rows
    # and stable-sort just those (ties keep the row order established by
    # the compaction sort above)
    khi = jnp.where(ok, jnp.concatenate([qid, tid])[idx], BIG)
    klo = jnp.concatenate([oqs, ots])[idx]
    skhi, sklo, perm = jax.lax.sort(
        [khi, klo, jnp.arange(arc_cap, dtype=I32)], num_keys=2,
        is_stable=True)
    dup_hit = jnp.sum((skhi[1:] == skhi[:-1]) & (sklo[1:] == sklo[:-1])
                      & (skhi[1:] != BIG))
    idx = idx[perm]
    if pack_io:
        # pack (u,v) and (l,ol) BEFORE the gather: 2 gathers instead of 4
        uv = jnp.concatenate([(cq["u"] << 16) | cq["v"],
                              (cm["u"] << 16) | cm["v"]])[idx]
        lol = jnp.concatenate([(cq["l"] << 16) | cq["ol"],
                               (cm["l"] << 16) | cm["ol"]])[idx]
        arcmat = jnp.stack([jnp.where(ok, uv, 0), jnp.where(ok, lol, 0),
                            jnp.where(ok, idx.astype(I32), -1)])
    elif pack_se:
        # vertices don't fit 16 bits, but (l, ol) do (bounded by read
        # length): 4 fetched rows instead of 5
        au = jnp.concatenate([cq["u"], cm["u"]])[idx]
        av = jnp.concatenate([cq["v"], cm["v"]])[idx]
        lol = jnp.concatenate([(cq["l"] << 16) | cq["ol"],
                               (cm["l"] << 16) | cm["ol"]])[idx]
        arcmat = jnp.stack([jnp.where(ok, au, 0), jnp.where(ok, av, 0),
                            jnp.where(ok, lol, 0),
                            jnp.where(ok, idx.astype(I32), -1)])
    else:
        au = jnp.concatenate([cq["u"], cm["u"]])[idx]
        al = jnp.concatenate([cq["l"], cm["l"]])[idx]
        av = jnp.concatenate([cq["v"], cm["v"]])[idx]
        aol = jnp.concatenate([cq["ol"], cm["ol"]])[idx]
        arcmat = jnp.stack([jnp.where(ok, au, 0), jnp.where(ok, al, 0),
                            jnp.where(ok, av, 0), jnp.where(ok, aol, 0),
                            jnp.where(ok, idx.astype(I32), -1)])
    flags = (mdel.astype(I32) | (cont.astype(I32) << 1)
             | (used.astype(I32) << 2) | (pal.astype(I32) << 3))
    if pack_se:
        meta_rows = [(ms << 16) | me, flags]
    else:
        meta_rows = [ms, me, flags]
    if paf_tables:
        # per-pass trim tables for the -p paf replay (print_hits,
        # main.c:21-30): s|del<<31 and e per pass, per read — an O(n_seq)
        # fetch replacing an O(hits) coordinate download
        meta_rows += [
            (s1.astype(jnp.uint32)
             | (d1.astype(jnp.uint32) << 31)).astype(I32), e1,
            (s2.astype(jnp.uint32)
             | (d2.astype(jnp.uint32) << 31)).astype(I32), e2]
    meta = jnp.stack(meta_rows)[:, :n_seq_cap + 1]
    counts = jnp.stack([n_rem1, n_cut1, n_flt, n_rem2, n_cut2,
                        m_contained, n_arc, dp_lo, dp_hi, len_lo, len_hi,
                        n_tr1, n_tr2, dup_hit])
    return arcmat, meta, counts


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


def select_build2(colmat_dev, d, opt, *, bi_dir: bool, max_len: int,
                  paf_tables: bool = False):
    """Run the dual-sided kernel; returns (arcs dict with idx, meta dict,
    counts list).  Records device-vs-transfer attribution into
    utils.timers.EXTRA: select.kernel_s (dispatch -> counts on host, i.e.
    device compute + queue) and select.fetch_s (arc+meta D2H)."""
    import time as _time

    from ..utils.timers import add_extra
    import os as _os

    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    pack_se = bool(max_len < 65535)
    pack15 = bool(max_len < 32768)
    pack_io = pack_se and n_seq_cap <= 32768
    # single-word event sort (small scale): seg and key both fit one
    # uint32.  Gated on the REAL read count (not the pow2 cap) with a
    # 0xFFFF pad, so e.g. 37k reads in the 65536 cap bucket still pack;
    # crossing the 65533-read line inside a cap bucket costs one extra
    # cached compile of the other variant.
    pack_ev = bool(max_len < 32767 and n_seq + 2 <= 0xFFFF)
    if _os.environ.get("MINIASM_TPU_PACKIO") == "0":
        pack_io = False  # test hook: forces the 4-row big-config format
    cap = colmat_dev.shape[1]
    arc_cap = min(_next_pow2(max(65536, 4 * n_seq_cap)), 2 * _next_pow2(cap))
    # transitions ~= 2 per surviving read (one region each); 4x the read
    # capacity covers fragmented coverage profiles, with a doubling retry
    # (validated via counts[11:13]) for pathological inputs
    tr_cap = min(_next_pow2(max(1 << 17, 4 * n_seq_cap)), 4 * cap)
    # small arc capacity (<= 4 MB transfer): fetch arcs+meta+counts in ONE
    # device_get, skipping a sync round trip and the slice dispatch —
    # round trips cost ~28 ms each on the tunnel, a visible fraction of an
    # E. coli-scale run
    small_fetch = arc_cap <= (1 << 18)
    t0 = _time.time()
    retries = -1
    while True:
        retries += 1
        arcmat, meta, counts = _select2_kernel(
            colmat_dev, n_seq_cap=n_seq_cap, min_span=opt.min_span,
            min_dp=opt.min_dp, max_hang=opt.max_hang,
            int_frac=float(opt.int_frac), min_ovlp=opt.min_ovlp,
            bi_dir=bi_dir, pack_se=pack_se, arc_cap=arc_cap, pack_io=pack_io,
            pack15=pack15, tr_cap=tr_cap, paf_tables=paf_tables,
            pack_ev=pack_ev)
        if small_fetch:
            arcmat_h, meta_h, counts = jax.device_get((arcmat, meta,
                                                       counts))
        else:
            counts = jax.device_get(counts)
        n_arc = int(counts[6])
        n_tr = max(int(counts[11]), int(counts[12]))
        if n_arc <= arc_cap and n_tr <= tr_cap:
            break
        if n_arc > arc_cap:
            arc_cap = _next_pow2(n_arc)
            small_fetch = arc_cap <= (1 << 18)
        if n_tr > tr_cap:
            tr_cap = min(_next_pow2(n_tr), 4 * cap)
    add_extra("select.kernel_s", _time.time() - t0)
    if retries:
        add_extra("select.retries", retries)
    t0 = _time.time()
    fetch_idx = None
    if small_fetch:
        arcmat, meta = arcmat_h, meta_h
    else:
        # fetch only the filled arc slots (rounded up to a 64K bucket so
        # the tiny slice op compiles once per bucket) and SKIP the idx
        # row: arcs arrive pre-ordered from the device, so idx is only
        # needed by the rare exact-rank fallback (lazy second fetch)
        fetch_cap = min(arc_cap, max(65536, -(-n_arc // 65536) * 65536))
        arcmat_dev = arcmat
        arcmat, meta = jax.device_get((arcmat[:-1, :fetch_cap], meta))

        def fetch_idx(_dev=arcmat_dev, _cap=fetch_cap, _n=n_arc):
            return jax.device_get(_dev[-1, :_cap])[:_n].astype(np.int64)
    add_extra("select.fetch_s", _time.time() - t0)
    if pack_io:
        uv = arcmat[0, :n_arc].astype(np.uint32)
        lol = arcmat[1, :n_arc].astype(np.uint32)
        arcs = {
            "u": (uv >> 16).astype(np.int32),
            "v": (uv & 0xFFFF).astype(np.int32),
            "l": (lol >> 16).astype(np.int32),
            "ol": (lol & 0xFFFF).astype(np.int32),
        }
        idx_row = 2
    elif pack_se:
        lol = arcmat[2, :n_arc].astype(np.uint32)
        arcs = {
            "u": arcmat[0, :n_arc].astype(np.int32),
            "v": arcmat[1, :n_arc].astype(np.int32),
            "l": (lol >> 16).astype(np.int32),
            "ol": (lol & 0xFFFF).astype(np.int32),
        }
        idx_row = 3
    else:
        arcs = {
            "u": arcmat[0, :n_arc].astype(np.int32),
            "l": arcmat[1, :n_arc].astype(np.int32),
            "v": arcmat[2, :n_arc].astype(np.int32),
            "ol": arcmat[3, :n_arc].astype(np.int32),
        }
        idx_row = 4
    if small_fetch:
        arcs["idx"] = arcmat[idx_row, :n_arc].astype(np.int64)
    else:
        arcs["idx"] = None
    meta = meta[:, :n_seq]
    if pack_se:
        sme = meta[0].astype(np.uint32)
        flags = meta[1]
        md = {"sub_s": sme >> 16, "sub_e": sme & 0xFFFF}
    else:
        flags = meta[2]
        md = {
            "sub_s": meta[0].astype(np.uint32),
            "sub_e": meta[1].astype(np.uint32),
        }
    md.update({
        "sub_del": (flags & 1).astype(bool),
        "cont": ((flags >> 1) & 1).astype(bool),
        "used": ((flags >> 2) & 1).astype(bool),
        "pal": ((flags >> 3) & 1).astype(bool),
    })
    if paf_tables:
        base = 2 if pack_se else 3
        for nm, row in (("sub1", base), ("sub2", base + 2)):
            sw = meta[row].astype(np.uint32)
            md[nm] = ((sw & 0x7FFFFFFF).astype(np.int32),
                      meta[row + 1].astype(np.int32),
                      (sw >> 31).astype(np.uint8))
    c = [int(x) for x in counts]
    # reassemble the exact 64-bit coverage sums from the 10-bit splits
    md["tot_dp"] = c[7] + (c[8] << 10)
    md["tot_len"] = c[9] + (c[10] << 10)
    md["fetch_idx"] = fetch_idx
    return arcs, md, c
