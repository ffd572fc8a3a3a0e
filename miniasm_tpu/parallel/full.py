"""End-to-end multi-device pipeline: PAF -> GFA over a 1-D read mesh.

Sharding model (SURVEY.md §2.4; the reference is single-process so this
layer is new architecture, not a port):

  - reads are partitioned into contiguous id blocks; shard k owns reads
    [k*block, (k+1)*block).  Every hit row lives at its QUERY's owner, so
    the coverage-sweep events of a read are all shard-local and the sweep
    needs no communication;
  - original records are uploaded to their query's owner; the implied
    bi-directional mirror (reference hit.c:92-98) is built ON DEVICE and
    routed to the mirror query's owner with one `all_to_all` per step.
    Bucket capacities are computed exactly on the host from the (src, dst)
    histogram, so nothing is ever dropped (no overflow-retry path needed);
  - per-read tables (trim intervals, containment/used/palindrome marks)
    are combined with an owner-masked `psum`: each shard zeroes every
    entry outside its own block before the reduce, making the disjoint-
    support assumption explicit instead of relying on pmax-over-zeros;
  - scalar stage counters are `psum`'d (the reference's log counters);
  - the surviving arcs return with their global emission index and the
    host restores the reference's exact arc insertion order (the ksort
    radix permutation of the mirrored hit array), so the downstream graph
    -> unitig -> GFA path is byte-identical to the single-device run;
  - graph cleaning reuses the device detection kernel with its vertex
    tables row-sharded over the same mesh (devclean.detect(mesh=...));
    XLA inserts the all_gathers for the neighbor-of-neighbor reads.
"""

from __future__ import annotations

import sys

import numpy as np

from ..config import Opt
from ..utils.timers import log

HIT_ROWS = 8  # qid qs qe tid ts te flags gid


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


def _round_up(x: int, quantum: int = 65536) -> int:
    """Pad a per-shard capacity to a fixed quantum.  A pow2 round-up wastes
    up to 2x rows (pure overhead the efficiency target prices directly);
    a 64K quantum keeps lane alignment and caps waste at one quantum."""
    if x <= quantum:
        return _next_pow2(max(x, 1))
    return -(-x // quantum) * quantum


def _load_originals(paf_fn, opt, excl):
    """Host load of the unmirrored originals: (8, n) int32 rows in parse
    order (gid row = 2*j so mirrors can use 2*j+1), the SeqDict, and the
    line/hit totals.  Uses the native loader when available."""
    try:
        from ..io.native import available
    except ImportError:
        available = lambda: False  # noqa: E731
    if available():
        from ..io.native.pafload import load_hits_mt

        # keep the columns on host (partitioning happens before upload);
        # the pipelined MT parser is ~2x the v2 single-thread parse
        cm, d, h3 = load_hits_mt(
            paf_fn, opt.min_span, opt.min_match, excl=excl, bi_dir=True,
            min_iden=float(opt.min_iden), upload=False)
        n = h3.n_orig
        n_lines, n_mirror = h3.n_lines, h3.n_mirror
        cols = np.ascontiguousarray(cm[:, :n])
        h3.free()
    else:
        from ..io.paf import load_paf

        load = load_paf(paf_fn, opt.min_span, opt.min_match, excl=excl)
        d = load.d
        n = len(load.qid)
        iden = ~(load.ml.astype(np.float32)
                 < load.bl.astype(np.float32) * np.float32(opt.min_iden))
        flags = (np.ones(n, np.int32) | (load.rev.astype(np.int32) << 1)
                 | (iden.astype(np.int32) << 2))
        cols = np.stack([load.qid.astype(np.int32),
                         load.qs.astype(np.int32), load.qe.astype(np.int32),
                         load.tid.astype(np.int32),
                         load.ts.astype(np.int32), load.te.astype(np.int32),
                         flags])
        n_lines = load.n_lines
        n_mirror = n + int(np.sum(load.qid != load.tid))
    gid = (np.arange(cols.shape[1], dtype=np.int64) * 2).astype(np.int32)
    return np.vstack([cols, gid[None, :]]), d, n_lines, n_mirror


def _mirror_ranks(cols, d):
    """rank[gid] = position of that (original, side) row in the reference's
    radix-sorted mirrored hit array (ksort.h tie permutation via
    utils.exact_sort), used to restore the exact arc insertion order."""
    from ..utils.exact_sort import radix_argsort

    qid = cols[0].astype(np.uint64)
    qs = cols[1].astype(np.uint64)
    tid = cols[3].astype(np.uint64)
    ts = cols[4].astype(np.uint64)
    n = qid.shape[0]
    not_self = cols[0] != cols[3]
    keys = np.empty(2 * n, dtype=np.uint64)
    gids = np.empty(2 * n, dtype=np.int64)
    keys[0::2] = (qid << np.uint64(32)) | qs
    keys[1::2] = (tid << np.uint64(32)) | ts
    gids[0::2] = np.arange(n, dtype=np.int64) * 2
    gids[1::2] = np.arange(n, dtype=np.int64) * 2 + 1
    sel = np.ones(2 * n, dtype=bool)
    sel[1::2] = not_self  # self matches are not mirrored (hit.c:92)
    keys = keys[sel]
    gids = gids[sel]
    order = radix_argsort(keys)
    rank = np.full(2 * n, -1, dtype=np.int64)
    rank[gids[order]] = np.arange(len(order), dtype=np.int64)
    return rank


def _partition(cols, n_seq, n_shards):
    """Assign each original to its query's owner block; return the stacked
    (8, n_shards * per) host matrix (padding rows flagged invalid), the
    per-shard width, the block size, and the exact mirror bucket cap."""
    block = -(-max(n_seq, 1) // n_shards)
    owner = cols[0] // block
    per = max(int(np.bincount(owner, minlength=n_shards).max()) if cols.shape[1]
              else 1, 1)
    per = _round_up(per)
    out = np.zeros((HIT_ROWS, n_shards * per), dtype=np.int32)
    for k in range(n_shards):
        sel = owner == k
        nk = int(np.sum(sel))
        out[:, k * per:k * per + nk] = cols[:, sel]
    # exact all_to_all bucket sizes: mirrors of shard-src originals whose
    # target-owner is dst
    not_self = cols[0] != cols[3]
    dst = cols[3] // block
    hist = np.zeros((n_shards, n_shards), dtype=np.int64)
    np.add.at(hist, (owner[not_self], dst[not_self]), 1)
    cap = int(hist.max()) if hist.size else 1
    cap = _round_up(max(cap, 1))
    return out, per, block, cap


def _make_select_step(mesh, n_seq, n_seq_cap, opt, *, per, block, cap,
                      pack_se, arc_cap, tr_cap=None, pack_ev=False):
    """Sharded Steps 2-3 with DUAL-SIDED rows and per-pass EVENT exchange.

    Every original row stays at its query's owner and carries both its
    own orientation and the implied mirror as lanes (exactly like the
    single-device kernel, select/fused2.py) — the mirrored hit array is
    never materialized, so per-shard row work is O(originals/n).  What
    crosses shards per sweep pass is only the mirror-side EVENT payload
    (target id + clipped interval + validity), routed to the target's
    owner with one all_to_all; the per-read trim tables come back
    replicated via owner-masked psum for the cut-pass gathers.  Total
    work across shards stays ~1x the single-device kernel (the old
    materialized-mirror design paid ~2x and its virtual-mesh total-work
    efficiency capped at 50%)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..core.hit2arc import hit2arc, MA_HT_QCONT, MA_HT_TCONT
    from ..select.fused2 import (BIG, _pack_tab, _cut_pass, sweep_events)

    I32 = jnp.int32
    axis = mesh.axis_names[0]
    n_sh = mesh.devices.size
    T = n_seq_cap + 2
    dump = T - 1

    def own_mask():
        k = jax.lax.axis_index(axis)
        ids = jnp.arange(T, dtype=I32)
        return (ids >= k * block) & (ids < jnp.minimum((k + 1) * block,
                                                       n_seq))

    def combine_tab(x):
        m = own_mask()
        return jax.lax.psum(jnp.where(m, x, jnp.zeros_like(x)), axis)

    def combine_or(x):
        return jax.lax.psum(x.astype(I32), axis) > 0

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=(P(None, axis), P(None), P()),
    )
    def step(colmat):
        qid, qs, qe, tid, ts, te, fl, gid = [colmat[i] for i in range(8)]
        valid0 = (fl & 1) != 0
        rev = (fl >> 1) & 1
        iden = ((fl >> 2) & 1).astype(bool)
        is_self = qid == tid
        not_self = ~is_self
        vq = valid0
        vm = valid0 & not_self

        # static exchange layout: the m-side payload of row j always goes
        # to tid//block; compute the bucketed scatter indices once
        mdest = jnp.where(vm, tid // block, n_sh)
        L = qid.shape[0]
        iota = jnp.arange(L, dtype=I32)
        order = jax.lax.sort((mdest, iota), dimension=0, is_stable=True,
                             num_keys=1)[1]
        sdest = mdest[order]
        first = jnp.searchsorted(sdest, jnp.arange(n_sh + 1, dtype=I32),
                                 side="left").astype(I32)
        slot = iota - first[jnp.minimum(sdest, n_sh)]
        flat = jnp.where(sdest < n_sh, sdest * cap + slot, n_sh * cap)

        def exchange(payload):
            """payload: (R, L) int32 in row order -> (R, n_sh*cap) received
            + validity mask."""
            sm = payload[:, order]
            R = payload.shape[0]
            send = jnp.zeros((R, n_sh * cap + 1), dtype=I32)
            send = send.at[:, flat].set(sm)
            svalid = jnp.zeros((n_sh * cap + 1,), dtype=jnp.bool_)
            svalid = svalid.at[flat].set(sdest < n_sh)
            send = send[:, :n_sh * cap].reshape(R, n_sh, cap)
            svalid = svalid[:n_sh * cap].reshape(n_sh, cap)
            recv = jax.lax.all_to_all(send, axis, split_axis=1,
                                      concat_axis=1)
            rvalid = jax.lax.all_to_all(svalid, axis, split_axis=0,
                                        concat_axis=0)
            return recv.reshape(R, -1), rvalid.reshape(-1)

        def sweep(cqs, cqe, cts, cte, vq, vm, end_clip):
            """One ma_hit_sub pass: local q-events + exchanged m-events ->
            LOCAL per-read tables (own block only) + n_rem."""
            okq = vq & not_self & iden & (cqe - end_clip > cqs + end_clip)
            okm = vm & not_self & iden & (cte - end_clip > cts + end_clip)
            # m-side payload to the target's owner: seg, start, end, flags
            pay = jnp.stack([tid, cts + end_clip, cte - end_clip,
                             vm.astype(I32) | (okm.astype(I32) << 1)])
            r, rv = exchange(pay)
            rtid = jnp.where(rv, r[0], dump)
            rpres = rv & ((r[3] & 1) != 0)
            rok = rv & ((r[3] & 2) != 0)
            spad = jnp.int32(0xFFFF if pack_ev else T)
            segq = jnp.where(vq, qid, spad)
            segr = jnp.where(rpres, rtid, spad)
            seg = jnp.concatenate([segq, segq, segr, segr])
            key = jnp.concatenate([
                jnp.where(okq, (cqs + end_clip) * 2, BIG),
                jnp.where(okq, (cqe - end_clip) * 2 + 1, BIG),
                jnp.where(rok, r[1] * 2, BIG),
                jnp.where(rok, r[2] * 2 + 1, BIG)])
            has_query = (jnp.zeros(T, bool)
                         .at[jnp.where(vq, qid, T)].set(vq, mode="drop")
                         .at[jnp.where(rpres, rtid, T)].set(rpres,
                                                            mode="drop"))
            # bounded tr_cap keeps the compaction sort's sliced tail at
            # transition scale; n_tr rides the counts so the host can
            # validate and re-jit with a bigger cap on overflow
            return sweep_events(seg, key, has_query, T, opt.min_dp,
                                end_clip, False, tr_cap=tr_cap,
                                pack_ev=pack_ev)

        # ---- Step 2: crude sweep + cut (main.c:122-125) ----
        s1, e1, d1, _, n_rem1, n_tr1 = sweep(qs, qe, ts, te, vq, vm, 0)
        n_rem1 = jax.lax.psum(n_rem1, axis)
        n_tr1 = jax.lax.pmax(n_tr1, axis)
        s1 = combine_tab(s1)
        e1 = combine_tab(e1)
        d1 = combine_or(d1)
        w1 = _pack_tab(s1, e1, d1, pack_se)
        keep, qs, qe, ts, te, slq, slt = _cut_pass(
            qid, tid, qs, qe, ts, te, rev, w1, pack_se, opt.min_span)
        vq = vq & keep
        vm = vm & keep
        n_cut1 = jax.lax.psum(jnp.sum(vq) + jnp.sum(vm), axis)

        # ---- arc filter, relaxed params (hit.c:195-216), both sides ----
        cq = hit2arc(qid, qs, qe, tid, ts, te, rev, slq, slt,
                     int(opt.max_hang * 1.5), 0.5, int(opt.min_ovlp * 0.5))
        cm = hit2arc(tid, ts, te, qid, qs, qe, rev, slt, slq,
                     int(opt.max_hang * 1.5), 0.5, int(opt.min_ovlp * 0.5))

        def flt_keep(c):
            r2 = c["r"]
            return (r2 >= 0) | (r2 == MA_HT_QCONT) | (r2 == MA_HT_TCONT)

        def flt_dp(c, sq, st):
            r2 = c["r"]
            return jnp.where(r2 >= 0, r2,
                             jnp.where(r2 == MA_HT_QCONT, sq, st))

        vq = vq & flt_keep(cq)
        vm = vm & flt_keep(cm)
        n_flt = jax.lax.psum(jnp.sum(vq) + jnp.sum(vm), axis)
        dpv = (jnp.where(vq, flt_dp(cq, slq, slt), 0)
               + jnp.where(vm, flt_dp(cm, slt, slq), 0))
        dp_lo = jax.lax.psum(jnp.sum(dpv & 1023), axis)
        dp_hi = jax.lax.psum(jnp.sum(dpv >> 10), axis)

        # ---- Step 3: fine sweep + cut + merge (main.c:132-135) ----
        s2, e2, d2, has_flt, n_rem2, n_tr2 = sweep(qs, qe, ts, te, vq, vm,
                                                   opt.min_span // 2)
        n_rem2 = jax.lax.psum(n_rem2, axis)
        n_tr2 = jax.lax.pmax(n_tr2, axis)
        s2 = combine_tab(s2)
        e2 = combine_tab(e2)
        d2 = combine_or(d2)
        has_flt = combine_or(has_flt)
        sl1 = e1 - s1
        len_lo = jnp.sum(jnp.where(has_flt & own_mask(), sl1 & 1023, 0))
        len_hi = jnp.sum(jnp.where(has_flt & own_mask(), sl1 >> 10, 0))
        len_lo = jax.lax.psum(len_lo, axis)
        len_hi = jax.lax.psum(len_hi, axis)
        w2 = _pack_tab(s2, e2, d2, pack_se)
        keep, qs, qe, ts, te, slq, slt = _cut_pass(
            qid, tid, qs, qe, ts, te, rev, w2, pack_se, opt.min_span)
        vq = vq & keep
        vm = vm & keep
        n_cut2 = jax.lax.psum(jnp.sum(vq) + jnp.sum(vm), axis)

        ms = s1 + s2
        me = s1 + e2
        mdel = d1 | d2

        # ---- containment marks + final classification (hit.c:225-236,
        #      asm.c:9-39); the cut-pass spans are the merged lengths ----
        cq = hit2arc(qid, qs, qe, tid, ts, te, rev, slq, slt,
                     opt.max_hang, float(opt.int_frac), opt.min_ovlp)
        cm = hit2arc(tid, ts, te, qid, qs, qe, rev, slt, slq,
                     opt.max_hang, float(opt.int_frac), opt.min_ovlp)
        rq = jnp.where(vq, cq["r"], 0)
        rm = jnp.where(vm, cm["r"], 0)
        vqm = vq | vm
        pal_rows = vq & (cq["r"] >= 0) & is_self & (qs == ts) & (qe == te) \
            & (rev != 0)
        qbits = (vqm.astype(I32)
                 | (((rq == MA_HT_QCONT) | (rm == MA_HT_TCONT))
                    .astype(I32) << 1)
                 | (pal_rows.astype(I32) << 2))
        tbits = (vqm.astype(I32)
                 | (((rq == MA_HT_TCONT) | (rm == MA_HT_QCONT))
                    .astype(I32) << 1))
        tab = (jnp.zeros(T, I32)
               .at[jnp.minimum(qid, dump)].max(qbits)
               .at[jnp.minimum(tid, dump)].max(tbits))
        used = combine_or((tab & 1) != 0)
        cont = combine_or((tab & 2) != 0)
        pal = combine_or((tab & 4) != 0)

        read_alive = used & ~mdel & ~cont
        aq = read_alive[jnp.minimum(qid, dump)]
        at = read_alive[jnp.minimum(tid, dump)]
        m_cont = jax.lax.psum(jnp.sum(vq & aq & at) + jnp.sum(vm & aq & at),
                              axis)

        arc_q = vq & (cq["r"] >= 0) & not_self & aq & at
        arc_m = vm & (cm["r"] >= 0) & not_self & aq & at
        arc_rows = jnp.concatenate([arc_q, arc_m])
        n_arc_local = jnp.sum(arc_rows)
        idx = jnp.nonzero(arc_rows, size=arc_cap, fill_value=2 * L - 1)[0]
        ok = jnp.arange(arc_cap, dtype=I32) < n_arc_local
        au = jnp.concatenate([cq["u"], cm["u"]])[idx]
        al = jnp.concatenate([cq["l"], cm["l"]])[idx]
        av = jnp.concatenate([cq["v"], cm["v"]])[idx]
        aol = jnp.concatenate([cq["ol"], cm["ol"]])[idx]
        agid = jnp.concatenate([gid, gid | 1])[idx]
        arcmat = jnp.stack([
            jnp.where(ok, au, 0), jnp.where(ok, al, 0),
            jnp.where(ok, av, 0), jnp.where(ok, aol, 0),
            jnp.where(ok, agid, -1)])

        meta = jnp.stack([ms, me, mdel.astype(I32), cont.astype(I32),
                          used.astype(I32),
                          pal.astype(I32)])[:, :n_seq_cap + 1]
        counts = jnp.stack([n_rem1, n_cut1, n_flt, n_rem2, n_cut2, m_cont,
                            jax.lax.psum(n_arc_local, axis),
                            dp_lo, dp_hi, len_lo, len_hi, n_tr1, n_tr2])
        return arcmat, meta, counts

    return step


def run_sharded(paf_fn, opt: Opt, mesh, *, outfmt: str = "ug",
                fn_reads=None, stage: int = 100, out=None, excl=None):
    """Full PAF -> GFA over the mesh; byte-identical to the single-device
    pipeline (same arc insertion order, same graph path)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..graph.asg import graph_from_arcs
    from ..pipeline import _emit

    out = out or sys.stdout
    n_sh = mesh.devices.size
    sys.stderr.write("[M::main] ===> Step 1: reading read mappings <===\n")
    cols, d, n_lines, n_mirror = _load_originals(paf_fn, opt, excl)
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    log("hit_read", "read %d hits; stored %d hits and %d sequences (%d bp)",
        n_lines, n_mirror, d.n_seq,
        int(np.sum(d.lens_array(), dtype=np.uint64)))

    hostmat, per, block, cap = _partition(cols, n_seq, n_sh)
    max_len = int(np.max(d.lens_array())) if n_seq else 0
    pack_se = bool(max_len < 65535)
    # single-word event sort at small scale (same gate as select_build2)
    pack_ev = bool(max_len < 32767 and n_seq + 2 <= 0xFFFF)
    # capacity proof (no overflow retry needed): every local row yields at
    # most TWO arcs (its own orientation + the implied mirror; hit2arc
    # returns one arc or a non-arc code per side, miniasm.h:86-104), so
    # arc_cap >= 2*per can never drop arcs
    arc_cap = 2 * per

    gmat = jax.device_put(hostmat, NamedSharding(mesh, P(None, "r")))
    # transitions ~= 2 per read in the shard's block; 8x headroom with a
    # validated doubling retry (counts[11:13] carry the true per-shard max)
    tr_cap = _next_pow2(max(1 << 14, 8 * block))
    sys.stderr.write("[M::main] ===> Step 2: 1-pass (crude) read selection <===\n")
    while True:
        step = _make_select_step(mesh, n_seq, n_seq_cap, opt, per=per,
                                 block=block, cap=cap, pack_se=pack_se,
                                 arc_cap=arc_cap, tr_cap=tr_cap,
                                 pack_ev=pack_ev)
        arcmat, meta, counts = jax.jit(step)(gmat)
        arcmat, meta, counts = jax.device_get((arcmat, meta, counts))
        n_tr = max(int(counts[11]), int(counts[12]))
        if n_tr <= tr_cap:
            break
        tr_cap = _next_pow2(n_tr)
    (n_rem1, n_cut1, n_flt, n_rem2, n_cut2, m_cont, n_arc,
     dp_lo, dp_hi, len_lo, len_hi) = [int(x) for x in counts[:11]]
    log("hit_sub", "%d query sequences remain after sub", n_rem1)
    log("hit_cut", "%d hits remain after cut", n_cut1)
    meta = meta[:, :n_seq]
    tot_dp = dp_lo + (dp_hi << 10)
    tot_len = len_lo + (len_hi << 10)
    cov = tot_dp / tot_len if tot_len else 0.0
    log("hit_flt", "%d hits remain after filtering; crude coverage after "
        "filtering: %.2f", n_flt, cov)
    sys.stderr.write("[M::main] ===> Step 3: 2-pass (fine) read selection <===\n")
    log("hit_sub", "%d query sequences remain after sub", n_rem2)
    log("hit_cut", "%d hits remain after cut", n_cut2)

    gids = arcmat[4]
    live = gids >= 0
    arcs = {
        "u": arcmat[0][live].astype(np.int32),
        "l": arcmat[1][live].astype(np.int32),
        "v": arcmat[2][live].astype(np.int32),
        "ol": arcmat[3][live].astype(np.int32),
    }
    # exact arc order without the 2N-key rank build: stable by-hit-key
    # sorting is exact unless a graph key AND a hit key are both
    # duplicated among survivors (same rule and proof as the fused
    # single-device path, pipeline._run_fast_v2's order step)
    ag = gids[live].astype(np.int64)
    rec = ag >> 1
    side = ag & 1
    keys = np.where(side == 1,
                    (cols[3][rec].astype(np.uint64) << np.uint64(32))
                    | cols[4][rec].astype(np.uint64),
                    (cols[0][rec].astype(np.uint64) << np.uint64(32))
                    | cols[1][rec].astype(np.uint64))
    ul = ((arcs["u"].astype(np.uint64) << np.uint64(32))
          | arcs["l"].astype(np.uint64))
    su = np.sort(ul)
    need_full = bool(np.any(su[1:] == su[:-1])) if su.size > 1 else False
    if need_full and keys.size > 1:
        ks = np.sort(keys)
        need_full = bool(np.any(ks[1:] == ks[:-1]))
    if need_full:
        rank = _mirror_ranks(cols, d)
        order = np.argsort(rank[ag], kind="stable")
    else:
        order = np.argsort(keys, kind="stable")
    arcs = {k: v[order] for k, v in arcs.items()}

    g, sub_s, sub_e, sub_del = graph_from_arcs(
        d, meta[0].astype(np.uint32), meta[1].astype(np.uint32),
        meta[2].astype(bool), meta[3].astype(bool), meta[4].astype(bool),
        meta[5].astype(bool), arcs, m_hits=m_cont)
    return _emit(paf_fn, opt, outfmt, fn_reads, stage, out, d, None,
                 sub_s, sub_e, sub_del, prebuilt=g, mesh=mesh)
