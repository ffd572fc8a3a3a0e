"""One-dispatch device graph cleaning: transitive reduction, symmetry
enforcement, and candidate detection for every order-dependent pass.

Architecture (SURVEY.md §7 "device-parallel detection, deterministic
ordered commit"): the graph lives in (V, D) padded neighbor tables in HBM.
A single jitted kernel computes, functionally chained on one entry state:

  1. Myers transitive-reduction elimination marks (asg.c:148-193);
  2. multi-arc marks on the post-trans live set (asg.c:104-121);
  3. asymmetric-arc marks on the post-multi live set (asg.c:124-138);
  4. weak-overlap (del_short) marks at EVERY drop ratio of the 4.3/4.5
     schedule on the post-symm live set (asg.c:83-101);
  5. tip / internal / bi-loop candidate vertices (asg_is_utg_end +
     asg_extend classification, asg.c:199-306);
  6. bubble-source candidates (>= 2 live out-arcs, asg.c:420-424).

Chaining masks inside one kernel is exactly order-equivalent to the
reference's pass-compact-pass sequence because asg_cleanup never re-sorts
after the first sort (the is_srt latch, asg.c:75-78): compaction preserves
relative arc order, so "live slots in slot order" here is the same
sequence the reference's next pass scans.

One dispatch + one fetch (sync round trips cost ~28 ms on the tunnel).
The host applies the exact per-pass masks in reference order, commits the
order-dependent passes sequentially over the (few) candidates, and
re-dispatches detection only when a commit actually changed the graph —
on a clean graph the whole Steps 4.1-4.5 block costs a single round trip.

The O(D^2)-per-row stages (trans, multi, asymm) are chunked over vertex
rows with lax.map so the compare tensors stay bounded on worm-scale
graphs; everything still compiles to one dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .asg import Graph

I32 = jnp.int32

# compare-tensor budget per chunk: clen * D * D * 4B <= ~256 MB
_CHUNK_BYTES = 1 << 28


def _pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


def _ladder(x: int) -> int:
    """Smallest {4,5,6,7}*2^k >= x (min 8): the O(Vp*D*D) stages price
    padding rows directly, and a pure pow2 round-up wastes up to 2x; the
    ladder caps waste at 14% while still recurring across graph sizes
    (compile-cache friendly).  Always divisible by 4 (mask packing and
    pow2 n_chunks require it)."""
    if x <= 64:
        return _pow2(max(x, 8))  # small: pow2 keeps every divisor handy
    k = 4  # >= 16: ladder values stay divisible by 16 for the chunk loop
    while (7 << k) < x:
        k += 1
    for m in (4, 5, 6, 7):
        if (m << k) >= x:
            return m << k
    return 8 << k


def build_arcs(g: Graph, min_div: int = 1):
    """Compacted per-arc columns + per-vertex delete bits for the device
    table build.  Shapes are padded to power-of-two buckets so repeated
    detections within a run (after commits shrink the graph) reuse the
    same compiled kernel.  Requires a compacted graph (no tombstones):
    detection is only invoked right after a cleanup, like every reference
    pass.

    Uploading the O(n_arc) arc columns (uint16 when values fit) instead
    of the (Vp, Dp) neighbor tables cuts the detect-path H2D transfer
    ~10x (0.3 MB vs 3 MB at ~70 MB/s); the kernel scatters the tables in
    ~1 ms.  Arc padding uses u = Vp, which scatters out of bounds with
    mode='drop'."""
    assert not g.adel.any(), "detect() requires a compacted graph"
    V = g.n_vtx
    D = max(int(g.idx_cnt.max()) if g.n_arc else 1, 1)
    Vp = _ladder(max(V, 2))
    if min_div > 1 and Vp % min_div:
        # mesh path: the chunked lax.map must split Vp evenly over
        # pow2(n_devices) chunks; ladder values are divisible by 16 only
        Vp = _pow2(max(V, 2, min_div))
    Dp = _pow2(D)
    Ap = _ladder(max(g.n_arc, 1))
    # int32 columns always: sub-word device arrays hit a pathological
    # transfer/lowering path on this backend (measured on the tunnel).
    # (l, ol) pack into one word when both fit 16 bits (the common case:
    # they are bounded by read length), cutting the per-detect H2D 25%.
    pack_lol = bool(g.n_arc == 0
                    or (int(g.l.max()) < 65536 and int(g.ol.max()) < 65536
                        and int(g.l.min()) >= 0 and int(g.ol.min()) >= 0))
    au = np.full(Ap, Vp, dtype=np.int32)
    av = np.zeros(Ap, dtype=np.int32)
    au[:g.n_arc] = g.u
    av[:g.n_arc] = g.v
    if pack_lol:
        lol = np.zeros(Ap, dtype=np.int32)
        lol[:g.n_arc] = ((g.l.astype(np.uint32) << 16)
                         | g.ol.astype(np.uint32)).astype(np.int32)
        cols = (au, lol, av)
    else:
        al = np.zeros(Ap, dtype=np.int32)
        aol = np.zeros(Ap, dtype=np.int32)
        al[:g.n_arc] = g.l
        aol[:g.n_arc] = g.ol
        cols = (au, al, av, aol)
    sdel_v = np.ones(Vp, dtype=bool)  # padding vertices are "deleted"
    sdel_v[:V] = g.sdel[np.arange(V) >> 1]
    return cols, pack_lol, sdel_v, V, Vp, Dp, Ap


def _short_frac_cut() -> float:
    """Exact emulation of the reference's weak-arc threshold rounding
    (asg.c:90): thres = (uint32_t)((float)(ol * ratio) + .499) — an f32
    product, an f64 add of .499, then truncation.  Equivalently:
    thres = floor(part32) + [frac(part32) >= 1 - 0.499_f64].  The cut
    constant is the smallest float32 >= (1 - 0.499) in f64, computed here
    so the on-device comparison of the (exactly f32) fraction matches the
    f64 semantics bit-for-bit."""
    c = 1.0 - 0.499  # f64
    c32 = np.float32(c)
    if float(c32) < c:
        c32 = np.nextafter(c32, np.float32(2.0))
    return float(c32)


@functools.partial(jax.jit, static_argnames=("Vp", "Dp", "n_chunks", "fuzz",
                                             "ratios", "max_ext", "do_trans",
                                             "do_symm", "pack_lol",
                                             "row_sharding"))
def _clean_kernel(*cols_and_sdel, Vp, Dp, n_chunks,
                  fuzz, ratios, max_ext, do_trans, do_symm, pack_lol,
                  row_sharding=None):
    if pack_lol:
        au, lol, av, sdel_v = cols_and_sdel
        lol_u = lol.astype(jnp.uint32)
        al = (lol_u >> 16).astype(I32)
        aol = (lol_u & 0xFFFF).astype(I32)
    else:
        au, al, av, aol, sdel_v = cols_and_sdel
    D = Dp
    # ---- build the (Vp, Dp) neighbor tables from the CSR-ordered arc
    # columns: slot = position within the source vertex's run; padding
    # arcs carry u = Vp and drop out of bounds ----
    au = au.astype(I32)
    first = jnp.searchsorted(au, jnp.arange(Vp + 1, dtype=I32), side="left")
    nv = (first[1:] - first[:Vp]).astype(I32)
    slots = jnp.arange(au.shape[0], dtype=I32) - first[jnp.minimum(au, Vp)]
    nbr_v = jnp.full((Vp, D), -1, I32).at[au, slots].set(
        av.astype(I32), mode="drop")
    nbr_l = jnp.full((Vp, D), jnp.int32(2**31 - 1)).at[au, slots].set(
        al.astype(I32), mode="drop")
    nbr_ol = jnp.zeros((Vp, D), I32).at[au, slots].set(
        aol.astype(I32), mode="drop")
    if row_sharding is not None:
        # multi-device: vertex tables row-sharded over the mesh; XLA
        # inserts the collectives for cross-row neighbor reads
        nbr_v = jax.lax.with_sharding_constraint(nbr_v, row_sharding)
        nbr_l = jax.lax.with_sharding_constraint(nbr_l, row_sharding)
        nbr_ol = jax.lax.with_sharding_constraint(nbr_ol, row_sharding)
    clen = Vp // n_chunks
    c0s = jnp.arange(n_chunks, dtype=I32) * clen

    # ---- stage A (chunked): 4.1 transitive reduction + multi-arc marks.
    # Both only compare slots of the same row (trans scans neighbor rows via
    # gathers into the FULL tables), so chunking over rows is exact. ----
    def chunk_a(c0):
        cv = jax.lax.dynamic_slice_in_dim(nbr_v, c0, clen, 0)
        cl = jax.lax.dynamic_slice_in_dim(nbr_l, c0, clen, 0)
        cnv = jax.lax.dynamic_slice_in_dim(nv, c0, clen)
        csdel = jax.lax.dynamic_slice_in_dim(sdel_v, c0, clen)
        slot = jax.lax.broadcasted_iota(I32, (clen, D), 1)
        in_table = slot < cnv[:, None]

        if do_trans:
            last = jnp.maximum(cnv - 1, 0)
            bound = jnp.where(
                cnv > 0,
                jnp.take_along_axis(cl, last[:, None], 1)[:, 0] + fuzz, 0)
            active = (cnv > 0) & ~csdel
            # per-slot marks: 1 in-play, 2 eliminated; duplicate targets
            # demote together so per-slot == the reference's per-vertex marks
            mark = jnp.where(in_table & active[:, None], 1, 0).astype(jnp.int8)

            def body(i, mark):
                w = cv[:, i]
                li = cl[:, i]
                scan_ok = active & (i < cnv) & (mark[:, i] == 1)
                wi = jnp.maximum(w, 0)
                wn_v = nbr_v[wi]          # (clen, D) full-table gather
                wn_l = nbr_l[wi]
                # nbr_l is sorted per row, so the <=bound mask equals the
                # reference's break-on-first-violation scan (asg.c:169)
                within = wn_l + li[:, None] <= bound[:, None]
                wn_valid = (jax.lax.broadcasted_iota(I32, (clen, D), 1)
                            < nv[wi][:, None])
                cand = within & wn_valid & scan_ok[:, None]
                hit = (cv[:, :, None] == wn_v[:, None, :]) & cand[:, None, :]
                demote = jnp.any(hit, axis=2) & (mark != 0)
                return jnp.where(demote, jnp.int8(2), mark)

            mark = jax.lax.fori_loop(0, D, body, mark)
            elim = mark == 2
        else:
            elim = jnp.zeros((clen, D), bool)
        live = in_table & ~elim

        # multi-arcs: keep the first live slot per (row, target); the
        # reference's count-down loop keeps the smallest slot (asg.c:108-115)
        eq = cv[:, :, None] == cv[:, None, :]
        earlier_live = (slot[:, None, :] < slot[:, :, None]) & live[:, None, :]
        multi = jnp.any(eq & earlier_live, axis=2) & live
        return elim, multi

    elim, multi = jax.lax.map(chunk_a, c0s)
    elim = elim.reshape(Vp, D)
    multi = multi.reshape(Vp, D)
    slot = jax.lax.broadcasted_iota(I32, (Vp, D), 1)
    in_table = slot < nv[:, None]
    n_trans = jnp.sum(elim & in_table)
    n_multi = jnp.sum(multi)
    live1 = in_table & ~elim & ~multi

    # ---- stage B (chunked): asymmetric arcs need the global post-multi
    # live table (complement v^1 -> u^1 must be live), so it runs as a
    # second chunked sweep over the finished live1 ----
    def chunk_b(c0):
        cv = jax.lax.dynamic_slice_in_dim(nbr_v, c0, clen, 0)
        clive = jax.lax.dynamic_slice_in_dim(live1, c0, clen, 0)
        u_comp = ((jax.lax.broadcasted_iota(I32, (clen, D), 0) + c0) ^ 1)
        wrow = jnp.maximum(cv ^ 1, 0)
        comp_v = nbr_v[wrow]          # (clen, D, D)
        comp_live = live1[wrow]
        has_comp = jnp.any((comp_v == u_comp[:, :, None]) & comp_live, axis=2)
        return clive & ~has_comp

    asymm = jax.lax.map(chunk_b, c0s).reshape(Vp, D)
    n_asymm = jnp.sum(asymm)
    # Downstream masks see the post-symm live set when the graph will be
    # symmetric at their apply point (the common case: trans > 0 forces a
    # symm, asg.c:188-192); when trans reduced nothing, the reference
    # leaves multi/asymm arcs in the graph until pop_bubble symms it, and
    # the candidates must be classified on that unsymmetrized state.
    live = (live1 & ~asymm) if do_symm else (in_table & ~elim)

    nlive = jnp.sum(live, axis=1).astype(I32)

    # ---- weak-overlap masks at every scheduled ratio (asg.c:83-101);
    # ol is non-increasing in slot order, so "the suffix below the first
    # live arc's threshold" equals a plain mask on non-first live slots ----
    first_slot = jnp.argmax(live, axis=1)
    first_ol = jnp.take_along_axis(nbr_ol, first_slot[:, None], 1)[:, 0]
    is_first = slot == first_slot[:, None]
    shorts = []
    frac_cut = jnp.float32(_short_frac_cut())
    for r in ratios:
        part = first_ol.astype(jnp.float32) * jnp.float32(r)
        base = jnp.floor(part)
        thres = (base + jnp.where(part - base >= frac_cut, 1.0, 0.0))
        thres = thres.astype(jnp.uint32).astype(I32)
        m = live & (nlive >= 2)[:, None] & ~is_first & (nbr_ol < thres[:, None])
        shorts.append(m)

    # ---- unitig-end classification per vertex row (asg.c:204-221) ----
    # code_row[r] = what asg_is_utg_end(v) returns when it inspects row r
    # (i.e. for v = r^1): nv live arcs of r; when unique, its target's
    # complement row must also have exactly one live arc to be MERGEABLE.
    fl_v = jnp.take_along_axis(nbr_v, first_slot[:, None], 1)[:, 0]
    fl_v = jnp.where(nlive > 0, fl_v, 0)
    w_back = jnp.maximum(fl_v ^ 1, 0)
    nw = nlive[w_back]
    code_row = jnp.where(nlive == 0, 1,
                         jnp.where(nlive > 1, 2,
                                   jnp.where(nw != 1, 3, 0)))  # TIP/MO/MN/ME

    # asg_extend(v, max_ext): evaluates is_utg_end(v^1) — which reads row
    # cur — at cur = v, then follows the unique live target while MERGEABLE,
    # max_ext evaluations total (asg.c:223-236)
    vids = jnp.arange(Vp, dtype=I32)
    cur = vids
    final = jnp.full((Vp,), -1, I32)  # -1 = still extending
    for _ in range(max_ext):
        c = code_row[jnp.maximum(cur, 0)]
        final = jnp.where((final < 0) & (c != 0), c, final)
        nxt = fl_v[jnp.maximum(cur, 0)]
        cur = jnp.where(final < 0, nxt, cur)
    # loop exhausted while still MERGEABLE -> the reference returns 0
    ext_code = jnp.where(final < 0, 0, final)

    not_sdel = ~sdel_v
    start_code = code_row[vids ^ 1]  # is_utg_end(v) inspects row v^1
    tip_cand = not_sdel & (start_code == 1) & (ext_code != 0)
    mn_start = not_sdel & (start_code == 3)
    internal_cand = mn_start & (ext_code == 3)
    biloop_cand = mn_start & (ext_code == 2)
    bub_cand = not_sdel & (nlive >= 2)

    # pack per-slot masks into one bitfield and COMPACT to arc order on
    # device: the host only ever reads the bits of real arcs, and the
    # (Vp, D) table is ~Vp*D/n_arc times larger than the arc list (a
    # 16.8 MB vs 1 MB D2H at worm scale on a ~35 MB/s tunnel).  Word type
    # stays int32 (sub-word D2H is pathological on this backend); with
    # <= 8 bits per slot, four arcs pack into each int32 lane
    bits = (elim.astype(I32)
            | (multi.astype(I32) << 1)
            | (asymm.astype(I32) << 2))
    for k, m in enumerate(shorts):
        bits = bits | (m.astype(I32) << (3 + k))
    arc_bits = bits[jnp.minimum(au, Vp - 1),
                    jnp.clip(slots, 0, D - 1)]  # padding arcs: garbage, cut
    Ap = au.shape[0]
    if 3 + len(ratios) <= 8 and Ap % 4 == 0:
        a4 = arc_bits.reshape(Ap // 4, 4)
        arc_bits = (a4[:, 0] | (a4[:, 1] << 8) | (a4[:, 2] << 16)
                    | (a4[:, 3] << 24))
    cands = (tip_cand.astype(I32)
             | (internal_cand.astype(I32) << 1)
             | (biloop_cand.astype(I32) << 2)
             | (bub_cand.astype(I32) << 3))
    if Vp % 4 == 0:
        c4 = cands.reshape(Vp // 4, 4)
        cands = (c4[:, 0] | (c4[:, 1] << 8) | (c4[:, 2] << 16)
                 | (c4[:, 3] << 24))
    counters = jnp.stack([n_trans, n_multi, n_asymm]
                         + [jnp.sum(m) for m in shorts])
    return arc_bits, cands, counters


def detect(g: Graph, opt, *, do_trans: bool, do_symm: bool = True,
           mesh=None):
    """Run the detection kernel on the current graph.  Returns a dict with
    per-slot masks (numpy (n_arc,) bool in CSR arc order), candidate
    vertex masks ((n_vtx,) bool), and counters.

    With a mesh, the kernel's inputs are replicated and its vertex tables
    form on device; the same jitted kernel runs SPMD with XLA inserting
    the collectives for the cross-row neighbor reads."""
    import time as _time

    from ..utils.timers import add_extra

    t0 = _time.time()
    min_div = 1
    if mesh is not None:
        min_div = _pow2(mesh.devices.size)
    cols, pack_lol, sdel_v, V, Vp, Dp, Ap = build_arcs(g, min_div=min_div)
    add_extra("clean.build_s", _time.time() - t0)
    ratios = _ratio_schedule(opt)
    n_chunks = 1
    while (Vp // n_chunks * Dp * Dp * 4 > _CHUNK_BYTES
           and Vp % (n_chunks * 2) == 0):
        n_chunks *= 2
    tabs = [jnp.asarray(c) for c in cols] + [jnp.asarray(sdel_v)]
    row_sharding = None
    if mesh is not None and Vp >= mesh.devices.size:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_sh = mesh.devices.size
        if n_chunks % n_sh:
            # chunked lax.map must split evenly per shard AND n_chunks
            # must divide Vp (a power of two): round n_sh up to pow2
            p2 = 1
            while p2 < n_sh:
                p2 <<= 1
            n_chunks = max(n_chunks, p2)
        ax = mesh.axis_names[0]
        rep = NamedSharding(mesh, P())
        tabs = [jax.device_put(np.asarray(t), rep) for t in tabs]
        row_sharding = NamedSharding(mesh, P(ax, None))
    arc_bits, cands, counters = _clean_kernel(
        *tabs, Vp=Vp, Dp=Dp,
        n_chunks=n_chunks, fuzz=int(opt.gap_fuzz), ratios=ratios,
        max_ext=int(opt.max_ext), do_trans=do_trans, do_symm=do_symm,
        pack_lol=pack_lol, row_sharding=row_sharding)
    arc_bits, cands, counters = jax.device_get((arc_bits, cands, counters))
    add_extra("clean.detect_s", _time.time() - t0)
    add_extra("clean.detect_n", 1)
    # unpack the 4-arcs-per-int32-lane wire format (little-endian bytes)
    if 3 + len(ratios) <= 8 and Ap % 4 == 0:
        arc_bits = np.ascontiguousarray(arc_bits).view(np.uint8)
    arc_bits = (arc_bits[:g.n_arc].astype(np.int32) if g.n_arc
                else np.zeros(0, np.int32))
    if Vp % 4 == 0:
        cands = (np.ascontiguousarray(cands).view(np.uint8)
                 .reshape(Vp)[:V].astype(np.int32))
    else:
        cands = cands[:V]
    out = {
        "trans": (arc_bits & 1).astype(bool),
        "multi": ((arc_bits >> 1) & 1).astype(bool),
        "asymm": ((arc_bits >> 2) & 1).astype(bool),
        "shorts": [((arc_bits >> (3 + k)) & 1).astype(bool)
                   for k in range(len(ratios))],
        "ratios": ratios,
        "tip": (cands & 1).astype(bool),
        "internal": ((cands >> 1) & 1).astype(bool),
        "biloop": ((cands >> 2) & 1).astype(bool),
        "bubble": ((cands >> 3) & 1).astype(bool),
        "counters": [int(x) for x in counters],
    }
    return out


def _ratio_schedule(opt):
    """The 4.3 + 4.5 drop-ratio sequence (main.c:167-188), float32 chain
    like the reference's float ma_opt_t members."""
    fmin = np.float32(opt.min_ovlp_drop_ratio)
    fmax = np.float32(opt.max_ovlp_drop_ratio)
    rs = []
    for i in range(opt.n_rounds + 1):
        rs.append(float(fmin + (fmax - fmin) / np.float32(opt.n_rounds)
                        * np.float32(i)))
    rs.append(float(np.float32(opt.final_ovlp_drop_ratio)))
    return tuple(rs)
