"""End-to-end pipeline driver (reference main.c:32-211).

Steps:
  0. optional contained-read prefilter (-R)           [host stream]
  1. PAF load + mirror + stable sort                  [host -> device]
  2. crude read selection (sub/cut/flt)               [device kernels]
  3. fine read selection (sub/cut/merge/contained)    [device + host squeeze]
  4. string-graph build + cleaning                    [device kernels +
                                                       sequential commit]
  5. unitigs + sequences + GFA                        [host]

Stage gating via `stage` mirrors -S (reference main.c:121-188).
"""

from __future__ import annotations

import sys

import numpy as np

from .config import Opt
from .core.hits import Hits, build_hits
from .io.paf import load_paf, no_cont_prefilter
from .select.subregion import hit_sub, log_sub
from .select.cut import hit_cut
from .select.filter import hit_flt, flt_coverage
from .select.contained import hit_contained
from .graph.asg import graph_from_hits
from .graph.clean import del_trans, del_short
from .unitig.unitig import ug_gen
from .unitig.seq import ug_seq
from .gfa.writer import ug_print, sg_print, print_subs, print_hits
from .utils.timers import log


# cumulative per-stage wall times of the last _run_fast_v2 invocation
# (stage -> seconds since run start); bench.py reads this
LAST_TIMING: dict = {}


def _apply_cut(hits: Hits, keep, qs, qe, ts, te) -> Hits:
    keep = np.asarray(keep)
    return Hits(np.asarray(hits.qid), np.asarray(qs, dtype=np.uint32),
                np.asarray(qe, dtype=np.uint32), np.asarray(hits.tid),
                np.asarray(ts, dtype=np.uint32), np.asarray(te, dtype=np.uint32),
                np.asarray(hits.ml), np.asarray(hits.bl),
                np.asarray(hits.rev)).take(keep)


def run(paf_fn: str, opt: Opt, *, outfmt: str = "ug", fn_reads: str | None = None,
        stage: int = 100, no_first: bool = False, no_second: bool = False,
        bi_dir: bool = True, no_cont: bool = False, out=None,
        snapshot_dir: str | None = None):
    out = out or sys.stdout

    import os as _os

    fast_ug = (not no_first and not no_second and stage >= 5
               and (outfmt in ("ug", "sg", "bed")
                    or (outfmt == "paf"
                        and _os.environ.get("MINIASM_TPU_LOADER") != "v2")))
    if (snapshot_dir and fast_ug and outfmt in ("ug", "sg", "bed")
            and not no_cont):
        # stage-boundary restore (SURVEY §5): skip Steps 1-3 entirely when
        # a snapshot for this (PAF, options) pair exists
        from .io.snapshot import load_graph_state

        st = load_graph_state(snapshot_dir, paf_fn, opt, bi_dir=bi_dir)
        if st is not None:
            d, g, sub_s, sub_e, sub_del = st
            sys.stderr.write("[M::main] ===> Steps 1-3 restored from "
                             "snapshot <===\n")
            return _emit(paf_fn, opt, outfmt, fn_reads, stage, out, d,
                         None, sub_s, sub_e, sub_del, prebuilt=g)

    excl = None
    if no_cont:
        sys.stderr.write("[M::main] ===> Step 0: removing contained reads <===\n")
        excl = no_cont_prefilter(paf_fn, opt.min_span, opt.min_match,
                                 opt.max_hang, opt.int_frac)

    sys.stderr.write("[M::main] ===> Step 1: reading read mappings <===\n")
    if fast_ug:
        # production path: one fused device kernel over the unmirrored
        # originals (select/fused2.py) fed by the pipelined native loader
        try:
            from .io.native import available
        except ImportError:
            available = lambda: False  # noqa: E731
        if available():
            return _run_fast_v2(paf_fn, opt, outfmt, fn_reads, stage, out,
                                excl, bi_dir,
                                snapshot_dir=(snapshot_dir if not no_cont
                                              else None))

    # staged per-pass path: -1/-2/-S gating, bed/paf outputs, and the
    # no-native fallback
    load = load_paf(paf_fn, opt.min_span, opt.min_match, excl=excl)
    d = load.d
    hits = build_hits(load, bi_dir=bi_dir)

    sub_s = sub_e = sub_del = None
    if not no_first:
        sys.stderr.write("[M::main] ===> Step 2: 1-pass (crude) read selection <===\n")
        if stage >= 2:
            sub_s, sub_e, sub_del = [np.asarray(x) for x in hit_sub(
                hits.qid, hits.tid, hits.qs, hits.qe, hits.ml, hits.bl,
                d.n_seq, opt.min_dp, opt.min_iden, 0)]
            log_sub(sub_s, sub_e)
            keep, qs, qe, ts, te = hit_cut(
                hits.qid, hits.tid, hits.qs, hits.qe, hits.ts, hits.te,
                hits.rev, sub_s, sub_e, sub_del, opt.min_span)
            hits = _apply_cut(hits, keep, qs, qe, ts, te)
            log("hit_cut", "%d hits remain after cut", hits.n)
        if stage >= 3:
            keep, dp = hit_flt(hits.qid, hits.tid, hits.qs, hits.qe,
                               hits.ts, hits.te, hits.rev,
                               sub_s, sub_e, sub_del,
                               int(opt.max_hang * 1.5), int(opt.min_ovlp * 0.5))
            dp_sum = int(np.sum(np.asarray(dp, dtype=np.int64)))
            hits = hits.take(np.asarray(keep))
            cov = flt_coverage(hits.qid, dp_sum, sub_s, sub_e, hits.n)
            log("hit_flt", "%d hits remain after filtering; crude coverage after filtering: %.2f",
                hits.n, cov)

    if not no_second:
        sys.stderr.write("[M::main] ===> Step 3: 2-pass (fine) read selection <===\n")
        if stage >= 4:
            s2, e2, dl2 = [np.asarray(x) for x in hit_sub(
                hits.qid, hits.tid, hits.qs, hits.qe, hits.ml, hits.bl,
                d.n_seq, opt.min_dp, opt.min_iden, opt.min_span // 2)]
            log_sub(s2, e2)
            keep, qs, qe, ts, te = hit_cut(
                hits.qid, hits.tid, hits.qs, hits.qe, hits.ts, hits.te,
                hits.rev, s2, e2, dl2, opt.min_span)
            hits = _apply_cut(hits, keep, qs, qe, ts, te)
            log("hit_cut", "%d hits remain after cut", hits.n)
            if not no_first:
                # compose pass-2 intervals into pass-1 frame (ma_sub_merge,
                # hit.c:218-223)
                sub_e = sub_s + e2
                sub_s = sub_s + s2
                sub_del = sub_del | dl2
            else:
                sub_s, sub_e, sub_del = s2, e2, dl2
        if stage >= 5:
            hits, sub_s, sub_e, sub_del = hit_contained(
                opt, d, sub_s, sub_e, sub_del, hits)

    return _emit(paf_fn, opt, outfmt, fn_reads, stage, out, d, hits,
                 sub_s, sub_e, sub_del)


def _run_fast_v2(paf_fn, opt, outfmt, fn_reads, stage, out, excl, bi_dir,
                 snapshot_dir=None):
    """Production ug/sg path: dual-sided device kernel over unmirrored
    originals (select/fused2.py), per-stage reference counters restored."""
    import os
    import time

    from .io.native.pafload import load_hits_mt, load_hits_v2
    from .select.fused2 import select_build2
    from .graph.asg import graph_from_arcs

    from .utils import timers

    timing = os.environ.get("MINIASM_TPU_TIMING")
    t0 = time.time()
    LAST_TIMING.clear()
    timers.EXTRA.clear()
    _tick_t0["t0"] = t0

    def tick(name):
        LAST_TIMING[name] = round(time.time() - t0, 3)
        if timing:
            sys.stderr.write("[T::%s] +%.3f\n" % (name, time.time() - t0))

    loader = (load_hits_v2 if os.environ.get("MINIASM_TPU_LOADER") == "v2"
              else load_hits_mt)
    kw = {"retain_full": True} if outfmt == "paf" else {}
    colmat_dev, d, h3 = loader(
        paf_fn, opt.min_span, opt.min_match, excl=excl, bi_dir=bi_dir,
        min_iden=float(opt.min_iden), **kw)
    tick("load+upload")
    log("hit_read", "read %d hits; stored %d hits and %d sequences (%d bp)",
        h3.n_lines, h3.n_mirror, d.n_seq,
        int(np.sum(d.lens_array(), dtype=np.uint64)))

    sys.stderr.write("[M::main] ===> Step 2: 1-pass (crude) read selection <===\n")
    # No speculative rank build: the exact-rank fallback now requires a
    # graph key AND a hit key both duplicated among surviving arcs
    # (measured absent even at 55M mirrored hits, SCALE_r05), and the
    # ~2s radix on a side thread starved against the tunnel client's
    # spinning service threads on this 2-core host — the expected cost
    # of always speculating exceeded the rare exposed fallback.
    arcs, md, counts = select_build2(
        colmat_dev, d, opt, bi_dir=bi_dir, max_len=h3.max_len,
        paf_tables=(outfmt == "paf"))
    tick("select+fetch")
    n_rem1, n_cut1, n_flt, n_rem2, n_cut2, m_cont = counts[:6]
    log("hit_sub", "%d query sequences remain after sub", n_rem1)
    log("hit_cut", "%d hits remain after cut", n_cut1)
    cov = md["tot_dp"] / md["tot_len"] if md["tot_len"] else 0.0
    log("hit_flt", "%d hits remain after filtering; crude coverage after "
        "filtering: %.2f", n_flt, cov)
    sys.stderr.write("[M::main] ===> Step 3: 2-pass (fine) read selection <===\n")
    log("hit_sub", "%d query sequences remain after sub", n_rem2)
    log("hit_cut", "%d hits remain after cut", n_cut2)

    if outfmt == "bed":
        # sub-interval dump (-p bed): merged trim tables + containment
        # deletions straight from the kernel meta; no arc ordering needed
        d.mark_deleted(md["sub_del"] | md["cont"])
        d.mark_deleted(~md["used"])
        h3.free()
        log("hit_contained", "%d sequences and %d hits remain after "
            "containment removal",
            int(np.sum(~d.del_array())), m_cont)
        print_subs(d, md["sub_s"], md["sub_e"], out)
        tick("emit_done")
        _tick_t0.pop("t0", None)
        return None

    if outfmt == "paf":
        # -p paf fast path (print_hits, main.c:21-30): the native replay
        # re-derives each surviving hit's cut coordinates from the
        # kernel's per-read trim tables in the exact sorted mirrored
        # order — no O(hits) device download
        alive = md["used"] & ~md["sub_del"] & ~md["cont"]
        d.mark_deleted(~alive)
        log("hit_contained", "%d sequences and %d hits remain after "
            "containment removal", int(np.sum(alive)), m_cont)
        import io as _io
        import tempfile

        tmpf = None
        try:
            out.flush()
            fd = out.fileno()
        except (OSError, AttributeError, _io.UnsupportedOperation):
            tmpf = tempfile.TemporaryFile()
            fd = tmpf.fileno()
        printed = h3.print_paf(
            md["sub1"], md["sub2"], alive, opt.min_span,
            int(opt.max_hang * 1.5), int(opt.min_ovlp * 0.5), fd)
        if printed < 0:
            h3.free()
            raise OSError("-p paf output write failed (disk full / broken "
                          "pipe?); output is truncated")
        if printed != m_cont:
            sys.stderr.write("[W::main] -p paf replay printed %d hits, "
                             "kernel counted %d\n" % (printed, m_cont))
        h3.free()
        if tmpf is not None:
            tmpf.seek(0)
            data = tmpf.read()
            tmpf.close()
            # prefer the underlying byte buffer: re-encoding the latin-1
            # decode through a text stream would mangle non-ASCII name
            # bytes and break byte-parity
            buf = getattr(out, "buffer", None)
            if buf is not None:
                out.flush()
                buf.write(data)
            else:
                out.write(data.decode("latin-1"))
        tick("emit_done")
        _tick_t0.pop("t0", None)
        return None

    # Restore the reference's arc insertion order (the exact ksort radix
    # permutation of the mirrored hit array, hit.c:100) over the surviving
    # arcs.  Fast path: the insertion order only matters through the graph
    # build's (u<<32|l) radix sort (asg.c:75-78 via cleanup) — the radix
    # is payload-oblivious, so when NO two surviving arcs share a graph
    # key its output is uniquely determined by the keys and any input
    # order with the right per-key occupants is exact.  When graph keys DO
    # collide, a stable sort by each arc's mirrored-hit key (qid<<32|qs of
    # its side) is still exact as long as no two surviving arcs share a
    # HIT key: distinct hit keys mean the hit radix's unstable tie
    # permutation never touches an arc-producing pair, so sorting by hit
    # key reproduces the reference's arc-vector sequence identically and
    # the arc radix (emulated element-exactly by cleanup's radix_argsort)
    # sees the very same input.  Only the double-collision case — some
    # graph key AND some hit key both duplicated among survivors — falls
    # back to the full 2N-key exact-permutation machinery.
    t_rank = time.time()
    ul = ((arcs["u"].astype(np.uint64) << np.uint64(32))
          | arcs["l"].astype(np.uint64))
    sk = np.sort(ul)
    has_dup = bool(np.any(sk[1:] == sk[:-1])) if sk.size > 1 else False
    dup_hit = counts[13] if len(counts) > 13 else 1
    if has_dup and dup_hit and hasattr(h3, "build_rank"):
        # double collision: rebuild the full radix permutation and
        # reorder (idx was skipped in the main fetch; get it lazily)
        timers.add_extra("rank.fallback", 1)
        idx = arcs["idx"]
        if idx is None:
            idx = md["fetch_idx"]()
        h3.build_rank()
        order = np.argsort(h3.arc_ranks(idx), kind="stable")
        arcs = {k: arcs[k][order] for k in ("u", "l", "v", "ol")}
        h3.free()
    else:
        # arcs arrived from the device already in by-hit-key stable
        # order, which is exact here (see the comment above)
        h3.free()
    # the lazy idx closure pins the device arcmat (tens of MB of HBM at
    # 200Mb); the order step is resolved, so release it
    md.pop("fetch_idx", None)
    timers.add_extra("rank.join_s", time.time() - t_rank)
    tick("order")

    g, sub_s, sub_e, sub_del = graph_from_arcs(
        d, md["sub_s"], md["sub_e"], md["sub_del"], md["cont"],
        md["used"], md["pal"], arcs, m_hits=m_cont)
    tick("graph_build")
    if snapshot_dir:
        from .io.snapshot import save_graph_state

        save_graph_state(snapshot_dir, paf_fn, opt, d, g, sub_s, sub_e,
                         sub_del, bi_dir=bi_dir)
        tick("snapshot")
    r = _emit(paf_fn, opt, outfmt, fn_reads, stage, out, d, None,
              sub_s, sub_e, sub_del, prebuilt=g)
    tick("emit_done")
    # clear the tick clock so a later run through a different entry point
    # (e.g. run_sharded in the same process) doesn't measure from stale t0
    _tick_t0.pop("t0", None)
    return r


def _tick(name):
    """Cumulative stage tick into LAST_TIMING (bench.py's breakdown);
    only active when a _run_fast_v2 run initialized the clock."""
    import time

    t0 = _tick_t0.get("t0")
    if t0 is not None:
        LAST_TIMING[name] = round(time.time() - t0, 3)


_tick_t0: dict = {}


def _emit(paf_fn, opt, outfmt, fn_reads, stage, out, d, hits,
          sub_s, sub_e, sub_del, prebuilt=None, mesh=None):
    if outfmt in ("bed", "paf") and sub_s is None:
        # the flag combination never ran a selection pass (-1 with -S<4,
        # or -1 -2): the reference dereferences a NULL sub table here
        # (main.c print_subs/print_hits) — fail gracefully instead
        sys.stderr.write("[W::main] no selection pass ran (-1/-2/-S); "
                         "nothing to print for -p %s\n" % outfmt)
        return None
    if outfmt == "bed":
        print_subs(d, sub_s, sub_e, out)
        return None
    if outfmt == "paf":
        print_hits(hits, d, sub_s, sub_e, out)
        return None
    if outfmt not in ("ug", "sg"):
        raise ValueError("unknown output format %r" % outfmt)

    sys.stderr.write("[M::main] ===> Step 4: graph cleaning <===\n")
    lens = d.lens_array()
    dels = d.del_array()
    if prebuilt is not None:
        g = prebuilt
    else:
        g = graph_from_hits(opt, lens, dels, sub_s, sub_e, sub_del, hits)

    import os

    from .graph import finalize_native as fnat

    fnat_ok = fnat.available() and not os.environ.get("MINIASM_TPU_NO_NATIVE")
    mode = os.environ.get("MINIASM_TPU_CLEAN", "hybrid")

    if mode == "hybrid":
        # production path: every pass detected on device in one dispatch,
        # order-dependent candidates committed host-side in reference scan
        # order (SURVEY §7 plan; graph/hybrid.py)
        from .graph.hybrid import clean_graph

        g = clean_graph(g, opt, stage, mesh=mesh)
        _tick("clean")
        if outfmt == "ug":
            sys.stderr.write("[M::main] ===> Step 5: generating unitigs <===\n")
            ug = ug_gen(g)
            _tick("unitig")
            if fn_reads:
                ug_seq(ug, d, sub_s, sub_e, fn_reads)
                _tick("seq")
            ug_print(ug, d, sub_s, sub_e, out)
            _tick("print")
            return ug
        sg_print(g, d, sub_s, sub_e, out)
        return g

    if stage >= 6:
        sys.stderr.write("[M::main] ===> Step 4.1: transitive reduction <===\n")
        g = del_trans(g, opt.gap_fuzz)

    if mode == "native" and fnat_ok:
        # host C++ sequential oracle (identical output; cross-checked by
        # tests against both the hybrid and Python paths)
        sys.stderr.write("[M::main] ===> Steps 4.2-4.5: graph cleaning (native) <===\n")
        g, ug = fnat.finalize_native(g, opt, stage, do_ug=(outfmt == "ug"))
        if outfmt == "ug":
            sys.stderr.write("[M::main] ===> Step 5: generating unitigs <===\n")
            if fn_reads:
                ug_seq(ug, d, sub_s, sub_e, fn_reads)
            ug_print(ug, d, sub_s, sub_e, out)
            return ug
        sg_print(g, d, sub_s, sub_e, out)
        return g

    # MINIASM_TPU_CLEAN=py: the sequential Python ORACLE (graph/seqclean
    # transliterates the reference passes; tests cross-check hybrid/native
    # against it — never the production default)
    from .graph.seqclean import (cut_tip, cut_internal, cut_biloop,
                                 pop_bubble)

    if stage >= 7:
        sys.stderr.write("[M::main] ===> Step 4.2: initial tip cutting and bubble popping <===\n")
        g, _ = cut_tip(g, opt.max_ext)
        g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 9:
        sys.stderr.write("[M::main] ===> Step 4.3: cutting short overlaps (%d rounds in total) <===\n"
                         % (opt.n_rounds + 1))
        fmin = np.float32(opt.min_ovlp_drop_ratio)
        fmax = np.float32(opt.max_ovlp_drop_ratio)
        for i in range(opt.n_rounds + 1):
            # float32 arithmetic chain, matching the reference's float
            # ma_opt_t members (main.c:168)
            r = fmin + (fmax - fmin) / np.float32(opt.n_rounds) * np.float32(i)
            g, n_short = del_short(g, r)
            if n_short:
                g, _ = cut_tip(g, opt.max_ext)
                g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 10:
        sys.stderr.write("[M::main] ===> Step 4.4: removing short internal sequences and bi-loops <===\n")
        g, _ = cut_internal(g, 1)
        g, _ = cut_biloop(g, opt.max_ext)
        g, _ = cut_tip(g, opt.max_ext)
        g, _ = pop_bubble(g, opt.bub_dist)
    if stage >= 11:
        sys.stderr.write("[M::main] ===> Step 4.5: aggressively cutting short overlaps <===\n")
        g, n_short = del_short(g, opt.final_ovlp_drop_ratio)
        if n_short:
            g, _ = cut_tip(g, opt.max_ext)
            g, _ = pop_bubble(g, opt.bub_dist)

    if outfmt == "ug":
        sys.stderr.write("[M::main] ===> Step 5: generating unitigs <===\n")
        ug = ug_gen(g)
        if fn_reads:
            ug_seq(ug, d, sub_s, sub_e, fn_reads)
        ug_print(ug, d, sub_s, sub_e, out)
        return ug
    sg_print(g, d, sub_s, sub_e, out)
    return g
