"""Multi-PROCESS (multi-host) pipeline rung: per-process PAF range
reading + jax.distributed global mesh (SURVEY §4.iv; BASELINE north star
"hits sharded across >= 2 hosts").

Each process reads only its own byte range of the PAF (snapped to line
boundaries, with the reference's 10-field bl-carry seeded by a bounded
backward scan — paf.c:34-67 semantics across the split), interns names
locally, and the processes then agree on the GLOBAL id space by
exchanging only their (tiny) name tables: ranges are in file order, so
merging the per-range first-appearance lists in process order reproduces
the reference's single-stream id assignment exactly (query before
target, surviving lines only, hit.c:87-88).

Hits never centralize: each process device_puts its own rows, one
all_to_all repartitions them to their query-owner shard, and the
existing sharded select step (parallel/full._make_select_step) runs
SPMD over the global mesh.  Only the surviving arcs (O(reads)) and the
per-read meta tables are gathered to process 0, which runs the graph ->
unitig -> GFA tail and writes output byte-identical to the
single-process pipeline.

The exact-rank fixup is O(arcs), not O(hits): each process computes the
mirrored-hit sort keys (qid<<32|qs of the arc's side) for the surviving
arcs whose source records live in ITS byte range, and one allgather of
those per-arc keys lets every process order the arcs.  That order is
exact unless some graph key (u<<32|l) AND some hit key are BOTH
duplicated among survivors (see pipeline._run_fast_v2's order step for
the proof sketch); only that double-collision case falls back to
gathering all records' 16-byte keys to rebuild the full radix
permutation — a logged rarity, not the steady state.

Gzipped inputs can't be byte-range split; each process streams the gz
to a local spool file once (parallel across processes, no
centralization) and range-reads the spool.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HIT_ROWS = 8


# ---------------------------------------------------------------------------
# range splitting + carry seeding (host, no jax)

def spool_gz(paf_fn: str, tmpdir: str) -> str:
    """Decompress a .gz PAF to a local spool file so byte-range splitting
    works (the compressed stream can't seek).  Each process spools its own
    copy — O(file) work per process but embarrassingly parallel and free
    of any rank-0 centralization (the reference reads .paf.gz natively
    everywhere, paf.c:9-20)."""
    import gzip
    import shutil

    out = os.path.join(tmpdir, "spool.paf")
    with gzip.open(paf_fn, "rb") as fi, open(out, "wb") as fo:
        shutil.copyfileobj(fi, fo, 1 << 22)
    return out


def split_ranges(paf_fn: str, n: int):
    """[(off, end)] byte ranges covering the file, snapped so each range
    starts right after a newline (range 0 starts at 0).  Gz streams can't
    seek cheaply -> single range (callers should spool_gz first; the
    worker does)."""
    if paf_fn.endswith(".gz"):
        sys.stderr.write("[W::multihost] gz input not range-splittable; "
                         "process 0 reads it whole (spool_gz to "
                         "parallelize)\n")
        return [(0, os.path.getsize(paf_fn))] + [(0, 0)] * (n - 1)
    size = os.path.getsize(paf_fn)
    cuts = [0]
    with open(paf_fn, "rb") as f:
        for k in range(1, n):
            tgt = size * k // n
            f.seek(tgt)
            f.readline()  # advance to the next line start
            cuts.append(min(f.tell(), size))
    cuts.append(size)
    return [(cuts[k], cuts[k + 1]) for k in range(n)]


def _carry_seed(paf_fn: str, off: int) -> int | None:
    """bl of the nearest complete line with >= 11 fields ending before
    `off` (the reference reuses the previous line's bl for 10-field
    lines, paf.c:56-60); bounded backward scan."""
    if off == 0:
        return None
    win = 1 << 16
    with open(paf_fn, "rb") as f:
        while True:
            start = max(0, off - win)
            f.seek(start)
            buf = f.read(off - start)
            lines = buf.split(b"\n")
            # lines[0] may be partial unless start == 0
            cand = lines[1:-1] if start > 0 else lines[:-1]
            for ln in reversed(cand):
                t = ln.split(b"\t")
                if len(t) >= 11:
                    try:
                        return int(t[10])
                    except ValueError:
                        return None
            if start == 0:
                return None
            win *= 4


def extract_range(paf_fn: str, off: int, end: int, out_fn: str):
    """Copy [off, end) to out_fn and return the bl-carry seed for the
    range (the bl of the nearest complete 11-field line before `off`,
    None at file start) — passed to the parser via its explicit
    carry-seed hook rather than a synthetic line, so no phantom record
    can survive under degenerate filter settings (-s0 -m0)."""
    seed = _carry_seed(paf_fn, off)
    with open(out_fn, "wb") as out, open(paf_fn, "rb") as f:
        f.seek(off)
        left = end - off
        while left > 0:
            chunk = f.read(min(left, 1 << 24))
            if not chunk:
                break
            out.write(chunk)
            left -= len(chunk)
    return seed


# ---------------------------------------------------------------------------
# worker

def _gather_name_tables(names, lens, procs: int):
    """Allgather the per-process (names blob, lens) and merge in process
    order -> (global SeqDict, local-id -> global-id map for THIS proc)."""
    import jax
    from jax.experimental import multihost_utils as mhu

    from ..io.seqdict import SeqDict

    blob = ("\0".join(names)).encode("latin-1")
    blob_arr = np.frombuffer(blob, dtype=np.uint8)
    n_b = np.zeros(procs, np.int64)
    n_b[jax.process_index()] = blob_arr.shape[0]
    n_l = np.zeros(procs, np.int64)
    n_l[jax.process_index()] = len(names)
    sizes = mhu.process_allgather(np.stack([n_b, n_l]))  # (procs, 2, procs)
    sizes = sizes.sum(axis=0)
    max_b = max(int(sizes[0].max()), 1)
    max_l = max(int(sizes[1].max()), 1)
    pb = np.zeros(max_b, np.uint8)
    pb[:blob_arr.shape[0]] = blob_arr
    pl = np.zeros(max_l, np.uint32)
    pl[:len(lens)] = lens
    all_b = mhu.process_allgather(pb)      # (procs, max_b)
    all_l = mhu.process_allgather(pl)
    d = SeqDict()
    gmaps = []
    for p in range(procs):
        nb = int(sizes[0][p])
        nl = int(sizes[1][p])
        pnames = (bytes(all_b[p][:nb]).decode("latin-1").split("\0")
                  if nb else [])
        gmap = np.empty(nl, np.int32)
        for i in range(nl):
            nm = pnames[i]
            gi = d.index.get(nm)
            if gi is None:
                gi = len(d.names)
                d.index[nm] = gi
                d.names.append(nm)
                d.lens.append(int(all_l[p][i]))
            gmap[i] = gi
        gmaps.append(gmap)
    return d, gmaps[jax.process_index()]


def _load_local(paf_fn, opt, rng, tmpdir):
    """Parse this process's byte range into host (7, n) columns with
    LOCAL ids + the local name table (first-appearance order)."""
    off, end = rng
    whole = off == 0 and end >= os.path.getsize(paf_fn)
    if whole:
        # whole-file range (single process): parse the original directly,
        # skipping the pointless byte copy
        part, seed = paf_fn, None
    else:
        part = os.path.join(tmpdir, "part_%d.paf" % off)
        seed = extract_range(paf_fn, off, end, part)
    try:
        from ..io.native import available
    except ImportError:
        available = lambda: False  # noqa: E731
    if available():
        from ..io.native.pafload import load_hits_mt

        cm, d, h3 = load_hits_mt(part, opt.min_span, opt.min_match,
                                 bi_dir=True, min_iden=float(opt.min_iden),
                                 upload=False, carry_seed=seed)
        n = h3.n_orig
        cols = np.ascontiguousarray(cm[:, :n])
        stats = (h3.n_lines, h3.n_mirror)
        h3.free()
    else:
        from ..io.paf import load_paf

        load = load_paf(part, opt.min_span, opt.min_match, bl_carry=seed)
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
        stats = (load.n_lines,
                 n + int(np.sum(load.qid != load.tid)))
    if not whole:
        os.unlink(part)
    return cols, d, stats


def worker(paf_fn: str, out_fn: str, *, coordinator: str, num_procs: int,
           proc_id: int, opt=None, platform: str | None = None):
    """Entry point for one jax.distributed process.  `platform` overrides
    the JAX backend (the test harness passes "cpu" via JAX_PLATFORMS; a
    real deployment leaves it unset and runs on the session's
    accelerators)."""
    import jax

    platform = platform or os.environ.get("JAX_PLATFORMS")
    if platform:
        # the container may register accelerator plugins at interpreter
        # start, so the env var alone does not always win — set explicitly
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=proc_id)
    import tempfile

    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..config import Opt
    from ..graph.asg import graph_from_arcs
    from ..pipeline import _emit
    from ..utils.timers import log
    from .full import (_make_select_step, _next_pow2, _round_up,
                       _mirror_ranks)

    opt = opt or Opt()
    me = jax.process_index()
    procs = jax.process_count()
    mesh = Mesh(np.array(jax.devices()), ("r",))
    n_sh = mesh.devices.size
    dev_per_proc = n_sh // procs

    with tempfile.TemporaryDirectory() as td:
        src_fn = spool_gz(paf_fn, td) if paf_fn.endswith(".gz") else paf_fn
        rng = split_ranges(src_fn, procs)[me]
        cols, dloc, (n_lines_l, _) = _load_local(src_fn, opt, rng, td)

    d, gmap = _gather_name_tables(dloc.names, dloc.lens, procs)
    n_seq = d.n_seq
    n_seq_cap = _next_pow2(max(n_seq, 1))
    block = -(-max(n_seq, 1) // n_sh)

    # global record index = prefix over processes (file order) -> gid
    n_local = cols.shape[1]
    counts = np.zeros(procs, np.int64)
    counts[me] = n_local
    counts = mhu.process_allgather(counts).sum(axis=0)
    g_off = int(counts[:me].sum())
    cols[0] = gmap[cols[0]]
    cols[3] = gmap[cols[3]]
    gid = ((g_off + np.arange(n_local, dtype=np.int64)) * 2).astype(np.int32)
    cols = np.vstack([cols, gid[None, :]])
    n_orig = int(counts.sum())
    not_self = cols[0] != cols[3]
    n_mirror_l = n_local + int(np.sum(not_self))
    n_mirror = int(mhu.process_allgather(
        np.array([n_mirror_l if p == me else 0 for p in range(procs)],
                 np.int64)).sum())
    n_lines = int(mhu.process_allgather(
        np.array([n_lines_l if p == me else 0 for p in range(procs)],
                 np.int64)).sum())
    if me == 0:
        sys.stderr.write("[M::main] ===> Step 1: reading read mappings "
                         "(multi-host, %d processes) <===\n" % procs)
        log("hit_read",
            "read %d hits; stored %d hits and %d sequences (%d bp)",
            n_lines, n_mirror, n_seq,
            int(np.sum(d.lens_array(), dtype=np.uint64)))

    # ---- exact exchange capacities from allgathered histograms ----
    owner = cols[0] // block
    hist_r = np.zeros((n_sh, n_sh), np.int64)  # repartition: parse->owner
    my_devs = range(me * dev_per_proc, (me + 1) * dev_per_proc)
    # local rows are split evenly over this proc's devices in parse order
    bounds = np.linspace(0, n_local, dev_per_proc + 1).astype(np.int64)
    for j, dv in enumerate(my_devs):
        seg = slice(int(bounds[j]), int(bounds[j + 1]))
        np.add.at(hist_r, (np.full(int(bounds[j + 1] - bounds[j]), dv),
                           owner[seg]), 1)
    hist_r = mhu.process_allgather(hist_r).sum(axis=0) \
        if procs > 1 else hist_r
    capR = _round_up(max(int(hist_r.max()), 1))
    dst_m = cols[3] // block
    hist_m = np.zeros((n_sh, n_sh), np.int64)  # mirror: owner->target owner
    np.add.at(hist_m, (owner[not_self], dst_m[not_self]), 1)
    hist_m = mhu.process_allgather(hist_m).sum(axis=0) \
        if procs > 1 else hist_m
    cap = _round_up(max(int(hist_m.max()), 1))

    # ---- per-process upload + device repartition by query owner ----
    # shard width must agree globally: size for the largest process range
    per_in = _round_up(max(int(np.ceil(int(counts.max())
                                       / max(dev_per_proc, 1))), 1))
    local_mat = np.zeros((HIT_ROWS, dev_per_proc * per_in), np.int32)
    for j in range(dev_per_proc):
        seg = slice(int(bounds[j]), int(bounds[j + 1]))
        w = int(bounds[j + 1] - bounds[j])
        local_mat[:, j * per_in:j * per_in + w] = cols[:, seg]
    gmat_in = mhu.host_local_array_to_global_array(
        local_mat, mesh, P(None, "r"))

    per = n_sh * capR

    import functools

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(P(None, "r"),),
                       out_specs=P(None, "r"))
    def repart(cm):
        valid = (cm[6] & 1) != 0
        dest = jnp.where(valid, cm[0] // block, n_sh)
        L = cm.shape[1]
        iota = jnp.arange(L, dtype=jnp.int32)
        order = jax.lax.sort((dest.astype(jnp.int32), iota), dimension=0,
                             is_stable=True, num_keys=1)[1]
        sd = dest[order].astype(jnp.int32)
        first = jnp.searchsorted(sd, jnp.arange(n_sh + 1, dtype=jnp.int32),
                                 side="left").astype(jnp.int32)
        slot = iota - first[jnp.minimum(sd, n_sh)]
        flat = jnp.where(sd < n_sh, sd * capR + slot, n_sh * capR)
        send = jnp.zeros((HIT_ROWS, n_sh * capR + 1), jnp.int32)
        send = send.at[:, flat].set(cm[:, order])
        send = send[:, :n_sh * capR].reshape(HIT_ROWS, n_sh, capR)
        recv = jax.lax.all_to_all(send, "r", split_axis=1, concat_axis=1)
        return recv.reshape(HIT_ROWS, n_sh * capR)

    gmat = jax.jit(repart)(gmat_in)

    max_len = int(np.max(d.lens_array())) if n_seq else 0
    pack_se = bool(max_len < 65535)
    pack_ev = bool(max_len < 32767 and n_seq + 2 <= 0xFFFF)
    arc_cap = 2 * per
    step = _make_select_step(mesh, n_seq, n_seq_cap, opt, per=per,
                             block=block, cap=cap, pack_se=pack_se,
                             arc_cap=arc_cap, pack_ev=pack_ev)
    if me == 0:
        sys.stderr.write("[M::main] ===> Step 2: 1-pass (crude) read "
                         "selection <===\n")
    arcmat, meta, counts_dev = jax.jit(step)(gmat)
    # replicate the sharded arc matrix so process 0 can read it whole
    arcmat = jax.jit(lambda x: x,
                     out_shardings=NamedSharding(mesh, P()))(arcmat)
    arcmat = np.asarray(arcmat.addressable_data(0))
    meta = np.asarray(meta.addressable_data(0))
    counts_dev = np.asarray(counts_dev.addressable_data(0))

    # ---- exact arc insertion order: O(arcs) key exchange ----
    # Every process holds the replicated arc matrix; each computes the
    # mirrored-hit sort key (qid<<32|qs of the arc's side, global ids) for
    # the arcs whose source record lives in ITS byte range, and one
    # allgather of the (hi, lo) int32 pair (uint64 would be truncated
    # without x64) makes the per-arc keys global.  O(arcs), not O(hits).
    gids = arcmat[4]
    live = gids >= 0
    ag = gids[live].astype(np.int64)
    grec = ag >> 1
    aside = ag & 1
    mine = (grec >= g_off) & (grec < g_off + n_local)
    lrec = (grec[mine] - g_off).astype(np.int64)
    khi = np.zeros(ag.shape[0], np.int32)
    klo = np.zeros(ag.shape[0], np.int32)
    khi[mine] = np.where(aside[mine] == 1, cols[3][lrec], cols[0][lrec])
    klo[mine] = np.where(aside[mine] == 1, cols[4][lrec], cols[1][lrec])
    pair = np.stack([khi, klo])
    if procs > 1:
        pair = mhu.process_allgather(pair).sum(axis=0)
    keys = ((pair[0].astype(np.uint64) << np.uint64(32))
            | pair[1].astype(np.uint64))

    # double-collision test (identical on every process: arcmat and keys
    # are replicated): the stable by-hit-key order is exact unless some
    # graph key AND some hit key are both duplicated — see
    # pipeline._run_fast_v2's order step
    ul = ((arcmat[0][live].astype(np.uint64) << np.uint64(32))
          | arcmat[1][live].astype(np.uint64))
    su = np.sort(ul)
    need_full = bool(np.any(su[1:] == su[:-1])) if su.size > 1 else False
    if need_full and keys.size > 1:
        ks = np.sort(keys)
        need_full = bool(np.any(ks[1:] == ks[:-1]))
    all_keys = None
    if need_full:
        # rare fallback: the full radix permutation needs every record's
        # 16-byte key on one host (collective - all processes participate)
        sys.stderr.write("[W::multihost] duplicate graph AND hit keys; "
                         "falling back to the full exact-rank gather\n")
        key_cols = np.ascontiguousarray(cols[[0, 1, 3, 4]])
        pad_n = int(counts.max())
        kp = np.zeros((4, pad_n), np.int32)
        kp[:, :n_local] = key_cols
        all_keys = mhu.process_allgather(kp)  # (procs, 4, pad_n)

    if me != 0:
        return None
    (n_rem1, n_cut1, n_flt, n_rem2, n_cut2, m_cont, n_arc,
     dp_lo, dp_hi, len_lo, len_hi) = [int(x) for x in counts_dev[:11]]
    log("hit_sub", "%d query sequences remain after sub", n_rem1)
    log("hit_cut", "%d hits remain after cut", n_cut1)
    meta = meta[:, :n_seq]
    tot_dp = dp_lo + (dp_hi << 10)
    tot_len = len_lo + (len_hi << 10)
    cov = tot_dp / tot_len if tot_len else 0.0
    log("hit_flt", "%d hits remain after filtering; crude coverage after "
        "filtering: %.2f", n_flt, cov)
    sys.stderr.write("[M::main] ===> Step 3: 2-pass (fine) read selection "
                     "<===\n")
    log("hit_sub", "%d query sequences remain after sub", n_rem2)
    log("hit_cut", "%d hits remain after cut", n_cut2)

    arcs = {
        "u": arcmat[0][live].astype(np.int32),
        "l": arcmat[1][live].astype(np.int32),
        "v": arcmat[2][live].astype(np.int32),
        "ol": arcmat[3][live].astype(np.int32),
    }
    if need_full:
        gcols = np.concatenate(
            [all_keys[p][:, :int(counts[p])] for p in range(procs)], axis=1)
        # _mirror_ranks reads rows [0]=qid [1]=qs [3]=tid [4]=ts; row 2
        # is unused
        rank = _mirror_ranks(
            np.vstack([gcols[0], gcols[1], gcols[1], gcols[2], gcols[3]]), d)
        order = np.argsort(rank[ag], kind="stable")
    else:
        order = np.argsort(keys, kind="stable")
    arcs = {k: v[order] for k, v in arcs.items()}

    g, sub_s, sub_e, sub_del = graph_from_arcs(
        d, meta[0].astype(np.uint32), meta[1].astype(np.uint32),
        meta[2].astype(bool), meta[3].astype(bool), meta[4].astype(bool),
        meta[5].astype(bool), arcs, m_hits=m_cont)
    with open(out_fn, "w") as out:
        _emit(paf_fn, opt, "ug", None, 100, out, d, None,
              sub_s, sub_e, sub_del, prebuilt=g)
    return None


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="multi-process miniasm_tpu worker (jax.distributed)")
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-procs", type=int, required=True)
    ap.add_argument("--proc-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("paf")
    a = ap.parse_args(argv)
    worker(a.paf, a.out, coordinator=a.coordinator, num_procs=a.num_procs,
           proc_id=a.proc_id)


if __name__ == "__main__":
    main()
