#!/usr/bin/env python
"""Benchmark: PAF -> unitig-GFA wall-clock vs the reference miniasm binary.

Generates a synthetic E. coli-like dataset (4.6 Mb genome at the requested
coverage — the environment has no network access to the public PacBio
demo data, so this mirrors its shape), runs the reference C binary and our
pipeline on the same PAF, and prints ONE JSON line:

  {"metric": "paf_to_gfa_wall", "value": <our seconds>, "unit": "s",
   "vs_baseline": <ref_seconds / our_seconds>}

vs_baseline > 1 means faster than the reference on this host's CPUs.
"""

import json
import os
import shutil
import subprocess
import sys
import time

import jax

# persistent XLA compile cache: amortizes the one big kernel compile across
# bench invocations (the TPU remote compile of the fused select kernel is
# minutes; steady-state runs are seconds)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

BENCH_DIR = "/tmp/miniasm_tpu_bench"
REF_SRC = "/root/reference"
REF_BUILD = "/tmp/miniasm_ref_build"


def build_reference():
    exe = os.path.join(REF_BUILD, "miniasm")
    if os.path.exists(exe):
        return exe
    os.makedirs(REF_BUILD, exist_ok=True)
    for f in os.listdir(REF_SRC):
        if f.endswith((".c", ".h")) or f == "Makefile":
            shutil.copy(os.path.join(REF_SRC, f), REF_BUILD)
    r = subprocess.run(["make", "-j4"], cwd=REF_BUILD, capture_output=True)
    if r.returncode != 0:
        return None
    return exe


def prepare_data(genome_len, coverage, seed=11, with_fasta=False):
    os.makedirs(BENCH_DIR, exist_ok=True)
    paf = os.path.join(BENCH_DIR, "bench_%d_%d.paf" % (genome_len, int(coverage)))
    fa = os.path.join(BENCH_DIR, "bench_%d_%d.fa" % (genome_len, int(coverage)))
    if not os.path.exists(paf) or (with_fasta and not os.path.exists(fa)):
        from miniasm_tpu.eval.simulate import (simulate, write_paf,
                                               write_fasta)

        sim = simulate(genome_len=genome_len, coverage=coverage,
                       mean_read=9000, sd_read=2500, seed=seed)
        if not os.path.exists(paf):
            write_paf(sim, paf)
        if with_fasta and not os.path.exists(fa):
            write_fasta(sim, fa)
    return paf, (fa if with_fasta else None)


def run_ours(paf, fn_reads=None):
    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt
    from miniasm_tpu.utils import timers

    t0 = time.time()
    with open(os.devnull, "w") as devnull:
        pipeline.run(paf, Opt(), outfmt="ug", out=devnull,
                     fn_reads=fn_reads)
    return time.time() - t0, dict(pipeline.LAST_TIMING), dict(timers.EXTRA)


def run_ref(exe, paf, fn_reads=None):
    t0 = time.time()
    args = [exe] + (["-f", fn_reads] if fn_reads else []) + [paf]
    with open(os.devnull, "wb") as devnull:
        subprocess.run(args, stdout=devnull,
                       stderr=subprocess.DEVNULL, check=True)
    return time.time() - t0


def count_overlaps(paf, min_span=2000, min_match=100):
    """Mirrored-hit count after the read filters = the reference's unit of
    work (span/match gates at hit.c:80-92, mirror at hit.c:92-98)."""
    try:
        from miniasm_tpu.io.native import available
        from miniasm_tpu.io.native.pafload import load_hits_mt

        if available():
            _, _, h = load_hits_mt(paf, min_span, min_match, upload=False)
            n = h.n_mirror
            h.free()
            return n
    except ImportError:
        pass
    n = 0
    with open(paf) as f:
        for line in f:
            t = line.split("\t", 10)
            if (int(t[3]) - int(t[2]) < min_span
                    or int(t[8]) - int(t[7]) < min_span
                    or int(t[9]) < min_match):
                continue
            n += 1 if t[0] == t[5] else 2
    return n


def bench_config(genome_len, coverage, exe, *, ours_reps=3, ref_reps=2,
                 with_seq=False):
    # ours_reps=3: the tunnel-attached TPU's throughput varies between
    # sessions (measured 2-4x swings on identical cached executables);
    # min-of-3 warm runs is cheap insurance against a slow period
    paf, fa = prepare_data(genome_len, coverage, with_fasta=with_seq)
    cold, _, _ = run_ours(paf)
    runs = [run_ours(paf) for _ in range(ours_reps)]
    ours = min(t for t, _, _ in runs)
    best = min(runs, key=lambda r: r[0])
    stages_cum = best[1]
    substages = best[2]
    # cumulative ticks -> per-stage durations
    stages = {}
    prev = 0.0
    for name, t in stages_cum.items():
        stages[name] = round(t - prev, 3)
        prev = t
    if exe:
        ref = min(run_ref(exe, paf) for _ in range(ref_reps))
        vs = ref / ours if ours > 0 else 0.0
    else:
        ref, vs = 0.0, 0.0
    n_ovlp = count_overlaps(paf)
    import resource

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    out = {"value": round(ours, 3), "vs_baseline": round(vs, 3),
           "overlaps": n_ovlp,
           "overlaps_per_s": round(n_ovlp / ours) if ours else 0,
           "ref_s": round(ref, 3), "cold_s": round(cold, 3),
           "host_peak_rss_mb": rss_mb,
           "stages": stages, "substages": substages,
           "genome_len": genome_len, "coverage": coverage}
    if fa:
        # -f variant: one run with sequence splicing (native FASTX
        # streaming splicer, asm.c:236-290 equivalent); `seq` is the
        # splice stage's own wall inside the run.  Prime the page cache
        # first: whichever binary reads the multi-GB FASTA first would
        # otherwise eat the disk cold-read (~13 s at 4 GB) alone.
        with open(fa, "rb") as f:
            while f.read(1 << 24):
                pass
        t_f, ticks, _ = run_ours(paf, fn_reads=fa)
        seq_s = None
        if "seq" in ticks and "unitig" in ticks:
            seq_s = round(ticks["seq"] - ticks["unitig"], 3)
        ref_f = run_ref(exe, paf, fn_reads=fa) if exe else 0.0
        out["with_seq"] = {"value": round(t_f, 3), "seq_stage_s": seq_s,
                          "ref_s": round(ref_f, 3),
                          "vs_baseline": round(ref_f / t_f, 3) if t_f else 0}
    return out


def main():
    # headline config: synthetic C. elegans-scale (100 Mb at 40x, >20M
    # mirrored overlaps — the reference's own headline regime,
    # tex/miniasm.tex:762-763); the E. coli-scale config rides along for
    # round-over-round comparability.  The remote XLA compile of the big
    # shape is minutes and occasionally pathological, so the big config
    # runs under an alarm: on expiry the E. coli numbers become the
    # primary line rather than losing the whole bench.
    import signal

    genome_len = int(os.environ.get("BENCH_GENOME", 100_000_000))
    coverage = float(os.environ.get("BENCH_COV", 40))
    exe = build_reference()

    # Tunnel characterization (recorded with every bench so round-over-
    # round deltas can be attributed): the FIRST device fetch of a process
    # pays a size-independent reconnect penalty measured at 60-300 s when
    # the tunnel has been idle; paying it here keeps it out of cold_s.
    import numpy as _np

    t0 = time.time()
    probe = jax.device_put(_np.zeros(8, _np.int32))
    probe.block_until_ready()
    _ = jax.device_get(probe)
    first_fetch_s = round(time.time() - t0, 3)
    big = jax.device_put(_np.zeros(1 << 22, _np.int32))
    big.block_until_ready()
    t0 = time.time()
    _ = jax.device_get(jax.jit(lambda x: x + 1)(big))
    d2h_mbs = round(16 / (time.time() - t0), 1)
    t0 = time.time()
    jax.device_put(_np.ones(1 << 22, _np.int32)).block_until_ready()
    h2d_mbs = round(16 / (time.time() - t0), 1)
    tunnel = {"first_fetch_s": first_fetch_s, "d2h_mb_s": d2h_mbs,
              "h2d_mb_s": h2d_mbs}
    small = bench_config(4_600_000, 40.0, exe)

    class _Timeout(Exception):
        pass

    def _alarm(sig, frm):
        raise _Timeout()

    big = None
    budget = int(os.environ.get("BENCH_BIG_TIMEOUT", 2700))
    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    try:
        big = bench_config(genome_len, coverage, exe, with_seq=True)
    except _Timeout:
        big = None
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)

    out = {"metric": "paf_to_gfa_wall", "unit": "s",
           "host_cpus": os.cpu_count(), "tunnel": tunnel}
    if big is not None:
        out.update(big)
        out["ecoli"] = {k: small[k] for k in
                        ("value", "vs_baseline", "ref_s", "overlaps",
                         "overlaps_per_s", "cold_s", "stages", "substages")}
    else:
        out.update(small)
        out["big_config_timed_out_s"] = budget
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
