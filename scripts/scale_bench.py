"""200 Mb-scale evidence artifact (VERDICT r4 weak #5): driver-style
capture of the double-headline-scale run — wall, stage breakdown,
capacity retries, duplicate-key/rank-fallback behavior, byte-identity
vs the reference binary, and a determinism double-run — as one JSON.

Usage: python scripts/scale_bench.py [--out SCALE_r05.json]
       BENCH_SCALE=200000000 BENCH_COV=40 override the config.
"""

import hashlib
import json
import os
import subprocess
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def sha(fn):
    h = hashlib.sha256()
    with open(fn, "rb") as f:
        while True:
            b = f.read(1 << 22)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_reference, prepare_data  # reuse bench helpers

    out_fn = None
    if "--out" in sys.argv:
        out_fn = sys.argv[sys.argv.index("--out") + 1]
    genome_len = int(os.environ.get("BENCH_SCALE", 200_000_000))
    coverage = float(os.environ.get("BENCH_COV", 40))

    t0 = time.time()
    _ = jax.device_get(jax.device_put(np.zeros(8, np.int32)))
    first_fetch = round(time.time() - t0, 3)

    paf, _fa = prepare_data(genome_len, coverage)
    exe = build_reference()

    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt
    from miniasm_tpu.utils import timers

    def ours(out_path):
        t0 = time.time()
        with open(out_path, "w") as out:
            pipeline.run(paf, Opt(), outfmt="ug", out=out)
        return round(time.time() - t0, 3), dict(pipeline.LAST_TIMING), \
            dict(timers.EXTRA)

    # warm (compile/caches) then two timed runs for determinism
    cold_s, _, _ = ours("/tmp/scale_warm.gfa")
    wall1, ticks, extra1 = ours("/tmp/scale_run1.gfa")
    wall2, _, extra2 = ours("/tmp/scale_run2.gfa")

    stages = {}
    prev = 0.0
    for k, v in ticks.items():
        stages[k] = round(v - prev, 3)
        prev = v

    t0 = time.time()
    with open("/tmp/scale_ref.gfa", "w") as out:
        subprocess.run([exe, paf], stdout=out, stderr=subprocess.DEVNULL,
                       check=True)
    ref_s = round(time.time() - t0, 3)

    h1, h2, hr = sha("/tmp/scale_run1.gfa"), sha("/tmp/scale_run2.gfa"), \
        sha("/tmp/scale_ref.gfa")

    from bench import count_overlaps

    n_ovlp = count_overlaps(paf)
    value = min(wall1, wall2)
    rec = {
        "metric": "paf_to_gfa_wall_200Mb",
        "genome_len": genome_len, "coverage": coverage,
        "overlaps": n_ovlp,
        "value": value, "runs": [wall1, wall2], "cold_s": cold_s,
        "ref_s": ref_s,
        "vs_baseline": round(ref_s / value, 3) if value else 0,
        "overlaps_per_s": round(n_ovlp / value) if value else 0,
        "stages": stages,
        "substages": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in extra1.items()},
        "capacity_retries": int(extra1.get("select.retries", 0)),
        "rank_fallback_run1": bool(extra1.get("rank.fallback", 0)),
        "rank_fallback_run2": bool(extra2.get("rank.fallback", 0)),
        "deterministic": h1 == h2,
        "ref_identical": h1 == hr,
        "sha256": {"ours": h1, "ref": hr},
        "tunnel_first_fetch_s": first_fetch,
    }
    print(json.dumps(rec))
    if out_fn:
        with open(out_fn, "w") as f:
            json.dump(rec, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
