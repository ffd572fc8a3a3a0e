"""Multi-device scaling harness: overlaps/s at 1..N shards.

BASELINE.md's multi-host target is >=70% overlaps/s efficiency at 2 hosts.
Real ICI cannot be exercised in this environment (one physical chip), so
this harness measures the end-to-end sharded selection step — mirror
all_to_all, owner-masked psum combines, per-shard sweeps — on a virtual
device mesh, which prices the collective/compile overhead of the sharding
design; run it unchanged on a real v5e slice for the true number.

Usage: python -m miniasm_tpu.eval.scaling [n_devices ...]
Prints one JSON line: {"overlaps_per_s": {n: rate}, "efficiency": {n: e}}.
"""

from __future__ import annotations

import json
import sys
import time


def measure(paf_fn: str, n_devices_list, *, repeats: int = 3) -> dict:
    import io

    from ..config import Opt
    from ..parallel.full import run_sharded
    from ..parallel.mesh import make_mesh
    from ..pipeline import run as run_single

    opt = Opt()

    def one(n, sharded1=False):
        buf = io.StringIO()
        t0 = time.time()
        if n == 1 and not sharded1:
            run_single(paf_fn, opt, outfmt="ug", out=buf)
        else:
            run_sharded(paf_fn, opt, make_mesh(n), outfmt="ug", out=buf)
        return time.time() - t0

    # warm-compile every config first, then INTERLEAVE the timed rounds
    # (1, 1s, 2, .., N, 1, 1s, 2, .., N, ...): VM noise and tunnel drift
    # hit all configs of a round equally, so the per-round PAIRED ratio
    # wall_1/wall_n is far tighter than comparing block medians.  "1s" is
    # the SHARDED program on one device: sharded@N vs sharded@1 isolates
    # the collective/padding overhead (the real-ICI question) from the
    # structure cost of the sharded program vs the fused single-device
    # kernel (which a future round can close by porting the fused
    # 4-lane event design into the sharded step).
    configs = [(n, False) for n in n_devices_list]
    if 1 in n_devices_list:
        configs.insert(1, (1, True))
    for cfg in configs:
        one(*cfg)
    walls: dict = {cfg: [] for cfg in configs}
    for _ in range(repeats):
        for cfg in configs:
            walls[cfg].append(one(*cfg))
    walls1s = walls.pop((1, True), None)
    walls = {n: ws for (n, s1), ws in walls.items()}

    # overlaps processed = mirrored hit count (the reference's unit)
    from ..io.paf import load_paf

    load = load_paf(paf_fn, opt.min_span, opt.min_match)
    import numpy as np

    n_mirror = len(load.qid) + int(np.sum(load.qid != load.tid))
    rates = {n: n_mirror / min(ws) for n, ws in walls.items()}
    base = rates.get(1)
    # raw efficiency r/(base*n) is structurally bounded by 1/n on a
    # TIME-SLICED virtual mesh (all shards share the same cores), so the
    # meaningful statistic here is the TOTAL-WORK ratio single/sharded:
    # on n real hosts each shard runs on its own silicon, so projected
    # wall ~= sharded_wall/n and projected efficiency ~= base_rate /
    # sharded_rate ... inverted: single_wall / sharded_wall.
    eff = {n: (r / (base * n) if base else 0.0) for n, r in rates.items()}
    proj = {n: (r / base if base else 0.0) for n, r in rates.items()}
    paired = {}
    if 1 in walls:
        for n, ws in walls.items():
            rs = [w1 / wn for w1, wn in zip(walls[1], ws)]
            paired[str(n)] = {
                "per_round": [round(x, 3) for x in rs],
                "median": round(sorted(rs)[len(rs) // 2], 3),
                "min": round(min(rs), 3), "max": round(max(rs), 3)}
    self_eff = {}
    structure_cost = None
    if walls1s is not None:
        # sharded-program self efficiency: wall(sharded@1)/wall(sharded@n)
        # — prices ONLY the collectives + exchange padding added by n>1
        for n, ws in walls.items():
            if n == 1:
                continue
            rs = [w1 / wn for w1, wn in zip(walls1s, ws)]
            self_eff[str(n)] = {
                "per_round": [round(x, 3) for x in rs],
                "median": round(sorted(rs)[len(rs) // 2], 3),
                "min": round(min(rs), 3), "max": round(max(rs), 3)}
        if 1 in walls:
            structure_cost = round(
                sorted(w1s / w1 for w1s, w1 in zip(walls1s, walls[1]))
                [len(walls1s) // 2], 3)
    return {"overlaps": n_mirror,
            "sharded_self_efficiency": self_eff,
            "sharded_structure_cost_vs_fused_single": structure_cost,
            "overlaps_per_s": {str(n): round(r) for n, r in rates.items()},
            "efficiency_timesliced": {str(n): round(e, 3)
                                      for n, e in eff.items()},
            "projected_efficiency": {str(n): round(e, 3)
                                     for n, e in proj.items()},
            "paired_projected_efficiency": paired,
            "note": "virtual CPU mesh: shards time-slice the same cores. "
                    "sharded_self_efficiency (sharded@1 / sharded@N total "
                    "work) prices ONLY the collectives+exchange padding "
                    "the mesh adds — the real-ICI 2-host question; "
                    "projected_efficiency divides by the FUSED single-"
                    "device kernel, which r5 made ~3x faster than the "
                    "sharded program structure (structure_cost field), so "
                    "that ratio now mostly measures the un-ported fused "
                    "optimizations, not scaling.  paired_* uses "
                    "interleaved rounds so VM/tunnel drift cancels; "
                    "real-ICI numbers require running this harness "
                    "unchanged on an actual multi-chip slice."}


def main(argv):
    import os

    # the virtual mesh needs the CPU platform regardless of the ambient
    # JAX_PLATFORMS (this box force-pins a 1-chip TPU plugin there);
    # MINIASM_TPU_PLATFORM remains the explicit override
    os.environ["JAX_PLATFORMS"] = (os.environ.get("MINIASM_TPU_PLATFORM")
                                   or "cpu")
    ns = [int(a) for a in argv[1:]] or [1, 2, 4, 8]
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags +
                                   " --xla_force_host_platform_device_count=%d"
                                   % max(ns)).strip()
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    paf = os.environ.get("SCALING_PAF")
    tmp = None
    try:
        if not paf:
            import tempfile

            from .simulate import simulate, write_paf

            sim = simulate(genome_len=1_000_000, coverage=30.0, seed=11)
            fd, tmp = tempfile.mkstemp(suffix=".paf")
            os.close(fd)
            paf = tmp
            write_paf(sim, paf)
        print(json.dumps(measure(paf, ns)))
    finally:
        if tmp:
            os.unlink(tmp)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
