"""A/B the H2D piece format at 100 Mb scale in ONE tunnel session:
FMT4 (16 B/record) vs FMT3 (13 B/record + device decode), interleaved
A/B/A/B so tunnel drift cancels.  Reports per-run wall + stage ticks."""

import os
import sys
import time

import numpy as np  # noqa: F401

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAF = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/miniasm_tpu_bench/bench_100000000_40.paf"


def run_once(fmt3: bool):
    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt
    from miniasm_tpu.utils import timers

    if fmt3:
        os.environ.pop("MINIASM_TPU_FMT3", None)
    else:
        os.environ["MINIASM_TPU_FMT3"] = "0"
    t0 = time.time()
    with open(os.devnull, "w") as devnull:
        pipeline.run(PAF, Opt(), outfmt="ug", out=devnull)
    wall = time.time() - t0
    return wall, dict(pipeline.LAST_TIMING), dict(timers.EXTRA)


def main():
    t0 = time.time()
    probe = jax.device_put(np.zeros(8, np.int32))
    _ = jax.device_get(probe)
    print(f"first_fetch_s {time.time() - t0:.3f}", flush=True)

    for rep in range(3):
        for fmt3 in (False, True):
            wall, ticks, extra = run_once(fmt3)
            stages = {}
            prev = 0.0
            for k, v in ticks.items():
                stages[k] = round(v - prev, 3)
                prev = v
            print(f"fmt3={int(fmt3)} wall={wall:.3f} {stages} "
                  f"kernel={extra.get('select.kernel_s')} "
                  f"fetch={extra.get('select.fetch_s')}", flush=True)


if __name__ == "__main__":
    import numpy as np  # noqa: F811

    main()
