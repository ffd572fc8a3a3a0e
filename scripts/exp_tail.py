"""Measure the H2D tail: time from loader return (last put ENQUEUED) to
colmat actually resident, plus the select kernel's true device window.
Tells whether per-piece compute preludes would overlap anything real."""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAF = sys.argv[1] if len(sys.argv) > 1 else \
    "/tmp/miniasm_tpu_bench/bench_100000000_40.paf"


def main():
    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.native.pafload import load_hits_mt
    from miniasm_tpu.select.fused2 import select_build2
    from miniasm_tpu.utils import timers

    t0 = time.time()
    probe = jax.device_put(np.zeros(8, np.int32))
    _ = jax.device_get(probe)
    print(f"first_fetch_s {time.time() - t0:.3f}", flush=True)

    opt = Opt()
    for rep in range(3):
        t0 = time.time()
        colmat, d, h3 = load_hits_mt(PAF, opt.min_span, opt.min_match,
                                     bi_dir=True,
                                     min_iden=float(opt.min_iden))
        t_load = time.time() - t0
        t1 = time.time()
        # force residency via a dependent tiny fetch
        _ = jax.device_get(jnp.sum(colmat[0, :8]))
        t_tail = time.time() - t1
        t1 = time.time()
        timers.EXTRA.clear()
        arcs, md, counts = select_build2(colmat, d, opt, bi_dir=True,
                                         max_len=h3.max_len)
        t_select = time.time() - t1
        h3.free()
        print(f"rep{rep} load_return={t_load:.3f} upload_tail={t_tail:.3f} "
              f"select={t_select:.3f} kernel={timers.EXTRA.get('select.kernel_s')} "
              f"fetch={timers.EXTRA.get('select.fetch_s')}", flush=True)


if __name__ == "__main__":
    main()
