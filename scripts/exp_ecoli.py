"""E. coli-scale dispatch-cost attribution: repeated select kernel calls
on a RESIDENT colmat + detect timing, to separate fixed dispatch/RTT cost
from device time at small scale."""

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
    "/tmp/miniasm_tpu_bench/bench_4600000_40.paf"


def main():
    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.native.pafload import load_hits_mt
    from miniasm_tpu.select.fused2 import select_build2
    from miniasm_tpu.utils import timers

    t0 = time.time()
    _ = jax.device_get(jax.device_put(np.zeros(8, np.int32)))
    print(f"first_fetch_s {time.time() - t0:.3f}", flush=True)

    opt = Opt()
    t0 = time.time()
    colmat, d, h3 = load_hits_mt(PAF, opt.min_span, opt.min_match,
                                 bi_dir=True, min_iden=float(opt.min_iden))
    _ = jax.device_get(jnp.sum(colmat[0, :8]))
    print(f"load+resident {time.time() - t0:.3f} cap={colmat.shape}",
          flush=True)

    for rep in range(5):
        timers.EXTRA.clear()
        t0 = time.time()
        arcs, md, counts = select_build2(colmat, d, opt, bi_dir=True,
                                         max_len=h3.max_len)
        print(f"select rep{rep} total={time.time() - t0:.3f} "
              f"kernel={timers.EXTRA.get('select.kernel_s')} "
              f"fetch={timers.EXTRA.get('select.fetch_s')} "
              f"n_arc={len(arcs['u'])}", flush=True)

    # bare RTT: tiny jit + fetch
    f = jax.jit(lambda x: x + 1)
    small = jax.device_put(np.zeros(8, np.int32))
    _ = jax.device_get(f(small))
    for rep in range(3):
        t0 = time.time()
        _ = jax.device_get(f(small))
        print(f"tiny_rtt {time.time() - t0:.4f}", flush=True)

    h3.free()


if __name__ == "__main__":
    main()
