"""Measure whether the TPU backend overlaps H2D transfers with dispatched
device compute (design probe for pipelining the loader with the select
kernel).  Prints timings for serial vs interleaved patterns.

Usage: python scripts/exp_overlap.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def sync_val(x):
    """Force completion via a dependent tiny fetch (block_until_ready is
    unreliable on this backend)."""
    return jax.device_get(jnp.sum(x[..., :1]))


def main():
    t0 = time.time()
    probe = jax.device_put(np.zeros(8, np.int32))
    _ = jax.device_get(probe)
    print(f"first_fetch_s {time.time() - t0:.3f}", flush=True)

    rng = np.random.default_rng(0)
    # compute workload: a big 2-key sort, ~0.5-1 s device time
    N = 1 << 25  # 32M
    xs = rng.integers(0, 1 << 30, size=N, dtype=np.int32)
    ys = rng.integers(0, 1 << 30, size=N, dtype=np.int32)
    xd = jax.device_put(xs)
    yd = jax.device_put(ys)

    @jax.jit
    def work(a, b):
        s, t = jax.lax.sort([a, b], num_keys=2)
        return jnp.sum(s[:8] + t[:8])

    _ = jax.device_get(work(xd, yd))  # compile + warm
    t0 = time.time()
    r = work(xd, yd)
    _ = jax.device_get(r)
    t_comp = time.time() - t0
    print(f"compute_s {t_comp:.3f}", flush=True)

    # upload workload: 8 pieces of 16 MB (mimics the loader's piece stream)
    pieces = [rng.integers(0, 1 << 30, size=(4, 1 << 20), dtype=np.int32)
              for _ in range(8)]
    up_bytes = sum(p.nbytes for p in pieces)
    t0 = time.time()
    devs = [jax.device_put(p) for p in pieces]
    for dv in devs:
        dv.block_until_ready()
    _ = sync_val(devs[-1])
    t_up = time.time() - t0
    print(f"upload_s {t_up:.3f}  ({up_bytes / 2**20:.0f} MiB, "
          f"{up_bytes / 2**20 / t_up:.1f} MiB/s)", flush=True)

    del devs

    # overlapped: dispatch compute FIRST, then stream the uploads
    for trial in range(3):
        t0 = time.time()
        r = work(xd, yd)
        devs = [jax.device_put(p) for p in pieces]
        for dv in devs:
            dv.block_until_ready()
        _ = sync_val(devs[-1])
        _ = jax.device_get(r)
        t_both = time.time() - t0
        print(f"overlap_compute_then_upload_s {t_both:.3f} "
              f"(serial would be {t_comp + t_up:.3f}, "
              f"max {max(t_comp, t_up):.3f})", flush=True)
        del devs

    # overlapped: uploads first, compute dispatched between pieces
    for trial in range(3):
        t0 = time.time()
        devs = [jax.device_put(p) for p in pieces[:4]]
        r = work(xd, yd)
        devs += [jax.device_put(p) for p in pieces[4:]]
        for dv in devs:
            dv.block_until_ready()
        _ = sync_val(devs[-1])
        _ = jax.device_get(r)
        t_both = time.time() - t0
        print(f"overlap_interleaved_s {t_both:.3f}", flush=True)
        del devs

    # per-piece compute chained onto each uploaded piece (the candidate
    # pipelined-select structure): upload piece -> dispatch small sort on it
    @jax.jit
    def piece_work(p):
        s = jax.lax.sort([p.reshape(-1)], num_keys=1)[0]
        return s

    ws = [piece_work(jax.device_put(p)) for p in pieces]
    _ = sync_val(ws[-1])  # warm compile
    del ws
    t0 = time.time()
    outs = []
    for p in pieces:
        outs.append(piece_work(jax.device_put(p)))
    for o in outs:
        _ = sync_val(o)
    t_chain = time.time() - t0
    print(f"piecewise_upload_plus_sort_s {t_chain:.3f} "
          f"(upload alone {t_up:.3f})", flush=True)

    # D2H while compute runs: dispatch work, then fetch a big resident array
    big = jax.device_put(rng.integers(0, 1 << 30, size=1 << 22,
                                      dtype=np.int32))
    _ = sync_val(big)
    t0 = time.time()
    _ = jax.device_get(big)
    t_d2h = time.time() - t0
    print(f"d2h_16MiB_s {t_d2h:.3f} ({16 / t_d2h:.1f} MiB/s)", flush=True)
    t0 = time.time()
    r = work(xd, yd)
    _ = jax.device_get(big)
    _ = jax.device_get(r)
    t_both = time.time() - t0
    print(f"overlap_compute_then_d2h_s {t_both:.3f} "
          f"(serial {t_comp + t_d2h:.3f})", flush=True)


if __name__ == "__main__":
    main()
