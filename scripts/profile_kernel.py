"""Device-time attribution for the hot kernels (select + detect).

Usage:
  python scripts/profile_kernel.py <in.paf> [--detect]

Loads the PAF through the production loader, runs the fused select
kernel warm, captures a jax.profiler trace, and prints the top device
ops with durations — the tool used to find and kill the forward-fill
gathers (1.25 s each), the searchsorted while-loops (~0.21 s each), and
the payload-carrying compaction sorts.  With --detect it also profiles
the graph-cleaning detection kernel on the post-select graph.

Honors the persistent XLA cache (MINIASM_TPU_CACHE, default
/tmp/jaxcache) so repeat invocations skip the tunnel compile.
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MINIASM_TPU_CACHE", "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def print_trace(trace_dir, label):
    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*")))
    if not runs:
        print("no trace captured")
        return
    f = glob.glob(runs[-1] + "/*.trace.json.gz")[0]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    byname = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            byname[e.get("name", "")] += e.get("dur", 0) / 1e6
    print(f"--- {label}: top device ops ---")
    for n, d in sorted(byname.items(), key=lambda kv: -kv[1])[:18]:
        if d > 0.005:
            print(f"{d:8.3f}s  {n[:76]}")


def main():
    paf = sys.argv[1]
    do_detect = "--detect" in sys.argv

    import numpy as np

    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.native.pafload import load_hits_mt
    from miniasm_tpu.select.fused2 import select_build2
    from miniasm_tpu.utils import timers

    opt = Opt()
    t0 = time.time()
    colmat_dev, d, h3 = load_hits_mt(paf, opt.min_span, opt.min_match,
                                     bi_dir=True,
                                     min_iden=float(opt.min_iden))
    jax.block_until_ready(colmat_dev)
    print(f"load+upload {time.time() - t0:.3f}s  n_orig={h3.n_orig} "
          f"cap={h3.cap} n_seq={d.n_seq}")

    # warm (compiles on first contact with this shape bucket)
    timers.EXTRA.clear()
    arcs, md, counts = select_build2(colmat_dev, d, opt, bi_dir=True,
                                     max_len=h3.max_len)
    print("warm1", dict(timers.EXTRA))
    timers.EXTRA.clear()
    t0 = time.time()
    arcs, md, counts = select_build2(colmat_dev, d, opt, bi_dir=True,
                                     max_len=h3.max_len)
    print(f"warm2 {time.time() - t0:.3f}s", dict(timers.EXTRA))

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            select_build2(colmat_dev, d, opt, bi_dir=True,
                          max_len=h3.max_len)
        print_trace(td, "select kernel")

    if do_detect:
        from miniasm_tpu.graph import devclean
        from miniasm_tpu.graph.asg import graph_from_arcs

        # arcs arrive pre-ordered from the device (select_build2 no
        # longer fetches idx on the big-config path)
        arcs = {k: arcs[k] for k in ("u", "l", "v", "ol")}
        g, *_ = graph_from_arcs(d, md["sub_s"], md["sub_e"], md["sub_del"],
                                md["cont"], md["used"], md["pal"], arcs,
                                m_hits=counts[5])
        timers.EXTRA.clear()
        devclean.detect(g, opt, do_trans=True)
        print("detect warm1", dict(timers.EXTRA))
        timers.EXTRA.clear()
        devclean.detect(g, opt, do_trans=True)
        print("detect warm2", dict(timers.EXTRA))
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                devclean.detect(g, opt, do_trans=True)
            print_trace(td, "detect kernel")
    h3.free()


if __name__ == "__main__":
    main()
