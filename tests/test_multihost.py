"""Multi-PROCESS (jax.distributed) pipeline: 2 CPU processes, per-process
PAF byte-range reading, device repartition + the sharded select step over
the global mesh — output must be byte-identical to the single-process
pipeline (SURVEY §4.iv; BASELINE north star)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_multihost(paf, out_base, n_procs, dev_per_proc=2):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                        % dev_per_proc)
    env["PYTHONPATH"] = REPO
    procs = []
    outs = []
    for k in range(n_procs):
        out = "%s.p%d.gfa" % (out_base, k)
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "miniasm_tpu.parallel.multihost",
             "--coordinator", "127.0.0.1:%d" % port,
             "--num-procs", str(n_procs), "--proc-id", str(k),
             "--out", out, paf],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err.decode(errors="replace"))
        assert p.returncode == 0, "worker failed:\n%s" % errs[-1]
    return outs[0]


@pytest.mark.parametrize("n_procs", [2, 4])
def test_multihost_byte_parity(tmp_path, n_procs):
    from miniasm_tpu.eval.simulate import simulate, write_paf

    sim = simulate(genome_len=150_000, coverage=18.0, seed=23)
    paf = str(tmp_path / "mh.paf")
    write_paf(sim, paf)

    # single-process golden
    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt

    golden = tmp_path / "single.gfa"
    with open(golden, "w") as out:
        pipeline.run(paf, Opt(), outfmt="ug", out=out)

    got = _run_multihost(paf, str(tmp_path / "mh"), n_procs)
    assert open(got, "rb").read() == open(golden, "rb").read()


def test_multihost_gz_input(tmp_path):
    """Gzipped PAF across 2 processes: each worker spools the gz locally
    and range-reads the spool, so parallelism survives compression
    (reference reads .paf.gz natively everywhere, paf.c:9-20)."""
    import gzip
    import shutil

    from miniasm_tpu.eval.simulate import simulate, write_paf

    sim = simulate(genome_len=150_000, coverage=18.0, seed=23)
    paf = str(tmp_path / "mh.paf")
    write_paf(sim, paf)
    gz = str(tmp_path / "mh.paf.gz")
    with open(paf, "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)

    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt

    golden = tmp_path / "single.gfa"
    with open(golden, "w") as out:
        pipeline.run(paf, Opt(), outfmt="ug", out=out)

    got = _run_multihost(gz, str(tmp_path / "mhgz"), 2)
    assert open(got, "rb").read() == open(golden, "rb").read()


@pytest.fixture(scope="module")
def cleaning_scale_paf(tmp_path_factory):
    """5 Mb / 12x with 50% dropout — the fixture where every
    order-dependent cleaning pass fires (tips, bubbles, asymmetric arcs,
    short drops); the multihost rung must hold byte parity under real
    cleaning load, not just plumbing (VERDICT r4 weak #6)."""
    import random

    from miniasm_tpu.eval.simulate import simulate, write_paf

    td = tmp_path_factory.mktemp("mh5m")
    sim = simulate(genome_len=5_000_000, coverage=12.0, seed=5)
    paf = str(td / "mh5m.paf")
    write_paf(sim, paf)
    rng = random.Random(3)
    with open(paf) as f:
        kept = [ln for ln in f if rng.random() > 0.5]
    with open(paf, "w") as f:
        f.writelines(kept)

    from miniasm_tpu import pipeline
    from miniasm_tpu.config import Opt

    golden = str(td / "single.gfa")
    with open(golden, "w") as out:
        pipeline.run(paf, Opt(), outfmt="ug", out=out)
    return paf, golden


@pytest.mark.parametrize("n_procs", [2, 3])
def test_multihost_cleaning_scale_parity(tmp_path, cleaning_scale_paf,
                                         n_procs):
    paf, golden = cleaning_scale_paf
    got = _run_multihost(paf, str(tmp_path / "mh5m"), n_procs)
    assert open(got, "rb").read() == open(golden, "rb").read()


def test_split_ranges_cover_and_snap(tmp_path):
    from miniasm_tpu.parallel.multihost import split_ranges, extract_range

    paf = str(tmp_path / "r.paf")
    lines = [("q%d\t100\t%d\t90\t+\tt%d\t100\t5\t95\t50\t90\n"
              % (i, i % 7, i % 13)).encode() for i in range(997)]
    with open(paf, "wb") as f:
        f.writelines(lines)
    rngs = split_ranges(paf, 3)
    assert rngs[0][0] == 0
    assert rngs[-1][1] == os.path.getsize(paf)
    stitched = b""
    for k, (off, end) in enumerate(rngs):
        part = str(tmp_path / ("part%d" % k))
        extract_range(paf, off, end, part)
        data = open(part, "rb").read()
        if off > 0:
            # synthetic carry line, if present, must be filtered out by the
            # span filter (0-length intervals) and only seed the bl carry
            first, rest = data.split(b"\n", 1)
            if first.startswith(b"*\t"):
                data = rest
        stitched += data
    assert stitched == b"".join(lines)


def test_carry_seed_reads_previous_bl(tmp_path):
    from miniasm_tpu.parallel.multihost import _carry_seed

    paf = str(tmp_path / "c.paf")
    with open(paf, "wb") as f:
        f.write(b"a\t100\t0\t90\t+\tb\t100\t0\t90\t50\t777\n")
        f.write(b"c\t100\t0\t90\t+\td\t100\t0\t90\t50\n")  # 10 fields
        off = f.tell()
        f.write(b"e\t100\t0\t90\t+\tf\t100\t0\t90\t50\n")
    assert _carry_seed(paf, off) == 777
    assert _carry_seed(paf, 0) is None
