"""End-to-end byte-parity tests against the reference miniasm binary.

The reference is compiled out-of-tree (conftest.ref_miniasm) and run on
synthetic PAF inputs; stdout must match ours byte for byte for every output
format.  This is the round-trip contract from SURVEY.md §4 / BASELINE.md.
"""

import pytest

from conftest import run_ref, run_ours


FORMATS = ["bed", "paf", "sg", "ug"]


@pytest.mark.parametrize("fmt", FORMATS)
def test_default_pipeline_parity(ref_miniasm, sim_small, fmt):
    ref_out = run_ref(ref_miniasm, ["-p", fmt, sim_small["paf"]])
    our_out = run_ours(["-p", fmt, sim_small["paf"]])
    assert our_out == ref_out


def test_ug_with_sequences_parity(ref_miniasm, sim_small):
    ref_out = run_ref(ref_miniasm, ["-f", sim_small["fasta"], sim_small["paf"]])
    our_out = run_ours(["-f", sim_small["fasta"], sim_small["paf"]])
    assert our_out == ref_out


def test_prefilter_parity(ref_miniasm, sim_small):
    ref_out = run_ref(ref_miniasm, ["-R", sim_small["paf"]])
    our_out = run_ours(["-R", sim_small["paf"]])
    assert our_out == ref_out


@pytest.mark.parametrize("stage", [2, 3, 4, 5, 6, 7, 9, 10])
def test_stage_gating_parity(ref_miniasm, sim_small, stage):
    fmt = "bed" if stage < 6 else "sg"
    ref_out = run_ref(ref_miniasm, ["-S", str(stage), "-p", fmt, sim_small["paf"]])
    our_out = run_ours(["-S", str(stage), "-p", fmt, sim_small["paf"]])
    assert our_out == ref_out


def test_skip_selection_parity(ref_miniasm, sim_small):
    ref_out = run_ref(ref_miniasm, ["-1", "-2", "-p", "sg", sim_small["paf"]])
    our_out = run_ours(["-1", "-2", "-p", "sg", sim_small["paf"]])
    assert our_out == ref_out


@pytest.mark.parametrize("fmt", FORMATS)
def test_noisy_pipeline_parity(ref_miniasm, sim_noisy, fmt):
    """Degraded-PAF parity: the reference fires tips/bubbles/biloops/
    internal/short-drop passes on this fixture (see conftest.sim_noisy), so
    this asserts byte-parity of the order-dependent cleaning machinery on
    non-trivial work, not just on zero events."""
    ref_out = run_ref(ref_miniasm, ["-p", fmt, sim_noisy["paf"]])
    our_out = run_ours(["-p", fmt, sim_noisy["paf"]])
    assert our_out == ref_out


def test_noisy_prefilter_parity(ref_miniasm, sim_noisy):
    """-R on degraded data (the reference drops 23 reads here), driving
    the native C++ prefilter through a nontrivial exclusion set."""
    ref_out = run_ref(ref_miniasm, ["-R", sim_noisy["paf"]])
    our_out = run_ours(["-R", sim_noisy["paf"]])
    assert our_out == ref_out


def test_noisy_sequences_parity(ref_miniasm, sim_noisy):
    """-f on degraded data: splices through the native FASTX reader with
    reverse-complement segments present."""
    ref_out = run_ref(ref_miniasm, ["-f", sim_noisy["fasta"], sim_noisy["paf"]])
    our_out = run_ours(["-f", sim_noisy["fasta"], sim_noisy["paf"]])
    assert our_out == ref_out


def test_noisy_counters_nonzero(ref_miniasm, sim_noisy):
    """Meta-test: the noisy fixture must keep exercising the cleaning
    passes — if the simulator or dropout parameters drift and the counters
    go to zero, the parity tests above silently stop protecting them."""
    import re
    import subprocess

    r = subprocess.run([ref_miniasm, sim_noisy["paf"]],
                       capture_output=True, text=True)
    log = r.stderr
    tips = sum(int(m) for m in re.findall(r"cut (\d+) tips", log))
    bubbles = sum(int(m) for m in re.findall(r"popped (\d+) bubbles", log))
    internal = sum(int(m) for m in re.findall(r"cut (\d+) internal", log))
    biloops = sum(int(m) for m in re.findall(r"cut (\d+) small bi-loops", log))
    shorts = sum(int(m) for m in re.findall(r"removed (\d+) short", log))
    assert tips > 50, log
    assert bubbles >= 1
    assert internal >= 1
    assert biloops >= 1
    assert shorts >= 1


@pytest.fixture(scope="session")
def sim_circular(tmp_path_factory):
    """Circular 200kb genome at 25x: the reference assembles it into a
    single CIRCULAR unitig (utg000001c, start=end=UINT32_MAX, two
    self-circularising L-lines, asm.c:85-88) — a path no linear fixture
    reaches."""
    from miniasm_tpu.eval.simulate import simulate, write_paf, write_fasta

    d = tmp_path_factory.mktemp("sim_circ")
    sim = simulate(genome_len=200_000, coverage=25.0, seed=11, circular=True)
    paf = str(d / "circ.paf")
    fa = str(d / "circ.fa")
    write_paf(sim, paf)
    write_fasta(sim, fa)
    return {"paf": paf, "fasta": fa}


def test_circular_unitig_parity(ref_miniasm, sim_circular):
    ref_out = run_ref(ref_miniasm, [sim_circular["paf"]])
    our_out = run_ours([sim_circular["paf"]])
    assert our_out == ref_out
    names = [l.split("\t")[1] for l in ref_out.splitlines()
             if l.startswith("S")]
    assert any(n.endswith("c") for n in names), "fixture lost circularity"
    assert any(l.startswith("L") and l.split("\t")[1] == l.split("\t")[3]
               for l in ref_out.splitlines()), "no self L-line"


def test_circular_sequences_parity(ref_miniasm, sim_circular):
    """-f through a circular unitig: the splice path with reads wrapping
    the origin."""
    ref_out = run_ref(ref_miniasm,
                      ["-f", sim_circular["fasta"], sim_circular["paf"]])
    our_out = run_ours(["-f", sim_circular["fasta"], sim_circular["paf"]])
    assert our_out == ref_out


@pytest.mark.parametrize("fmt", ["paf", "sg", "ug"])
def test_no_bidir_parity(ref_miniasm, sim_small, fmt):
    """-b (bi_dir off, main.c:61-62): hits are NOT mirrored, which changes
    the event multiset of every sweep and the arc set."""
    ref_out = run_ref(ref_miniasm, ["-b", "-p", fmt, sim_small["paf"]])
    our_out = run_ours(["-b", "-p", fmt, sim_small["paf"]])
    assert our_out == ref_out


def test_gz_paf_through_cli(ref_miniasm, sim_noisy, tmp_path):
    """Gzipped PAF through the FULL CLI on the noisy fixture (cleaning
    passes firing), not just the loader unit test."""
    import gzip
    import shutil

    gz = str(tmp_path / "reads.paf.gz")
    with open(sim_noisy["paf"], "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    ref_out = run_ref(ref_miniasm, [gz])
    our_out = run_ours([gz])
    assert our_out == ref_out
    assert ref_out == run_ref(ref_miniasm, [sim_noisy["paf"]])


def _native_available():
    try:
        from miniasm_tpu.io.native import available

        return available()
    except ImportError:
        return False


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_duplicate_graph_key_parity(ref_miniasm, tmp_path):
    """Two surviving arcs sharing the exact (u<<32|l) graph sort key force
    the exact-rank fallback in the fast order path (pipeline._run_fast_v2);
    output must still match the reference byte for byte.  The (genome,
    dropout, seed) combination below is empirically chosen to produce a
    duplicate graph key through the trim arithmetic (two genomic distances
    projecting to the same arc length after sub-region cutting)."""
    import random

    from miniasm_tpu.eval.simulate import simulate, write_paf

    import numpy as np

    sim = simulate(genome_len=800_000, coverage=30.0, seed=13)
    paf = str(tmp_path / "dup.paf")
    write_paf(sim, paf)
    rng = random.Random(13)
    kept = [l for l in open(paf) if rng.random() > 0.3]
    with open(paf, "w") as f:
        f.writelines(kept)

    # confirm the crafted input actually produces duplicate graph keys
    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.native.pafload import load_hits_mt
    from miniasm_tpu.select.fused2 import select_build2

    opt = Opt()
    cm, d, h3 = load_hits_mt(paf, opt.min_span, opt.min_match, bi_dir=True,
                             min_iden=float(opt.min_iden))
    arcs, _, _ = select_build2(cm, d, opt, bi_dir=True, max_len=h3.max_len)
    h3.free()
    ul = ((arcs["u"].astype(np.uint64) << np.uint64(32))
          | arcs["l"].astype(np.uint64))
    sk = np.sort(ul)
    assert np.any(sk[1:] == sk[:-1]), "fixture no longer produces dup keys"

    for fmt in ("ug", "sg"):
        ref_out = run_ref(ref_miniasm, ["-p", fmt, paf])
        our_out = run_ours(["-p", fmt, paf])
        assert our_out == ref_out


def test_big_config_fetch_format_parity(ref_miniasm, sim_small, monkeypatch):
    """The 4-row (u, v, l<<16|ol) fetch format only triggers above 32768
    reads in production; force it on the small fixture so the unpack is
    covered."""
    monkeypatch.setenv("MINIASM_TPU_PACKIO", "0")
    ref_out = run_ref(ref_miniasm, [sim_small["paf"]])
    our_out = run_ours([sim_small["paf"]])
    assert our_out == ref_out
