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
