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
