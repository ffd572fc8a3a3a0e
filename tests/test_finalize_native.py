"""The three graph-cleaning backends — hybrid (device detection + ordered
host commit, the production default), native (C++ sequential oracle) and
py (Python sequential spec) — must produce identical output; hybrid is
additionally parity-tested against the reference in test_parity."""

import os

import pytest

from conftest import run_ours
from miniasm_tpu.io.native import available


def _run_mode(mode, args, no_native=False):
    os.environ["MINIASM_TPU_CLEAN"] = mode
    if no_native:
        os.environ["MINIASM_TPU_NO_NATIVE"] = "1"
    try:
        return run_ours(args)
    finally:
        del os.environ["MINIASM_TPU_CLEAN"]
        if no_native:
            del os.environ["MINIASM_TPU_NO_NATIVE"]


@pytest.mark.skipif(not available(), reason="native lib unavailable")
@pytest.mark.parametrize("fmt", ["sg", "ug"])
def test_cleaning_backends_agree(sim_small, fmt):
    hybrid = _run_mode("hybrid", ["-p", fmt, sim_small["paf"]])
    native = _run_mode("native", ["-p", fmt, sim_small["paf"]])
    python = _run_mode("py", ["-p", fmt, sim_small["paf"]], no_native=True)
    assert hybrid == native
    assert hybrid == python


@pytest.mark.skipif(not available(), reason="native lib unavailable")
@pytest.mark.parametrize("fmt", ["sg", "ug"])
def test_cleaning_backends_agree_noisy(sim_noisy, fmt):
    """On the degraded fixture every order-dependent pass fires (tips,
    bubbles, internal, bi-loops, short drops), so this pins all three
    backends to the same nontrivial commit sequence."""
    hybrid = _run_mode("hybrid", ["-p", fmt, sim_noisy["paf"]])
    native = _run_mode("native", ["-p", fmt, sim_noisy["paf"]])
    python = _run_mode("py", ["-p", fmt, sim_noisy["paf"]], no_native=True)
    assert hybrid == native
    assert hybrid == python
