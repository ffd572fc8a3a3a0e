"""The native graph finalizer must produce output identical to the Python
sequential passes (and both are parity-tested against the reference)."""

import os

import pytest

from conftest import run_ours
from miniasm_tpu.io.native import available


@pytest.mark.skipif(not available(), reason="native lib unavailable")
@pytest.mark.parametrize("fmt", ["sg", "ug"])
def test_native_matches_python_finalizer(sim_small, fmt):
    native = run_ours(["-p", fmt, sim_small["paf"]])
    os.environ["MINIASM_TPU_NO_NATIVE"] = "1"
    try:
        python = run_ours(["-p", fmt, sim_small["paf"]])
    finally:
        del os.environ["MINIASM_TPU_NO_NATIVE"]
    assert native == python
