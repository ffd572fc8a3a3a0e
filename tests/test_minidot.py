"""minidot EPS byte-parity vs the reference binary."""

import io
import os
import subprocess

import pytest

REF_BUILD = "/tmp/miniasm_ref_build"


@pytest.fixture(scope="session")
def ref_minidot(ref_miniasm):
    exe = os.path.join(REF_BUILD, "minidot")
    if not os.path.exists(exe):
        subprocess.run(["make", "minidot"], cwd=REF_BUILD, check=True,
                       capture_output=True)
    return exe


@pytest.mark.parametrize("args", [[], ["-d"], ["-L"], ["-w", "800", "-s", "500"]])
def test_minidot_parity(ref_minidot, sim_small, args):
    ref = subprocess.run([ref_minidot] + args + [sim_small["paf"]],
                         capture_output=True, text=True)
    assert ref.returncode == 0
    from miniasm_tpu import dotter

    buf = io.StringIO()
    kw = {}
    it = iter(args)
    for a in it:
        if a == "-d":
            kw["diagonal"] = False
        elif a == "-L":
            kw["no_label"] = True
        elif a == "-w":
            kw["width"] = int(next(it))
        elif a == "-s":
            kw["min_span"] = int(next(it))
    rc = dotter.render(sim_small["paf"], buf, **kw)
    assert rc == 0
    assert buf.getvalue() == ref.stdout
