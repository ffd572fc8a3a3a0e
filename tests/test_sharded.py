"""Multi-device sharded pipeline: runs on the 8-device virtual CPU mesh
(conftest sets xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("fixture", ["sim_small", "sim_noisy"])
def test_full_sharded_pipeline_matches_single(request, fixture):
    """Full PAF -> GFA over an 8-device mesh must be byte-identical to the
    single-device pipeline, including every graph-cleaning pass on the
    noisy fixture (tips/bubbles/biloops all fire there)."""
    import io

    from miniasm_tpu.config import Opt
    from miniasm_tpu.parallel.mesh import make_mesh
    from miniasm_tpu.parallel.full import run_sharded
    from miniasm_tpu.pipeline import run

    paf = request.getfixturevalue(fixture)["paf"]
    single = io.StringIO()
    run(paf, Opt(), outfmt="ug", out=single)
    sharded = io.StringIO()
    run_sharded(paf, Opt(), make_mesh(8), outfmt="ug", out=sharded)
    assert sharded.getvalue() == single.getvalue()


# (the standalone per-step sharded kernel test was retired with
# parallel/sharded.py; parallel/full.py is covered end-to-end above)
