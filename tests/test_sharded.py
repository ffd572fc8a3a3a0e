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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sharded_matches_single_device():
    """The sharded select step must agree with the single-device kernel on
    trim tables and kept-hit counts."""
    import __graft_entry__ as ge
    from jax.sharding import NamedSharding, PartitionSpec as P
    from miniasm_tpu.config import Opt
    from miniasm_tpu.parallel.mesh import make_mesh
    from miniasm_tpu.parallel.sharded import sharded_select_step
    from miniasm_tpu.select.subregion import hit_sub
    from miniasm_tpu.select.cut import hit_cut
    import jax.numpy as jnp

    opt = Opt()
    n_dev = 4
    # oracle runs on the MIRRORED hit set (the sharded step mirrors
    # internally, so its input is the unmirrored set of the same records)
    colmat_m, n_seq = ge._example_cols(n_pad=2048 * n_dev, mirror=True)
    qid, qs, qe, tid, ts, te, ml, bl, rev, valid = [colmat_m[i] for i in range(10)]
    mvalid = valid.astype(bool)
    qid_m = np.where(mvalid, qid, n_seq)
    tid_m = np.where(mvalid, tid, n_seq + 1)
    s_ref, e_ref, d_ref = [np.asarray(x) for x in hit_sub(
        qid_m, tid_m, np.where(mvalid, qs, 0), np.where(mvalid, qe, 0),
        ml, bl, n_seq, opt.min_dp, opt.min_iden, 0)]

    # sharded input: unmirrored records, partitioned by query-block owner
    colmat, n_seq2 = ge._example_cols(n_pad=1024 * n_dev, mirror=False)
    assert n_seq2 == n_seq
    mvalid = colmat[9].astype(bool)
    mesh = make_mesh(n_dev)
    block = -(-n_seq // n_dev)
    owner = np.where(mvalid, colmat[0] // block, n_dev)
    order = np.argsort(owner, kind="stable")
    colmat2 = colmat[:, order]
    per = colmat2.shape[1] // n_dev
    shards = [[] for _ in range(n_dev)]
    for j in range(colmat2.shape[1]):
        dst = int(owner[order[j]])
        if dst < n_dev and len(shards[dst]) < per:
            shards[dst].append(colmat2[:, j])
    parts = []
    for s in shards:
        arr = (np.stack(s, axis=1) if s else np.zeros((10, 0), np.int32))
        parts.append(np.concatenate(
            [arr, np.zeros((10, per - arr.shape[1]), np.int32)], axis=1))
    gmat = jax.device_put(np.concatenate(parts, axis=1),
                          NamedSharding(mesh, P(None, "r")))
    step = sharded_select_step(mesh, n_seq, opt, cap_mirror=per)
    out, subtab, stats = jax.jit(step)(gmat)
    subtab = np.asarray(subtab)

    assert int(stats[2]) == 0  # no dropped mirrors
    # sub tables must match the single-device oracle exactly: the event
    # multiset per query is identical after the in-step mirror exchange
    assert np.array_equal(subtab[0][:n_seq].astype(np.uint32), s_ref)
    assert np.array_equal(subtab[1][:n_seq].astype(np.uint32), e_ref)
    assert np.array_equal(subtab[2][:n_seq].astype(bool), d_ref)
