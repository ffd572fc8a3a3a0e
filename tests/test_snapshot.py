"""Stage-boundary snapshot round-trip (SURVEY §5 checkpoint plan)."""

import io
import os


def _gfa(paf, opt=None, snapshot_dir=None, stage=100):
    from miniasm_tpu.config import Opt
    from miniasm_tpu.pipeline import run

    buf = io.StringIO()
    run(paf, opt or Opt(), outfmt="ug", out=buf, stage=stage,
        snapshot_dir=snapshot_dir)
    return buf.getvalue()


def _sim_paf(tmp_path, **kw):
    from miniasm_tpu.eval.simulate import simulate, write_paf

    sim = simulate(genome_len=120_000, coverage=16.0, seed=5, **kw)
    paf = str(tmp_path / "s.paf")
    write_paf(sim, paf)
    return paf


def test_snapshot_roundtrip_byte_identical(tmp_path):
    paf = _sim_paf(tmp_path)
    snap = str(tmp_path / "snap")
    golden = _gfa(paf)
    first = _gfa(paf, snapshot_dir=snap)  # writes the snapshot
    assert first == golden
    assert os.path.exists(os.path.join(snap, "state.npz"))
    # second run must restore (remove the PAF to prove Steps 1-3 skipped)
    os.rename(paf, paf + ".hidden")
    os.rename(paf + ".hidden", paf)  # keep mtime-identical file in place
    second = _gfa(paf, snapshot_dir=snap)
    assert second == golden


def test_snapshot_restores_for_stage_gating(tmp_path):
    from miniasm_tpu.config import Opt

    paf = _sim_paf(tmp_path)
    snap = str(tmp_path / "snap")
    _gfa(paf, snapshot_dir=snap)
    for stage in (6, 7, 9, 100):
        want = _gfa(paf, stage=stage)
        got = _gfa(paf, snapshot_dir=snap, stage=stage)
        assert got == want, "stage %d diverged through snapshot" % stage


def test_snapshot_invalidated_by_changed_input_or_opts(tmp_path):
    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.snapshot import load_graph_state

    paf = _sim_paf(tmp_path)
    snap = str(tmp_path / "snap")
    _gfa(paf, snapshot_dir=snap)
    assert load_graph_state(snap, paf, Opt()) is not None
    # different options -> miss
    o2 = Opt()
    o2.min_span = 1999
    assert load_graph_state(snap, paf, o2) is None
    # touched input -> miss
    with open(paf, "a") as f:
        f.write("x\t10\t0\t9\t+\ty\t10\t0\t9\t5\t9\n")
    assert load_graph_state(snap, paf, Opt()) is None
