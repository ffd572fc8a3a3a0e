"""Native C++ PAF loader must agree exactly with the pure-Python reader."""

import gzip
import shutil

import numpy as np
import pytest

from miniasm_tpu.io.paf import load_paf_python
from miniasm_tpu.io.native import available
from miniasm_tpu.io.seqdict import SeqDict


def _compare(a, b):
    assert a.n_lines == b.n_lines
    assert a.n == b.n
    for f in ("qid", "qs", "qe", "tid", "ts", "te", "ml", "bl", "rev"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert a.d.names == b.d.names
    assert a.d.lens == b.d.lens


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_matches_python(sim_small, tmp_path):
    from miniasm_tpu.io.native.pafload import load_paf_native

    py = load_paf_python(sim_small["paf"], 2000, 100)
    nat = load_paf_native(sim_small["paf"], 2000, 100)
    _compare(py, nat)

    # gzipped input
    gz = str(tmp_path / "reads.paf.gz")
    with open(sim_small["paf"], "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    natgz = load_paf_native(gz, 2000, 100)
    _compare(py, natgz)


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_native_excl_and_edge_lines(tmp_path):
    from miniasm_tpu.io.native.pafload import load_paf_native

    p = tmp_path / "t.paf"
    lines = [
        # normal 12-field line
        "a\t9000\t0\t5000\t+\tb\t9000\t4000\t9000\t5000\t5000\tcm:i:5",
        # short line (<10 fields): skipped entirely
        "bad\tline",
        # exactly 10 fields: bl carries over from previous record
        "c\t9000\t0\t4000\t-\td\t9000\t0\t4000\t4000",
        # filtered by min_span
        "e\t9000\t0\t100\t+\tf\t9000\t0\t100\t100\t100",
    ]
    p.write_text("\n".join(lines) + "\n")
    py = load_paf_python(str(p), 2000, 100)
    nat = load_paf_native(str(p), 2000, 100)
    _compare(py, nat)
    assert nat.n == 2
    assert int(nat.bl[1]) == 5000  # carried bl

    excl = SeqDict()
    excl.put("a", 1)
    py2 = load_paf_python(str(p), 2000, 100, excl=excl)
    nat2 = load_paf_native(str(p), 2000, 100, excl=excl)
    _compare(py2, nat2)
    assert nat2.n == 1


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_staged_loader_matches_oneshot(sim_small):
    """load_hits_native_dev (originals + permutation, device mirror_gather)
    must reconstruct exactly the colmat load_hits_native materializes on the
    host — including the packed 19-byte uint8 kind-2 upload format."""
    from miniasm_tpu.io.native.pafload import load_hits_native, load_hits_native_dev
    from miniasm_tpu.select.fused import mirror_gather, _next_pow2

    colmat, n, d, n_lines, max_deg = load_hits_native(sim_small["paf"], 2000, 100)
    orig, perm, n2, d2, nl2, md2 = load_hits_native_dev(sim_small["paf"], 2000, 100)
    assert (n, n_lines, max_deg) == (n2, nl2, md2)
    assert d.names == d2.names and d.lens == d2.lens
    dev = mirror_gather(orig, perm, n_seq_cap=_next_pow2(max(d.n_seq, 1)),
                        cap=perm.shape[0])
    got = np.asarray(dev)
    assert np.array_equal(got[:, :n], colmat[:, :n])
