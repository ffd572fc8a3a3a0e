"""Native C++ PAF loader must agree exactly with the pure-Python reader."""

import gzip
import os
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
def test_mt_loader_matches_v2(sim_small, tmp_path):
    """The pipelined multi-threaded loader (pafmt.cpp) must produce
    byte-identical columns, dict order, counters, and exact-permutation
    ranks as the single-threaded v2 loader — including on gzipped input
    (the chunk pipeline splits the stream at arbitrary 8 MB boundaries,
    so this also exercises cross-chunk interning)."""
    from miniasm_tpu.io.native.pafload import load_hits_mt, load_hits_v2

    def unpack(a):
        """Device wire format -> 7-row [qid qs qe tid ts te flags]; the
        MT loader packs 4 rows per record when coordinates fit 16 bits."""
        a = np.asarray(a)
        if a.shape[0] == 7:
            return a
        w0 = a[0].astype(np.uint32)
        qsqe = a[2].astype(np.uint32)
        tste = a[3].astype(np.uint32)
        return np.stack([
            (w0 & 0x0FFFFFFF).astype(np.int32),
            (qsqe >> 16).astype(np.int32), (qsqe & 0xFFFF).astype(np.int32),
            a[1],
            (tste >> 16).astype(np.int32), (tste & 0xFFFF).astype(np.int32),
            (w0 >> 28).astype(np.int32)])

    for paf in (sim_small["paf"],):
        c1, d1, h1 = load_hits_v2(paf, 2000, 100)
        c2, d2, h2 = load_hits_mt(paf, 2000, 100)
        n = h1.n_orig
        assert (h2.n_orig, h2.n_mirror, h2.n_lines, h2.max_len) == \
            (h1.n_orig, h1.n_mirror, h1.n_lines, h1.max_len)
        a1, a2 = np.asarray(c1), unpack(c2)
        assert np.array_equal(a1[:, :n], a2[:, :n])
        assert np.all(a2[6, n:] == 0)  # zero-pad tail is inert
        assert d1.names == d2.names and d1.lens == d2.lens
        idx1 = np.concatenate([np.arange(n), h1.cap + np.arange(n)])
        idx2 = np.concatenate([np.arange(n), h2.cap + np.arange(n)])
        assert np.array_equal(h1.arc_ranks(idx1), h2.arc_ranks(idx2))
        h1.free()
        h2.free()

    gz = str(tmp_path / "reads.paf.gz")
    with open(sim_small["paf"], "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    c1, d1, h1 = load_hits_v2(sim_small["paf"], 2000, 100)
    c2, d2, h2 = load_hits_mt(gz, 2000, 100)
    assert h2.n_orig == h1.n_orig and d1.names == d2.names
    assert np.array_equal(np.asarray(c1)[:, :h1.n_orig],
                          unpack(c2)[:, :h2.n_orig])
    h1.free()
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_bl_carry_and_excl(tmp_path):
    """The 10-field bl-carry quirk and the -R exclusion set through the
    MT loader (paf.c:34-56 / hit.c:86 semantics)."""
    from miniasm_tpu.io.native.pafload import load_hits_mt

    p = tmp_path / "t.paf"
    lines = [
        "a\t9000\t0\t5000\t+\tb\t9000\t4000\t9000\t5000\t5000\tcm:i:5",
        "bad\tline",
        "c\t9000\t0\t4000\t-\td\t9000\t0\t4000\t4000",  # 10 fields
        "e\t9000\t0\t100\t+\tf\t9000\t0\t100\t100\t100",
    ]
    p.write_text("\n".join(lines) + "\n")
    c, d, h = load_hits_mt(str(p), 2000, 100)
    a = np.asarray(c)
    flags = (a[6] if a.shape[0] == 7
             else (a[0].astype(np.uint32) >> 28).astype(np.int32))
    assert h.n_orig == 2
    assert d.names == ["a", "b", "c", "d"]
    # row 1 is the bl-carried record; its identity flag used bl=5000:
    # ml=4000 >= 5000*0.05 -> iden_ok set
    assert flags[1] & 4
    h.free()

    excl = SeqDict()
    excl.put("a", 1)
    c2, d2, h2 = load_hits_mt(str(p), 2000, 100, excl=excl)
    assert h2.n_orig == 1 and d2.names == ["c", "d"]
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_multichunk(sim_small):
    """Force many reader blocks (4 KB) and many small pieces so the
    cross-chunk interning, bl-carry plumbing, and multi-piece cap
    arithmetic are exercised on a fixture-sized input."""
    from miniasm_tpu.io.native import pafload as P
    from miniasm_tpu.io.native.pafload import load_hits_mt, load_hits_v2

    c1, d1, h1 = load_hits_v2(sim_small["paf"], 2000, 100)
    n = h1.n_orig
    old = P._MT_CHUNK
    P._MT_CHUNK = 512
    try:
        c2, d2, h2 = load_hits_mt(sim_small["paf"], 2000, 100,
                                  upload=False, block_bytes=4096)
    finally:
        P._MT_CHUNK = old
    assert h2.n_orig == n and h2.n_mirror == h1.n_mirror
    assert d1.names == d2.names and d1.lens == d2.lens
    a1, a2 = np.asarray(c1), np.asarray(c2)
    assert np.array_equal(a1[:, :n], a2[:, :n])
    idx1 = np.concatenate([np.arange(n), h1.cap + np.arange(n)])
    idx2 = np.concatenate([np.arange(n), h2.cap + np.arange(n)])
    assert np.array_equal(h1.arc_ranks(idx1), h2.arc_ranks(idx2))
    h1.free()
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_mid_stream_pack_switch(tmp_path):
    """A record whose coordinates exceed 16 bits mid-stream switches the
    packed piece format to 7-row; device column indices must stay aligned
    with the C++ g_* arrays (key_fetch/arc_ranks address by raw column),
    i.e. no zero-padded hole may appear mid-stream."""
    from miniasm_tpu.io.native.pafload import load_hits_mt, load_hits_v2

    p = tmp_path / "mix.paf"
    lines = []
    for i in range(50):
        lines.append("s%d\t30000\t10\t25000\t+\tt%d\t30000\t100\t25100\t"
                     "20000\t25000" % (i, (i + 1) % 50))
    # the 51st record needs 17-bit coordinates -> pack fails there
    lines.append("big\t100000\t70000\t96000\t+\tother\t100000\t200\t26200\t"
                 "20000\t26000")
    for i in range(50, 80):
        lines.append("s%d\t30000\t10\t25000\t+\tt%d\t30000\t100\t25100\t"
                     "20000\t25000" % (i, (i + 1) % 80))
    p.write_text("\n".join(lines) + "\n")

    c1, d1, h1 = load_hits_v2(str(p), 2000, 100)
    c2, d2, h2 = load_hits_mt(str(p), 2000, 100)
    n = h1.n_orig
    assert h2.n_orig == n and n == 81
    a1 = np.asarray(c1)
    a2 = np.asarray(c2)
    assert a2.shape[0] == 7, "mixed stream must unpack to 7-row"
    assert np.array_equal(a1[:, :n], a2[:, :n])
    # the exact-rank and key fetch must agree column-for-column
    idx1 = np.concatenate([np.arange(n), h1.cap + np.arange(n)])
    idx2 = np.concatenate([np.arange(n), h2.cap + np.arange(n)])
    assert np.array_equal(h1.arc_ranks(idx1), h2.arc_ranks(idx2))
    want = (a1[0, :n].astype(np.uint64) << 32) | a1[1, :n].astype(np.uint64)
    assert np.array_equal(h2.key_fetch(np.arange(n)), want)
    h1.free()
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_wrapped_coordinate_record(tmp_path):
    """A malformed qs>qe record (kept by the reference: the unsigned span
    wrap passes the filter) must not be coordinate-truncated by the packed
    format even when its END coordinates fit 16 bits."""
    from miniasm_tpu.io.native.pafload import load_hits_mt, load_hits_v2

    p = tmp_path / "wrap.paf"
    lines = ["a\t9000\t0\t5000\t+\tb\t9000\t100\t5100\t4000\t5000",
             # qs=70000 > qe=100: qe-qs wraps huge -> passes min_span
             "c\t9000\t70000\t100\t+\td\t9000\t100\t5100\t4000\t5000",
             "e\t9000\t0\t5000\t+\tf\t9000\t100\t5100\t4000\t5000"]
    p.write_text("\n".join(lines) + "\n")
    c1, d1, h1 = load_hits_v2(str(p), 2000, 100)
    c2, d2, h2 = load_hits_mt(str(p), 2000, 100)
    n = h1.n_orig
    assert n == 3
    a1 = np.asarray(c1)
    a2 = np.asarray(c2)
    if a2.shape[0] == 4:  # whole stream packed: unpack for comparison
        w0 = a2[0].astype(np.uint32)
        qsqe = a2[2].astype(np.uint32)
        tste = a2[3].astype(np.uint32)
        a2 = np.stack([
            (w0 & 0x0FFFFFFF).astype(np.int32),
            (qsqe >> 16).astype(np.int32), (qsqe & 0xFFFF).astype(np.int32),
            a2[1],
            (tste >> 16).astype(np.int32), (tste & 0xFFFF).astype(np.int32),
            (w0 >> 28).astype(np.int32)])
    assert np.array_equal(a1[:, :n], a2[:, :n])
    assert a1[1, 1] == 70000  # the wrapped start survived intact
    h1.free()
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_fmt3_matches_fmt4(sim_small, monkeypatch):
    """The 13 B/record FMT3 H2D layout (3 coordinate rows + flag nibbles +
    qid RLE sideband, decoded on device) must reproduce the 4-row packed
    colmat bit-for-bit on real columns, with inert (flags=0) padding."""
    from miniasm_tpu.io.native.pafload import load_hits_mt

    monkeypatch.setenv("MINIASM_TPU_FMT3", "0")
    c4, d4, h4 = load_hits_mt(sim_small["paf"], 2000, 100)
    monkeypatch.delenv("MINIASM_TPU_FMT3")
    c3, d3, h3 = load_hits_mt(sim_small["paf"], 2000, 100)
    n = h4.n_orig
    assert h3.n_orig == n and h3.n_mirror == h4.n_mirror
    a4, a3 = np.asarray(c4), np.asarray(c3)
    assert a4.shape[0] == 4 and a3.shape[0] == 4
    assert np.array_equal(a4[:, :n], a3[:, :n])
    assert np.all((a3[0, n:].astype(np.uint32) >> 28) == 0)
    assert d4.names == d3.names and d4.lens == d3.lens
    # rank machinery addresses the same raw columns in either format
    idx = np.concatenate([np.arange(n), h3.cap + np.arange(n)])
    assert np.array_equal(h3.key_fetch(np.arange(n)),
                          h4.key_fetch(np.arange(n)))
    assert np.array_equal(h3.arc_ranks(idx), h4.arc_ranks(idx))
    h4.free()
    h3.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_fmt3_rle_overflow_downgrade(tmp_path):
    """A stream whose qid alternates every record overflows the FMT3 RLE
    sideband (cap = piece/16 boundaries) mid-piece; the loader must
    truncate the filled prefix, convert it host-side, and continue with
    4-row pieces — device columns staying aligned with the C++ g_*
    arrays."""
    from miniasm_tpu.io.native.pafload import (_MT_CHUNK, load_hits_mt,
                                               load_hits_v2)

    # default piece = _MT_CHUNK records -> boundary cap = _MT_CHUNK/16;
    # alternating qids produce one boundary per record, so cap+2000
    # records guarantee an overflow inside the first piece
    n_lines = _MT_CHUNK // 16 + 2000
    p = tmp_path / "alt.paf"
    with open(p, "w") as f:
        for i in range(n_lines):
            f.write("q%d\t9000\t10\t8000\t+\tt%d\t9000\t100\t8100\t"
                    "6000\t8000\n" % (i % 997, 997 + (i % 991)))

    c1, d1, h1 = load_hits_v2(str(p), 2000, 100)
    c2, d2, h2 = load_hits_mt(str(p), 2000, 100)
    n = h1.n_orig
    assert n == n_lines and h2.n_orig == n
    a1 = np.asarray(c1)
    a2 = np.asarray(c2)
    assert a2.shape[0] == 4, "RLE overflow must downgrade to 4-row, not 7"
    w0 = a2[0].astype(np.uint32)
    qsqe = a2[2].astype(np.uint32)
    tste = a2[3].astype(np.uint32)
    a2u = np.stack([
        (w0 & 0x0FFFFFFF).astype(np.int32),
        (qsqe >> 16).astype(np.int32), (qsqe & 0xFFFF).astype(np.int32),
        a2[1],
        (tste >> 16).astype(np.int32), (tste & 0xFFFF).astype(np.int32),
        (w0 >> 28).astype(np.int32)])
    assert np.array_equal(a1[:, :n], a2u[:, :n])
    idx = np.concatenate([np.arange(n), h2.cap + np.arange(n)])
    idx1 = np.concatenate([np.arange(n), h1.cap + np.arange(n)])
    assert np.array_equal(h1.arc_ranks(idx1), h2.arc_ranks(idx))
    h1.free()
    h2.free()


@pytest.mark.skipif(not available(), reason="native lib unavailable")
def test_mt_loader_fmt3_multi_piece(tmp_path):
    """A grouped stream spanning MULTIPLE FMT3 pieces exercises the
    fused decode+concat dispatch (one jit over the piece tuple), which
    the single-piece fixtures never reach."""
    from miniasm_tpu.io.native.pafload import load_hits_mt

    p = tmp_path / "multi.paf"
    n_q = 7000
    per_q = 20  # 140k records -> 2 pieces at the small-file 2^17 quantum
    with open(p, "w") as f:
        for q in range(n_q):
            for t in range(per_q):
                f.write("q%05d\t9000\t%d\t%d\t+\tt%04d\t9000\t100\t8100\t"
                        "6000\t8000\n"
                        % (q, 10 + t, 8000 + t, (q + t + 1) % 997))

    import os

    os.environ["MINIASM_TPU_FMT3"] = "0"
    try:
        c4, d4, h4 = load_hits_mt(str(p), 2000, 100)
    finally:
        os.environ.pop("MINIASM_TPU_FMT3")
    c3, d3, h3 = load_hits_mt(str(p), 2000, 100)
    n = h4.n_orig
    assert n == n_q * per_q and h3.n_orig == n
    a4, a3 = np.asarray(c4), np.asarray(c3)
    assert np.array_equal(a4[:, :n], a3[:, :n])
    assert np.all((a3[0, n:].astype(np.uint32) >> 28) == 0)
    h4.free()
    h3.free()


@pytest.mark.skipif(not available() or not os.path.exists("/dev/full"),
                    reason="native lib or /dev/full unavailable")
def test_print_paf_write_failure_reported(sim_small):
    """A failed write (ENOSPC emulated via /dev/full) must surface as an
    error, not a silently truncated -p paf reported as success."""
    from miniasm_tpu.config import Opt
    from miniasm_tpu.io.native.pafload import load_hits_mt

    c, d, h = load_hits_mt(sim_small["paf"], 2000, 100, upload=False,
                           retain_full=True)
    ns = d.n_seq
    s0 = np.zeros(ns, np.int32)
    e0 = np.asarray(d.lens, np.int32)
    dz = np.zeros(ns, np.uint8)
    alive = np.ones(ns, np.uint8)
    with open("/dev/full", "wb") as out:
        printed = h.print_paf((s0, e0, dz), (s0, e0, dz), alive,
                              Opt().min_span, int(Opt().max_hang * 1.5),
                              int(Opt().min_ovlp * 0.5), out.fileno())
    h.free()
    assert printed < 0, "write failure must be reported"
