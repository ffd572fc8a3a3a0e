"""Interop converter tests: vs the reference Perl scripts where an
interpreter exists, plus round-trips and hand-built fixtures for the
k8/JavaScript ones (no k8 in this environment)."""

import io
import shutil
import subprocess

import pytest

PERL = shutil.which("perl")
REF = "/root/reference/misc"

MHAP_LINES = """\
1 2 0.15 35.0 0 100 4900 5000 0 200 5100 6000
2 3 90.5 12.0 0 0 3000 4000 1 500 3600 5000
1 3 0.4 3.0 1 0 900 5000 0 0 950 5000
"""


def _perl(script, args, stdin):
    r = subprocess.run([PERL, f"{REF}/{script}"] + args, input=stdin,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


@pytest.mark.skipif(PERL is None, reason="no perl")
def test_mhap2paf_vs_perl(tmp_path):
    from miniasm_tpu.interop.mhap2paf import convert

    for extra in ([], ["-2"]):
        ref = _perl("mhap2paf.pl", extra, MHAP_LINES)
        buf = io.StringIO()
        convert(io.StringIO(MHAP_LINES), buf, double=bool(extra))
        assert buf.getvalue() == ref


@pytest.mark.skipif(PERL is None, reason="no perl")
def test_paf2mhap_vs_perl(tmp_path, sim_small):
    from miniasm_tpu.interop.paf2mhap import convert

    with open(sim_small["paf"]) as f:
        paf_text = "".join(f.readlines()[:200])
    ref = _perl("paf2mhap.pl", [sim_small["fasta"]], paf_text)
    buf = io.StringIO()
    convert(sim_small["fasta"], io.StringIO(paf_text), buf)
    assert buf.getvalue() == ref


@pytest.mark.skipif(PERL is None, reason="no perl")
def test_da2paf_vs_perl(tmp_path):
    from miniasm_tpu.interop.da2paf import convert

    db = tmp_path / "db.txt"
    db.write_text("R 1\nH x m54321\nL 7 100 5100\n"
                  "R 2\nH x m54321\nL 8 0 6000\n")
    la = ("P 1 2 n\nC 100 4000 0 3900\nD 250\n"
          "P 2 1 c\nC 0 3900 100 4000\nD 250\n")
    ref = _perl("da2paf.pl", [str(db)], la)
    buf = io.StringIO()
    with open(db) as dbf:
        convert(dbf, io.StringIO(la), buf)
    assert buf.getvalue() == ref

    ref2 = _perl("da2paf.pl", ["-2n", str(db)], la)
    buf2 = io.StringIO()
    with open(db) as dbf:
        convert(dbf, io.StringIO(la), buf2, double=True, with_name=True)
    assert buf2.getvalue() == ref2


def test_sam2paf_basic():
    from miniasm_tpu.interop.sam2paf import convert

    sam = ("@SQ\tSN:chr1\tLN:10000\n"
           "r1\t0\tchr1\t101\t60\t50S100M2I50M3D100M\t*\t0\t0\t*\t*\tNM:i:8\n"
           "r2\t16\tchr1\t201\t60\t10H200M\t*\t0\t0\t*\t*\tNM:i:4\n"
           "r3\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
    buf = io.StringIO()
    convert(io.StringIO(sam), buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 2
    f = lines[0].split("\t")
    # qlen = M+I+clips = 250+2+50 = 302; qs=50 qe=302; ts=100 te=100+M+D=353
    assert f[:12] == ["r1", "302", "50", "302", "+", "chr1", "10000", "100",
                      "353", "247", "255", "60"]
    assert "mm:i:3" in lines[0] and "in:i:2" in lines[0] and "dn:i:3" in lines[0]
    f2 = lines[1].split("\t")
    assert f2[4] == "-" and f2[1] == "210" and f2[2] == "0" and f2[3] == "200"


def test_wt2paf_basic():
    from miniasm_tpu.interop.wt2paf import convert

    wt = "r1\t+\t5000\t100\t4900\tr2\t+\t6000\t0\t4800\tx\tx\t4700\t50\t30\t20\n"
    buf = io.StringIO()
    convert(io.StringIO(wt), buf)
    assert buf.getvalue() == \
        "r1\t5000\t100\t4900\t+\tr2\t6000\t0\t4800\t4700\t4800\t255\n"


def test_paftop_masks_and_merges():
    from miniasm_tpu.interop.paftop import run

    # two colinear hits of q1 on t1 that should merge, plus a worse
    # overlapping hit that should be masked
    paf = ("q1\t10000\t0\t4000\t+\tt1\t20000\t0\t4000\t3800\t4000\t60\n"
           "q1\t10000\t4500\t9000\t+\tt1\t20000\t4600\t9100\t4300\t4500\t60\n"
           "q1\t10000\t100\t3900\t+\tt2\t20000\t0\t3800\t1000\t3800\t60\n")
    buf = io.StringIO()
    run(io.StringIO(paf), buf)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 1
    f = lines[0].split("\t")
    assert f[2] == "0" and f[3] == "9000" and f[7] == "0" and f[8] == "9100"
    assert f[9] == str(3800 + 4300)


def test_ovsen_and_testsen(tmp_path):
    from miniasm_tpu.eval.ovsen import run as ovsen
    from miniasm_tpu.eval.testsen import run as testsen

    # reads r1,r2 overlap on ref; r3 far away
    ref_paf = ("r1\t9000\t0\t9000\t+\tchr\t100000\t0\t9000\t8000\t9000\t60\n"
               "r2\t9000\t0\t9000\t+\tchr\t100000\t5000\t14000\t8000\t9000\t60\n"
               "r3\t9000\t0\t9000\t+\tchr\t100000\t50000\t59000\t8000\t9000\t60\n")
    ovlp_paf = "r1\t9000\t5000\t9000\t+\tr2\t9000\t0\t4000\t3900\t4000\n"
    p1 = tmp_path / "ref.paf"
    p2 = tmp_path / "ov.paf"
    p1.write_text(ref_paf)
    p2.write_text(ovlp_paf)
    out = io.StringIO()
    n_ovlp, n_missed = ovsen(str(p1), str(p2), out)
    assert (n_ovlp, n_missed) == (1, 0)

    pairs = tmp_path / "pairs.txt"
    pairs.write_text("r1\tr2\nr1\tr3\n")
    out = io.StringIO()
    cnt = testsen(str(pairs), io.StringIO(ovlp_paf), out)
    assert cnt == [1, 1]
