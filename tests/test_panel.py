"""Panel-level regression (reference paper panel, tex/miniasm.tex:712-723):
assemblies across coverage/noise/topology regimes must stay single-contig
where expected and w=5-layout-consistent everywhere."""

import io

import pytest

from miniasm_tpu.eval.panel import PANEL, run_one, alines_to_bed
from miniasm_tpu.eval.paf_srtcmp import srtcmp


# quick subset: clean, noisy, and circular regimes (full panel runs via
# python -m miniasm_tpu.eval.panel)
QUICK = [PANEL[0], PANEL[3], PANEL[7]]


@pytest.mark.parametrize("cfg", QUICK, ids=lambda c: c[0])
def test_panel_dataset(cfg):
    r = run_one(*cfg)
    assert r["unitigs"] == 1, r  # single contig per replicon
    assert r["layout_errors"] == 0, r  # 5-consistent layout
    assert r["reads_in_layout"] > 20


def test_alines_to_bed():
    gfa = ("S\tutg000001l\t*\tLN:i:100\n"
           "a\tutg000001l\t0\tread000001:1-50\t+\t25\n"
           "a\tutg000001l\t25\tread000002:5-60\t-\t30\n")
    bed = alines_to_bed(gfa)
    assert bed.splitlines() == [
        "read000001\t0\t50\tutg000001l\t+\t0",
        "read000002\t4\t60\tutg000001l\t-\t25",
    ]


def test_paf_srtcmp(tmp_path):
    truth = tmp_path / "truth.paf"
    test = tmp_path / "test.paf"
    truth.write_text(
        "q1\t100\t0\t100\t+\tt1\t500\t10\t110\t90\t100\t60\n"    # matched
        "q2\t100\t0\t100\t+\tt2\t500\t10\t110\t90\t100\t60\n"    # wrong tgt
        "q3\t100\t0\t50\t+\tt1\t500\t10\t60\t40\t50\t60\n"       # multi ->
        "q3\t100\t50\t100\t+\tt1\t500\t60\t110\t40\t50\t60\n"    # skipped
        "q4\t100\t0\t100\t-\tt3\t500\t10\t110\t90\t100\t60\n")   # no ovlp
    test.write_text(
        "q1\t100\t0\t100\t+\tt1\t500\t15\t115\t90\t100\t60\n"
        "q2\t100\t0\t100\t+\tt9\t500\t10\t110\t90\t100\t60\n"
        "q4\t100\t0\t100\t-\tt3\t500\t400\t490\t80\t90\t60\n")
    buf = io.StringIO()
    tot, matched = srtcmp(str(truth), str(test), buf)
    assert (tot, matched) == (3, 1)
    assert buf.getvalue().endswith("3 1 0.3333333333333333\n")
