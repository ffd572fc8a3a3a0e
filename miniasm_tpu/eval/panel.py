"""Panel-level regression: assemble a synthetic dataset panel and score
each member like the reference paper scores its 17-dataset panel
(tex/miniasm.tex:712-723): unitig count per replicon (single-contig rate)
and w-consistency of the read layout against the simulation truth
(order_eval, w=5).

Datasets vary coverage, read length, dropout (overlapper sensitivity) and
topology (circular replicons), spanning the regimes where the cleaning
passes do real work.

Usage: python -m miniasm_tpu.eval.panel [--quick]
Prints one JSON line per dataset plus a summary line.
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile


PANEL = [
    # name, genome_len, coverage, mean_read, dropout, circular
    ("clean20x", 200_000, 20.0, 8000, 0.0, False),
    ("clean40x", 200_000, 40.0, 8000, 0.0, False),
    ("low8x", 200_000, 8.0, 8000, 0.0, False),
    ("drop30", 200_000, 20.0, 8000, 0.30, False),
    ("drop55", 200_000, 40.0, 8000, 0.55, False),
    ("short-reads", 200_000, 25.0, 4000, 0.0, False),
    ("long-reads", 400_000, 20.0, 16000, 0.0, False),
    ("circular", 150_000, 20.0, 8000, 0.0, True),
    ("circular-drop25", 150_000, 35.0, 8000, 0.25, True),
    ("big-drop35", 600_000, 20.0, 9000, 0.35, False),
]


def alines_to_bed(gfa_text: str) -> str:
    """GFA a-lines -> the BED order_eval consumes: read start end utg ori
    offset (a-line read field is name:start-end with 1-based start)."""
    rows = []
    for line in gfa_text.splitlines():
        if not line.startswith("a\t"):
            continue
        _, utg, off, read, ori, _inc = line.split("\t")
        name, se = read.rsplit(":", 1)
        s, e = se.split("-")
        rows.append("%s\t%d\t%s\t%s\t%s\t%s" % (name, int(s) - 1, e, utg,
                                                ori, off))
    return "\n".join(rows) + ("\n" if rows else "")


def truth_paf(sim) -> str:
    """Read-to-reference truth mapping (one best hit per read), the
    paftop-style input of order_eval."""
    rows = []
    for name, s, e, o, ln in zip(sim["names"], sim["gs"], sim["ge"],
                                 sim["ori"], sim["lens"]):
        rows.append("%s\t%d\t0\t%d\t%s\tchr1\t%d\t%d\t%d\t%d\t%d\t60"
                    % (name, ln, ln, "-" if o else "+", sim["genome_len"],
                       s, e, ln, ln))
    return "\n".join(rows) + "\n"


def run_one(name, genome_len, coverage, mean_read, dropout, circular,
            seed=13):
    import random

    from ..config import Opt
    from ..pipeline import run
    from .order_eval import run as order_run
    from .simulate import simulate, write_paf

    sim = simulate(genome_len=genome_len, coverage=coverage,
                   mean_read=mean_read, seed=seed, circular=circular)
    with tempfile.TemporaryDirectory() as td:
        paf = os.path.join(td, "reads.paf")
        write_paf(sim, paf)
        if dropout > 0:
            rng = random.Random(seed)
            kept = [l for l in open(paf) if rng.random() > dropout]
            with open(paf, "w") as f:
                f.writelines(kept)
        gfa = io.StringIO()
        run(paf, Opt(), outfmt="ug", out=gfa)
        gfa_text = gfa.getvalue()
        n_utg = sum(1 for l in gfa_text.splitlines() if l.startswith("S\t"))
        bed_fn = os.path.join(td, "a.bed")
        with open(bed_fn, "w") as f:
            f.write(alines_to_bed(gfa_text))
        truth_fn = os.path.join(td, "truth.paf")
        with open(truth_fn, "w") as f:
            f.write(truth_paf(sim))
        sink = io.StringIO()
        n_err = order_run(bed_fn, truth_fn, sink, ws=5)
        n_pairs = sum(1 for l in gfa_text.splitlines()
                      if l.startswith("a\t"))
    return {"dataset": name, "unitigs": n_utg, "layout_errors": n_err,
            "reads_in_layout": n_pairs}


def main(argv=None):
    if os.environ.get("MINIASM_TPU_PLATFORM"):
        import jax

        jax.config.update("jax_platforms",
                          os.environ["MINIASM_TPU_PLATFORM"])
    argv = list(sys.argv[1:] if argv is None else argv)
    panel = PANEL[:5] if "--quick" in argv else PANEL
    results = []
    for cfg in panel:
        r = run_one(*cfg)
        results.append(r)
        print(json.dumps(r), flush=True)
    single = sum(1 for r in results if r["unitigs"] == 1)
    consistent = sum(1 for r in results if r["layout_errors"] == 0)
    print(json.dumps({"summary": True, "datasets": len(results),
                      "single_contig": single,
                      "layout_consistent": consistent}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
