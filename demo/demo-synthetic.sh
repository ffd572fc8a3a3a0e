#!/bin/sh
# End-to-end demo on synthetic data (equivalent in shape to the reference's
# misc/demo-ecoli-pacbio.sh, which downloads public PacBio E. coli reads —
# not possible in a zero-egress environment).  Simulates a 4.6 Mb genome at
# 40x, assembles, converts unitigs to FASTA, and renders a dot plot.
set -e
# make the in-repo package importable from any working directory
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
DIR=${1:-/tmp/miniasm_tpu_demo}
mkdir -p "$DIR"
python - "$DIR" <<'PY'
import sys
from miniasm_tpu.eval.simulate import simulate, write_paf, write_fasta
d = sys.argv[1]
sim = simulate(genome_len=4_600_000, coverage=40.0, mean_read=9000, seed=11)
write_paf(sim, d + "/reads.paf")
write_fasta(sim, d + "/reads.fa")
PY
python -m miniasm_tpu.cli -f "$DIR/reads.fa" "$DIR/reads.paf" > "$DIR/utg.gfa"
awk '/^S/{print ">"$2"\n"$3}' "$DIR/utg.gfa" > "$DIR/utg.fa"
python -m miniasm_tpu.dotter "$DIR/reads.paf" > "$DIR/dotplot.eps"
echo "contigs:"; grep -c '^S' "$DIR/utg.gfa"
echo "outputs in $DIR"
