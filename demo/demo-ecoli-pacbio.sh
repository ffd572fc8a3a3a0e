#!/bin/sh
# Real-data demo, mirroring the reference misc/demo-ecoli-pacbio.sh.
# Requires network access and minimap2 on PATH; in an offline
# environment use demo/demo-synthetic.sh, which exercises the same
# pipeline on simulator data shaped like this dataset.
set -e
DIR=${1:-ecoli_demo}; mkdir -p "$DIR"; cd "$DIR"
URL=http://www.cbcb.umd.edu/software/PBcR/data/selfSampleData.tar.gz
[ -f reads.fa ] || wget -O- $URL | tar zxf - || {
    echo "download failed (offline?): run demo/demo-synthetic.sh instead" >&2
    exit 1
}
[ -e reads.fq ] || ln -s selfSampleData/pacbio_filtered.fastq reads.fq
minimap2 -x ava-pb -t8 reads.fq reads.fq 2> minimap.log | gzip -1 > reads.paf.gz
python -m miniasm_tpu.cli -f reads.fq reads.paf.gz > utg.gfa
awk '/^S/{print ">"$2"\n"$3}' utg.gfa > utg.fa
