#!/bin/sh
# Real-data acceptance demo, mirroring the reference
# misc/demo-ecoli-pacbio.sh:1-26 (fetch PacBio reads -> minimap2 ava-pb
# -> layout -f -> unitig FASTA).  BASELINE configs[0].
#
# Drop-in friendly for offline environments: if reads.fq (or reads.fa)
# and/or reads.paf.gz already exist in the target directory, the
# download/overlap steps are skipped and the layout runs on the local
# files unmodified — the day this box gets the data, this IS the
# acceptance test.  When the reference sources are available the script
# also builds lh3/miniasm and byte-compares the two GFAs.
#
# In a zero-egress environment with no local data, run
# demo/demo-synthetic.sh instead (same pipeline on simulator data
# shaped like this dataset).
set -e
# make the in-repo package importable from any working directory
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
DIR=${1:-ecoli_demo}; mkdir -p "$DIR"; cd "$DIR"

# --- reads (download only when absent) ---
if [ ! -f reads.fq ] && [ ! -f reads.fa ]; then
    URL=http://www.cbcb.umd.edu/software/PBcR/data/selfSampleData.tar.gz
    wget -O- $URL | tar zxf - || {
        echo "download failed (offline?): drop reads.fq / reads.paf.gz" \
             "into $PWD or run demo/demo-synthetic.sh instead" >&2
        exit 1
    }
    ln -s selfSampleData/pacbio_filtered.fastq reads.fq
fi
[ -f reads.fq ] && READS=reads.fq || READS=reads.fa

# --- overlaps (minimap2 only when absent) ---
if [ ! -f reads.paf.gz ]; then
    command -v minimap2 >/dev/null || {
        echo "minimap2 not on PATH and no reads.paf.gz present" >&2
        exit 1
    }
    minimap2 -x ava-pb -t8 $READS $READS 2> minimap.log \
        | gzip -1 > reads.paf.gz
fi

# --- layout (ours) ---
python -m miniasm_tpu.cli -f $READS reads.paf.gz > utg.gfa 2> utg.gfa.log
awk '/^S/{print ">"$2"\n"$3}' utg.gfa > utg.fa
python - utg.gfa <<'EOF'
import sys

lens = sorted((len(l.split("\t")[2]) for l in open(sys.argv[1])
               if l.startswith("S\t")), reverse=True)
t, c, n50 = sum(lens), 0, 0
for x in lens:
    c += x
    if c >= t / 2:
        n50 = x
        break
print("unitigs=%d total_bp=%d N50=%d" % (len(lens), t, n50))
EOF

# --- reference byte-parity (when the reference sources are reachable) ---
REF_SRC=${MINIASM_REF_SRC:-/root/reference}
if [ -d "$REF_SRC" ] && [ -f "$REF_SRC/main.c" ]; then
    mkdir -p ref_build
    cp "$REF_SRC"/*.c "$REF_SRC"/*.h "$REF_SRC"/Makefile ref_build/ 2>/dev/null
    ( cd ref_build && make -s -j4 ) 2> ref_build.log || true
    if [ -x ref_build/miniasm ]; then
        ./ref_build/miniasm -f $READS reads.paf.gz > utg.ref.gfa 2>/dev/null
        if cmp -s utg.gfa utg.ref.gfa; then
            echo "BYTE-IDENTICAL to reference miniasm"
        else
            echo "MISMATCH vs reference miniasm (utg.gfa vs utg.ref.gfa)" >&2
            exit 1
        fi
    fi
fi
