#!/bin/bash
# Regenerate golden outputs from a locally-built reference binary.
#
# Build the reference first (any scratch dir):
#   g++ -O3 -fopenmp -I$REF -I$REF/Common -I$REF/vendor -I$REF/vendor/ntHash \
#       -o ntcard $REF/ntcard.cpp $REF/Common/{Uncompress,Fcontrol,SignalHandler}.cpp -ldl
#   (same for nthll.cpp)
# then: REF_NTCARD=/path/to/ntcard REF_NTHLL=/path/to/nthll bash regen.sh
#
# All runs use -r 16 (hidden --rbit flag, ntcard.cpp:77) so reference table
# scans stay fast; -s is irrelevant (forced to 7 for <50GB inputs,
# ntcard.cpp:430-431). Golden matrix follows the reference's six-way
# make check (Makefile.am:65-83) plus multi-k, long-contig, compact-TSV and
# nthll cases.
set -euo pipefail
cd "$(dirname "$0")"
DATA=../data
NTCARD=${REF_NTCARD:?set REF_NTCARD}
NTHLL=${REF_NTHLL:?set REF_NTHLL}
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

run() { (cd "$TMP" && "$@"); }

# 1. k=12 plain, c=1000: DNA fastq (rna-fastq/fasta/sam must byte-match this)
run $NTCARD -k12 -c1000 -r16 -p t "$PWD/$DATA/reads.fq" 2>/dev/null
cp "$TMP/t_k12.hist" reads_k12.hist.good

# 2. k=12 gap seed g=2
run $NTCARD -k12 -c1000 -r16 -g2 -p t "$PWD/$DATA/reads.fq" 2>/dev/null
cp "$TMP/t_k12.hist" reads-gap_k12.hist.good

# 3. multi-k k=32,64,96 c=64
run $NTCARD -k32,64,96 -c64 -r16 -p m "$PWD/$DATA/reads.fq" 2>/dev/null
cp "$TMP/m_k32.hist" reads_k32.hist.good
cp "$TMP/m_k64.hist" reads_k64.hist.good
cp "$TMP/m_k96.hist" reads_k96.hist.good

# 4. long contig FASTA, k=25 and k=96 (chunk/halo path)
run $NTCARD -k25,96 -c64 -r16 -p c "$PWD/$DATA/contig.fa" 2>/dev/null
cp "$TMP/c_k25.hist" contig_k25.hist.good
cp "$TMP/c_k96.hist" contig_k96.hist.good

# 5. compact TSV (-o) k=12,32: file + per-k F1/F0 stderr lines
run $NTCARD -k12,32 -c64 -r16 -o out.tsv "$PWD/$DATA/reads.fq" \
    2> >(grep $'^k=' > "$TMP/compact.err") || true
wait
cp "$TMP/out.tsv" reads_compact.tsv.good
cp "$TMP/compact.err" reads_compact.stderr.good

# 6. two input files at once (multi-file accumulation), k=12
run $NTCARD -k12 -c1000 -r16 -p b "$PWD/$DATA/reads.fq" "$PWD/$DATA/contig.fa" 2>/dev/null
cp "$TMP/b_k12.hist" both_k12.hist.good

# 7. nthll F0 (stdout), k=25 default 16-bit registers
run $NTHLL -k25 "$PWD/$DATA/reads.fq" > nthll_k25.out.good 2>/dev/null

# 8. DEFAULT rBits=27 (no -r flag; ntcard.cpp:60) — the configuration every
# real user runs; exercises the 2^27-bucket table + finalize path. Slow for
# the reference (~2.5 s: 1 GiB table alloc + 2*2^27 scan).
run $NTCARD -k12 -c1000 -p d "$PWD/$DATA/reads.fq" 2>/dev/null
cp "$TMP/d_k12.hist" reads_r27_k12.hist.good

echo "goldens regenerated"
