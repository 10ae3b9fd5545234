"""Deterministic synthetic test-data generator.

The reference's ``make check`` downloads its test FASTQ from bcgsc.ca
(reference Makefile.am:38-39 — a network dependency we cannot keep). Instead
we generate seeded synthetic inputs once, commit them, and generate golden
outputs from a locally built reference binary (tests/golden/regen.sh).

The format matrix mirrors the reference's six-way check (Makefile.am:65-83):
the DNA FASTQ, RNA FASTQ (T->U), FASTA and SAM renderings of the *same* reads
must all produce byte-identical histograms.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

N_READS = 20000
READ_LEN = 100
CONTIG_LEN = 400_000

HERE = Path(__file__).resolve().parent


def make_reads(rng: random.Random):
    """Reads with realistic repeat structure: sampled from a 200kb 'genome'
    so k-mer coverage is non-trivial, plus occasional N's and rare short
    reads."""
    genome = "".join(rng.choice("ACGT") for _ in range(200_000))
    reads = []
    for i in range(N_READS):
        if rng.random() < 0.002:  # occasional sub-k / short read
            ln = rng.randint(0, 15)
        else:
            ln = READ_LEN
        start = rng.randint(0, len(genome) - READ_LEN)
        seq = list(genome[start : start + ln])
        # sequencing 'errors'
        for j in range(len(seq)):
            r = rng.random()
            if r < 0.002:
                seq[j] = "N"
            elif r < 0.01:
                seq[j] = rng.choice("ACGT")
        reads.append("".join(seq))
    return reads


def make_contig(rng: random.Random):
    """One long contig with embedded N runs (chromosome-scale FASTA path:
    exercises chunking + halo)."""
    parts = []
    n = 0
    while n < CONTIG_LEN:
        span = rng.randint(5_000, 40_000)
        parts.append("".join(rng.choice("ACGT") for _ in range(span)))
        n += span
        gap = rng.randint(1, 30)
        parts.append("N" * gap)
        n += gap
    return "".join(parts)


def write_all(outdir: Path):
    rng = random.Random(0xBEEF)
    reads = make_reads(rng)

    with open(outdir / "reads.fq", "w") as f:
        for i, seq in enumerate(reads):
            q = "I" * len(seq)
            f.write(f"@read{i}\n{seq}\n+\n{q}\n")

    with open(outdir / "reads-rna.fq", "w") as f:
        for i, seq in enumerate(reads):
            q = "I" * len(seq)
            f.write(f"@read{i}\n{seq.replace('T', 'U')}\n+\n{q}\n")

    with open(outdir / "reads.fa", "w") as f:
        for i, seq in enumerate(reads):
            f.write(f">read{i}\n")
            # wrap at 60 to exercise multi-line records
            for j in range(0, len(seq), 60):
                f.write(seq[j : j + 60] + "\n")
            if not seq:
                f.write("\n")

    with open(outdir / "reads.sam", "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        f.write("@SQ\tSN:chr1\tLN:200000\n")
        for i, seq in enumerate(reads):
            s = seq if seq else "*"
            q = "I" * len(seq) if seq else "*"
            f.write(f"read{i}\t0\tchr1\t{i + 1}\t60\t*\t*\t0\t0\t{s}\t{q}\n")

    contig = make_contig(random.Random(0xC0FFEE))
    with open(outdir / "contig.fa", "w") as f:
        f.write(">contig1 synthetic\n")
        for j in range(0, len(contig), 70):
            f.write(contig[j : j + 70] + "\n")


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else HERE
    out.mkdir(parents=True, exist_ok=True)
    write_all(out)
    print(f"wrote test data to {out}")
