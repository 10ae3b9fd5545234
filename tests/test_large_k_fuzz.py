"""Large-k and geometry fuzz: kernel vs scalar oracle with meaningful
window coverage (low N rate so long windows survive)."""

import random

import pytest

from tests.test_kernel_vs_oracle import kernel_hash_multiset, oracle_hash_multiset


def records_low_n(seed, n, maxlen, n_rate=0.005):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randint(0, maxlen)
        out.append(
            "".join(
                "N" if rng.random() < n_rate else rng.choice("ACGT") for _ in range(ln)
            ).encode()
        )
    return out


@pytest.mark.parametrize(
    "seed,k,n,maxlen,chunk,rows",
    [
        (9, 31, 30, 400, 512, 128),
        (13, 64, 25, 400, 1024, 128),
        (17, 96, 15, 600, 1024, 128),
        (21, 144, 10, 900, 2048, 128),
        (25, 33, 40, 200, 256, 256),
    ],
)
def test_large_k(seed, k, n, maxlen, chunk, rows):
    recs = records_low_n(seed, n, maxlen)
    want, wn = oracle_hash_multiset(recs, k)
    got, gn = kernel_hash_multiset(recs, k, chunk_len=chunk, batch_rows=rows, kmax=k)
    assert wn > 500, f"weak coverage: {wn}"
    assert gn == wn
    assert got == want
