"""The five hash invariants of the reference unit tests
(vendor/ntHash/unittest/UnitTests.cpp:23-133), against the Python oracle."""

import random

from ntcard_tpu.ops import nthash_ref as R

KMER = "ACGTACACTGGACTGAGTCT"
# Hard-coded regression values from UnitTests.cpp:48 — the cheapest possible
# cross-implementation check.
EXPECTED = [10434435546371013747, 16073887395445158014, 8061578976118370557]


def test_invariant_hash_values():
    h = R.ntc64(R.seq_to_codes(KMER), 20)
    assert R.multi_hashes(h, 20, 3) == EXPECTED


def test_reverse_complement():
    rc = "AGACTCAGTCCAGTGTACGT"
    k = 20
    assert R.ntc64(R.seq_to_codes(KMER), k) == R.ntc64(R.seq_to_codes(rc), k)


def test_rolling_equals_from_scratch():
    random.seed(1)
    for _ in range(20):
        n = random.randint(1, 120)
        seq = "".join(random.choice("ACGTN") for _ in range(n))
        for k in (1, 2, 5, 18, 31, 33, 64, 97):
            assert R.kmer_hashes(seq, k) == R.kmer_hashes_rolling(seq, k), (seq, k)


def test_rna_equals_dna():
    rna = KMER.replace("T", "U")
    assert R.ntc64(R.seq_to_codes(rna), 20) == R.ntc64(R.seq_to_codes(KMER), 20)
    lower = KMER.lower()
    assert R.ntc64(R.seq_to_codes(lower), 20) == R.ntc64(R.seq_to_codes(KMER), 20)


def test_spaced_seed_invariance_under_masked_mutation():
    seed = "11111100000000111111"
    mask = R.parse_seed([seed])[0]
    k = len(seed)
    base = R.masked_hash(R.seq_to_codes(KMER), k, mask)
    for mutant in (
        "ACGTACACTTGACTGAGTCT",
        "ACGTACACTGTACTGAGTCT",
        "ACGTACACTGCACTGAGTCT",
    ):
        assert R.masked_hash(R.seq_to_codes(mutant), k, mask) == base


def test_multi_hash_derivation():
    # NTE64 self-consistency: h0 unchanged, extra hashes deterministic.
    h = R.ntc64(R.seq_to_codes(KMER), 20)
    m = R.multi_hashes(h, 20, 5)
    assert m[0] == h
    assert len(set(m)) == 5


def test_device_multi_hash_matches_oracle():
    """NTM64/NTE64 derivation on (hi, lo) uint32 pairs == scalar oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ntcard_tpu.ops.nthash import multi_hashes as dev_mh

    rng = np.random.default_rng(2)
    hs = rng.integers(0, 1 << 64, size=100, dtype=np.uint64)
    k, m = 33, 5
    hi = jnp.asarray((hs >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((hs & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    dev = jax.jit(lambda a, b: dev_mh(a, b, k, m))(hi, lo)
    for idx, (dh, dl) in enumerate(dev):
        got = (np.asarray(dh).astype(np.uint64) << np.uint64(32)) | np.asarray(dl).astype(
            np.uint64
        )
        want = np.array([R.multi_hashes(int(h), k, m)[idx] for h in hs], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)
