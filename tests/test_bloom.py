"""models/bloom.BloomFilter — the ntHash multi-hash consumer surface
(reference vendor/ntHash/lib/BloomFilter.hpp + nttest FPR sweeps)."""

import numpy as np
import pytest

from ntcard_tpu.io.packing import aligned_stride, pack_records
from ntcard_tpu.models.bloom import BloomFilter

CHUNK, K = 192, 25
STRIDE = aligned_stride(CHUNK, K)


def _batches(records):
    return list(pack_records(records, CHUNK, 128, K))


def test_no_false_negatives_and_fpr():
    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    ins = [bytes(rng.choice(alphabet, size=300)) for _ in range(40)]
    absent = [bytes(rng.choice(alphabet, size=300)) for _ in range(40)]

    bf = BloomFilter(K, m_bits=18, n_hashes=3)
    n = sum(bf.insert_batch(b, STRIDE) for b in _batches(ins))
    assert n == bf.n_inserted > 5000

    # every inserted k-mer must be found (no false negatives)
    for b in _batches(ins):
        present, valid = bf.contains_batch(b, STRIDE)
        np.testing.assert_array_equal(present[valid], True)

    # absent k-mers: FPR within a loose band of theory
    fp = tot = 0
    for b in _batches(absent):
        present, valid = bf.contains_batch(b, STRIDE)
        fp += int(present[valid].sum())
        tot += int(valid.sum())
    theo = bf.fpr_theory()
    assert 0 < theo < 0.2
    assert fp / tot < 4 * theo + 0.01


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    recs = [bytes(rng.choice(alphabet, size=280)) for _ in range(10)]
    bf = BloomFilter(K, m_bits=14, n_hashes=2)
    for b in _batches(recs):
        bf.insert_batch(b, STRIDE)
    p = str(tmp_path / "bf.npz")
    bf.save(p)
    bf2 = BloomFilter.load(p)
    assert bf2.n_inserted == bf.n_inserted
    for b in _batches(recs):
        a, _ = bf.contains_batch(b, STRIDE)
        c, _ = bf2.contains_batch(b, STRIDE)
        np.testing.assert_array_equal(a, c)


def test_validation():
    with pytest.raises(ValueError):
        BloomFilter(25, m_bits=31)
    with pytest.raises(ValueError):
        BloomFilter(25, m_bits=16, n_hashes=0)
