"""Shard-count invariance: 1-device and 8-device runs must produce
bit-identical tables, F1 counts and HLL registers (the commutative-fold
guarantee SURVEY.md §4 calls for; the reference cannot test this — it has no
distributed mode)."""

import numpy as np
import pytest

import jax

from ntcard_tpu.io.packing import aligned_stride, pack_records
from ntcard_tpu.models.hll import HllSketch
from ntcard_tpu.models.sketch import CountTableSketch
from ntcard_tpu.parallel.data_parallel import (
    ShardedCountTableSketch,
    ShardedHllSketch,
)
from tests.test_kernel_vs_oracle import random_records

CHUNK, KMAX = 256, 32
STRIDE = aligned_stride(CHUNK, KMAX)


@pytest.fixture(scope="module")
def records():
    return random_records(seed=7, n=400, maxlen=400)


def test_ndev_available():
    assert len(jax.devices()) == 8


def test_sketch_shard_invariance(records):
    ks = (12, 32)
    ref = CountTableSketch(ks, s_bits=7, r_bits=12, stride=STRIDE)
    for b in pack_records(records, CHUNK, 128, KMAX):
        ref.update(b)
    want = ref.finalize(return_table=True)

    sh = ShardedCountTableSketch(ks, s_bits=7, r_bits=12, stride=STRIDE)
    for b in pack_records(records, CHUNK, 128 * sh.n_dev, KMAX):
        sh.update(b)
    got = sh.finalize(return_table=True)

    for k in ks:
        assert got[k]["f1"] == want[k]["f1"]
        np.testing.assert_array_equal(got[k]["table"], want[k]["table"])


def test_sketch_shard_invariance_gap(records):
    gap = (5, 6)
    ref = CountTableSketch((12,), 7, 12, STRIDE, gap_positions=gap)
    for b in pack_records(records, CHUNK, 128, KMAX):
        ref.update(b)
    want = ref.finalize(return_table=True)

    sh = ShardedCountTableSketch((12,), 7, 12, STRIDE, gap_positions=gap)
    for b in pack_records(records, CHUNK, 128 * sh.n_dev, KMAX):
        sh.update(b)
    got = sh.finalize(return_table=True)
    assert got[12]["f1"] == want[12]["f1"]
    np.testing.assert_array_equal(got[12]["table"], want[12]["table"])


def test_hll_shard_invariance(records):
    ref = HllSketch(25, 10, STRIDE)
    for b in pack_records(records, CHUNK, 128, KMAX):
        ref.update(b)
    want = ref.registers()

    sh = ShardedHllSketch(25, 10, STRIDE)
    for b in pack_records(records, CHUNK, 128 * sh.n_dev, KMAX):
        sh.update(b)
    np.testing.assert_array_equal(sh.registers(), want)


def test_record_order_invariance(records):
    """Shuffling record order changes packing boundaries but must not change
    the table: the sketch counts the same multiset of windows (the
    shard-permutation property SURVEY.md §5 calls for)."""
    import random as _random

    ks = (12, 32)
    a = CountTableSketch(ks, 7, 12, STRIDE)
    for b in pack_records(records, CHUNK, 128, KMAX):
        a.update(b)
    want = a.finalize(return_table=True)

    shuffled = list(records)
    _random.Random(123).shuffle(shuffled)
    b_ = CountTableSketch(ks, 7, 12, STRIDE)
    for b in pack_records(shuffled, CHUNK, 128, KMAX):
        b_.update(b)
    got = b_.finalize(return_table=True)
    for k in ks:
        assert got[k]["f1"] == want[k]["f1"]
        np.testing.assert_array_equal(got[k]["table"], want[k]["table"])
