"""Compaction-overflow exactness (models/sketch.py deferred replay + drain).

The sparse big-table update compacts sampled emit indices into a cap-sized
buffer; a repeat-heavy batch (telomeric/centromeric-style periodic content
whose few distinct k-mers pass the sample test) overflows any cap. The hot
path then applies the batch all-or-nothing and recovery runs either as a
deferred host replay (single-device, models/sketch._replay_update) or as the
in-program rank-window drain (sharded, models/sketch._drain_windows). Both
must be bit-identical to the plain-scatter run. The reference never faces
this (direct uint16 increments, ntcard.cpp:437-439); the contract under test
is OUR bit-identity guarantee for every input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntcard_tpu.io.packing import aligned_stride, pack_records
from ntcard_tpu.models.sketch import CountTableSketch
from ntcard_tpu.ops import nthash_ref as R

K = 8
S_BITS = 7
R_BITS = 18  # > 17: the compact (big-table) path
CHUNK, ROWS = 128, 128
STRIDE = aligned_stride(CHUNK, K)  # cap = max(ROWS*STRIDE//64, 128) -> 256


def _sampled_kmer() -> bytes:
    """Brute-force an 8-mer whose canonical hash passes the ntcard sample
    test (rate ~1.17% at sBits=7) — deterministic, oracle-driven."""
    rng = np.random.default_rng(99)
    smask = (1 << (S_BITS - 1)) - 1
    while True:
        s = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=K))
        h = R.ntc64(R.seq_to_codes(s), K)
        hi = h >> 32
        if (hi >> (31 - S_BITS)) == 1 or (hi >> (32 - S_BITS)) == smask:
            return s


def _overflow_records():
    """One long periodic record: every k-aligned window is the sampled
    k-mer, so sampled windows far exceed the compaction cap (128 slots at
    this geometry), plus some random records for table variety."""
    rng = np.random.default_rng(7)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    kmer = _sampled_kmer()
    recs = [kmer * 600]  # ~600 sampled k-aligned windows > cap=256
    recs += [bytes(rng.choice(alphabet, size=200)) for _ in range(20)]
    return recs


def _run(records, sketch=None):
    sk = sketch or CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
    for b in pack_records(records, CHUNK, ROWS, K):
        sk.update(b)
    state = sk.finalize(return_table=True)
    return sk, state


@pytest.fixture(scope="module")
def baseline():
    # NTCARD_SCATTER unset -> plain XLA scatter on CPU (exact by definition)
    _sk, state = _run(_overflow_records())
    return state


def test_deferred_replay_bitexact(monkeypatch, baseline):
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    jax.clear_caches()
    try:
        sk, state = _run(_overflow_records())
    finally:
        jax.clear_caches()
    assert sk.replays >= 1  # the overflow actually happened and was replayed
    np.testing.assert_array_equal(state[K]["table"], baseline[K]["table"])
    assert state[K]["f1"] == baseline[K]["f1"]
    np.testing.assert_array_equal(state[K]["hist"], baseline[K]["hist"])


def test_deferred_replay_flush_on_save(monkeypatch, baseline, tmp_path):
    """save() must settle pending replays (a checkpoint mid-stream would
    otherwise silently miss the overflowed batch's counts)."""
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    monkeypatch.setenv("NTCARD_REPLAY_LAG", "64")  # keep everything pending
    jax.clear_caches()
    try:
        sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(_overflow_records(), CHUNK, ROWS, K):
            sk.update(b)
        assert sk._pending  # nothing reaped yet
        p = str(tmp_path / "ck.npz")
        sk.save(p)
        state = CountTableSketch.load(p).finalize(return_table=True)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(state[K]["table"], baseline[K]["table"])
    assert state[K]["f1"] == baseline[K]["f1"]


def test_sharded_replay_bitexact(monkeypatch, baseline):
    """The sharded sketch's deferred replay (masked per-(shard, k) sharded
    full scatter, parallel/data_parallel._replay_sharded) on the same
    overflowing stream — bit-identical to the plain single-device run."""
    from ntcard_tpu.parallel.data_parallel import ShardedCountTableSketch

    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    jax.clear_caches()
    try:
        sh = ShardedCountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(_overflow_records(), CHUNK, ROWS * sh.n_dev, K):
            sh.update(b)
        state = sh.finalize(return_table=True)
    finally:
        jax.clear_caches()
    assert sh.replays >= 1
    np.testing.assert_array_equal(state[K]["table"], baseline[K]["table"])
    assert state[K]["f1"] == baseline[K]["f1"]


def test_superbatch_stack_replay_bitexact(monkeypatch, baseline):
    """Overflow inside a [n, rows, width] superbatch stack: flags come back
    per sub-batch and the replay re-applies the exact offending wire."""
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    jax.clear_caches()
    try:
        sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        batches = list(pack_records(_overflow_records(), CHUNK, ROWS, K))
        i = 0
        while i < len(batches):
            stack = batches[i : i + 2]
            if len(stack) == 2:
                sk.update(np.stack(stack))
            else:
                sk.update(stack[0])
            i += 2
        state = sk.finalize(return_table=True)
    finally:
        jax.clear_caches()
    assert sk.replays >= 1
    np.testing.assert_array_equal(state[K]["table"], baseline[K]["table"])
    assert state[K]["f1"] == baseline[K]["f1"]


def test_fused_finalize_replay_bitexact(monkeypatch, baseline):
    """The fused one-fetch finalize (_finalize_bundle) with a REAL pending
    overflow: the flush must fire from the bundled overflow count
    (known_count) and the recomputed hists must match the plain run."""
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    monkeypatch.setenv("NTCARD_FINALIZE", "fused")
    monkeypatch.setenv("NTCARD_REPLAY_LAG", "64")  # keep everything pending
    jax.clear_caches()
    try:
        sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(_overflow_records(), CHUNK, ROWS, K):
            sk.update(b)
        assert sk._pending  # finalize itself must settle the replays
        state = sk.finalize(cov_max=1000)
        monkeypatch.setenv("NTCARD_FINALIZE", "unfused")
        # construct the baseline AFTER dropping the trace-time knob: a
        # sketch built under pallas-interpret decides defer-on at
        # construction, and (round 5) even batch 1 would then trace
        # _update_defer under the since-changed env — the documented
        # trace-time-knob caveat, managed here like everywhere else
        monkeypatch.delenv("NTCARD_SCATTER")
        jax.clear_caches()
        base = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(_overflow_records(), CHUNK, ROWS, K):
            base.update(b)
        base_state = base.finalize(cov_max=1000)
    finally:
        jax.clear_caches()
    assert sk.replays >= 1
    np.testing.assert_array_equal(state[K]["hist"], base_state[K]["hist"])
    assert state[K]["f1"] == base_state[K]["f1"]


def test_fused_finalize_matches_unfused_random(monkeypatch):
    """No-overflow case: fused and unfused finalize agree bit-for-bit
    (hists, F1) on random content at the big-table geometry."""
    rng = np.random.default_rng(5)
    alphabet = np.frombuffer(b"ACGTN", np.uint8)
    recs = [bytes(rng.choice(alphabet, size=int(rng.integers(10, 300)))) for _ in range(60)]
    monkeypatch.setenv("NTCARD_FINALIZE", "fused")
    jax.clear_caches()
    try:
        sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(recs, CHUNK, ROWS, K):
            sk.update(b)
        fused = sk.finalize(cov_max=200)
        monkeypatch.setenv("NTCARD_FINALIZE", "unfused")
        sk2 = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in pack_records(recs, CHUNK, ROWS, K):
            sk2.update(b)
        unfused = sk2.finalize(cov_max=200)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(fused[K]["hist"], unfused[K]["hist"])
    assert fused[K]["f1"] == unfused[K]["f1"]
