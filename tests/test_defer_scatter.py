"""Scatter deferral (models/sketch._update_defer/_flush_scatter): the
big-table sparse path may accumulate S batches' compacted buffers and apply
them in one scatter per k — the GiB-operand XLA scatter costs ~11.6 ms
FIXED per op nearly independent of element count (measured on chip), so
deferral reclaims (S-1)/S of the per-batch scatter stage. These tests pin
the bit-identity contract on the CPU mesh (Pallas interpreter), including
non-power-of-two tails, overflow replay interplay, save/merge mid-stream
with pending buffers, and the chains engine."""

import numpy as np
import pytest

from ntcard_tpu.io.packing import aligned_stride, pack_records
from ntcard_tpu.models.sketch import ChainedCountTableSketch, CountTableSketch

K = 8
S_BITS = 7
R_BITS = 18  # > 17: the compact (big-table) path
CHUNK, ROWS = 128, 128
STRIDE = aligned_stride(CHUNK, K)


@pytest.fixture(autouse=True)
def _sparse_interpret(monkeypatch):
    """Force the sparse path via the Pallas interpreter — and clear the jit
    cache on BOTH sides: _update*'s traces bake the NTCARD_SCATTER mode in,
    and this file's geometry (deliberately the same as the overflow tests')
    would otherwise poison later env-default tests' cache hits."""
    import jax

    jax.clear_caches()
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    yield
    jax.clear_caches()


def _records(n=40, seed=3):
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    return [bytes(rng.choice(alphabet, size=200)) for _ in range(n)]


def _run(records, monkeypatch, defer, sketch_cls=CountTableSketch, ks=(K,)):
    monkeypatch.setenv("NTCARD_SCATTER_DEFER", str(defer))
    sk = sketch_cls(ks, S_BITS, R_BITS, STRIDE)
    for b in pack_records(records, CHUNK, ROWS, max(ks)):
        sk.update(b)
    state = sk.finalize(return_table=True)
    return sk, state


def _assert_state_equal(a, b, ks=(K,)):
    for k in ks:
        np.testing.assert_array_equal(a[k]["table"], b[k]["table"])
        np.testing.assert_array_equal(a[k]["hist"], b[k]["hist"])
        assert a[k]["f1"] == b[k]["f1"]


def test_defer_bit_exact_nonpow2_tail(monkeypatch):
    """7 post-first batches at defer=3: one mid-stream flush (3) plus a
    greedy 2+1+1 tail at finalize — table/hist/f1 all equal defer=0."""
    recs = _records(n=448)  # 7 post-first batches at this geometry
    _, base = _run(recs, monkeypatch, defer=0)
    sk, deferred = _run(recs, monkeypatch, defer=3)
    assert not sk._defer_vals  # finalize settled everything
    _assert_state_equal(base, deferred)


def test_defer_multik(monkeypatch):
    recs = _records(n=320, seed=11)
    ks = (8, 12)
    _, base = _run(recs, monkeypatch, defer=0, ks=ks)
    _, deferred = _run(recs, monkeypatch, defer=4, ks=ks)
    _assert_state_equal(base, deferred, ks=ks)


def test_defer_with_overflow_replay(monkeypatch):
    """A cap-overflowing repeat batch rides the all-or-nothing mask and the
    deferred host replay exactly as on the direct path."""
    from tests.test_overflow_replay import _overflow_records

    recs = _overflow_records()
    sk0, base = _run(recs, monkeypatch, defer=0)
    skd, deferred = _run(recs, monkeypatch, defer=4)
    assert skd.replays >= 1  # the overflow actually happened
    assert skd.replays == sk0.replays
    _assert_state_equal(base, deferred)


def test_defer_save_mid_stream(monkeypatch, tmp_path):
    """save() with pending buffers flushes first; the checkpoint equals a
    defer=0 checkpoint of the same prefix."""
    recs = _records(n=384, seed=5)
    batches = list(pack_records(recs, CHUNK, ROWS, K))

    def partial_save(defer):
        monkeypatch.setenv("NTCARD_SCATTER_DEFER", str(defer))
        sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
        for b in batches:
            sk.update(b)
        p = tmp_path / f"s{defer}.npz"
        sk.save(str(p))  # pending buffers must flush into the tables
        return np.load(p)

    a, b = partial_save(0), partial_save(4)
    np.testing.assert_array_equal(a["tables"], b["tables"])
    np.testing.assert_array_equal(a["f1s"], b["f1s"])


def test_defer_chains_engine(monkeypatch):
    """ChainedCountTableSketch round-robins batches over chains, each with
    its own pending window; merged finalize equals the unchained run."""
    recs = _records(n=448, seed=9)
    _, base = _run(recs, monkeypatch, defer=0)
    _, deferred = _run(
        recs, monkeypatch, defer=2, sketch_cls=ChainedCountTableSketch
    )
    _assert_state_equal(base, deferred)


def test_defer_merge_mid_stream(monkeypatch):
    """merge_ of two sketches with pending buffers on both sides."""
    recs_a = _records(n=320, seed=21)
    recs_b = _records(n=320, seed=22)
    monkeypatch.setenv("NTCARD_SCATTER_DEFER", "0")
    ref = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
    for b in pack_records(recs_a + recs_b, CHUNK, ROWS, K):
        ref.update(b)
    base = ref.finalize(return_table=True)

    monkeypatch.setenv("NTCARD_SCATTER_DEFER", "4")
    sa = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
    for b in pack_records(recs_a, CHUNK, ROWS, K):
        sa.update(b)
    sb = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
    for b in pack_records(recs_b, CHUNK, ROWS, K):
        sb.update(b)
    sa.merge_(sb)
    merged = sa.finalize(return_table=True)
    np.testing.assert_array_equal(base[K]["table"], merged[K]["table"])
    assert base[K]["f1"] == merged[K]["f1"]


def test_defer_engages_and_flushes(monkeypatch):
    """Deferral must actually engage FROM BATCH 1 (round 5: the first batch
    defers too, and the tables allocate inside the first flush —
    _flush_scatter_first — so the cold path loads one update program, not
    two) and flush exactly at the window size — guards against a silent
    fallthrough to the direct path that would make every test above
    vacuous."""
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    monkeypatch.setenv("NTCARD_SCATTER_DEFER", "2")
    sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE)
    batches = list(pack_records(_records(n=256, seed=1), CHUNK, ROWS, K))
    assert len(batches) >= 4
    sk.update(batches[0])  # defers immediately; tables still unallocated
    assert len(sk._defer_vals) == 1
    assert sk._tables is None
    sk.update(batches[1])  # window of 2 reached: first flush allocates
    assert sk._defer_vals == []
    assert sk._tables is not None
    sk.update(batches[2])
    assert len(sk._defer_vals) == 1
    sk.update(batches[3])  # second flush goes through plain _flush_scatter
    assert sk._defer_vals == []


def test_defer_gap_seed(monkeypatch):
    """Spaced-seed (gap) runs defer through the same compact path."""
    recs = _records(n=320, seed=33)
    gap = (3, 4)  # positions masked out of the 8-mer
    monkeypatch.setenv("NTCARD_SCATTER_DEFER", "0")
    ref = CountTableSketch((K,), S_BITS, R_BITS, STRIDE, gap_positions=gap)
    for b in pack_records(recs, CHUNK, ROWS, K):
        ref.update(b)
    base = ref.finalize(return_table=True)
    monkeypatch.setenv("NTCARD_SCATTER_DEFER", "4")
    sk = CountTableSketch((K,), S_BITS, R_BITS, STRIDE, gap_positions=gap)
    for b in pack_records(recs, CHUNK, ROWS, K):
        sk.update(b)
    got = sk.finalize(return_table=True)
    np.testing.assert_array_equal(base[K]["table"], got[K]["table"])
    assert base[K]["f1"] == got[K]["f1"]
