"""Correctness of the sparse count-table update (ops/scatter_pallas.py).

The Pallas kernels run through the interpreter here (no TPU in CI); the
contract under test is bit-identity with the plain XLA scatter-add for
every input, including the density-guard fallback paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ntcard_tpu.models import sketch as sketch_mod
from ntcard_tpu.ops.scatter_pallas import compact_pallas, hist_add_pallas


@pytest.mark.parametrize("shape", [(16, 1024), (8, 640), (40, 96)])
def test_hist_add_matches_bincount(shape):
    rng = np.random.default_rng(1)
    r_bits = 10
    r_buck = 1 << r_bits
    sent = 2 * r_buck
    n = int(np.prod(shape))
    idx = np.full(n, sent, np.int32)
    m = rng.random(n) < 0.01
    idx[m] = rng.integers(0, 2 * r_buck, m.sum())
    idx = idx.reshape(shape)
    got = np.asarray(
        hist_add_pallas(jnp.asarray(idx), r_bits, interpret=True, block_rows=16)
    )
    want = np.bincount(idx.ravel()[idx.ravel() != sent], minlength=2 * r_buck + 1)
    # the sentinel dump bin is not maintained by the sparse kernel (never read)
    np.testing.assert_array_equal(got[: 2 * r_buck], want[: 2 * r_buck])


@pytest.mark.parametrize("shape", [(16, 1024), (8, 640), (40, 96)])
def test_compact_matches_nonsentinel_multiset(shape):
    rng = np.random.default_rng(2)
    sent = 1 << 28  # values beyond the 18-bit hist packing: compact is universal
    n = int(np.prod(shape))
    idx = np.full(n, sent, np.int32)
    m = rng.random(n) < 0.01
    idx[m] = rng.integers(0, sent, m.sum())
    idx = idx.reshape(shape)
    vals, cnt = compact_pallas(jnp.asarray(idx), sent, 256, interpret=True, block_rows=16)
    vals = np.asarray(vals)
    assert int(cnt) == m.sum()
    np.testing.assert_array_equal(
        np.sort(vals[vals >= 0]), np.sort(idx.ravel()[idx.ravel() != sent])
    )


@pytest.mark.parametrize("shape", [(16, 1024), (40, 96)])
def test_compact_packed2_matches_full(shape):
    """The packed2 extractor (value split across two independent pos-keyed
    reductions) must produce the same compacted multiset as the
    reduce-then-fetch extractor, including values near int32 max."""
    rng = np.random.default_rng(5)
    sent = (1 << 31) - 2  # values may use all 31 payload bits
    n = int(np.prod(shape))
    idx = np.full(n, sent, np.int32)
    m = rng.random(n) < 0.01  # keep the count under cap (256)
    idx[m] = rng.integers(0, sent, m.sum())
    idx = idx.reshape(shape)
    vals, cnt = compact_pallas(
        jnp.asarray(idx), sent, 256, interpret=True, block_rows=16, packed2=True
    )
    vals = np.asarray(vals)
    assert int(cnt) == m.sum()
    np.testing.assert_array_equal(
        np.sort(vals[vals >= 0]), np.sort(idx.ravel()[idx.ravel() != sent])
    )


def test_compact_packed2_full_range_edge():
    """An element whose packed-A encoding is exactly 2^31 - 1 (window
    position 8191, low 18 bits all ones) must survive — an ascending
    extraction would confuse it with the exhaustion sentinel."""
    sent = (1 << 31) - 2
    idx = np.full((16, 1024), sent, np.int32)
    edge = 0x3FFFF | (7 << 18)  # low 18 bits all ones
    idx.ravel()[8191] = edge  # last position of window 0
    idx.ravel()[0] = 5
    vals, cnt = compact_pallas(
        jnp.asarray(idx), sent, 256, interpret=True, block_rows=16, packed2=True
    )
    vals = np.asarray(vals)
    assert int(cnt) == 2
    np.testing.assert_array_equal(np.sort(vals[vals >= 0]), np.sort([5, edge]))


def test_compact_overflow_reports_true_count():
    rng = np.random.default_rng(3)
    sent = 1 << 20
    idx = rng.integers(0, sent, (16, 64)).astype(np.int32)  # 1024 > cap
    vals, cnt = compact_pallas(jnp.asarray(idx), sent, 256, interpret=True, block_rows=16)
    assert int(cnt) == 1024


def _run_updates(codes_batches, ks, s_bits, r_bits, stride):
    sk = sketch_mod.CountTableSketch(ks, s_bits, r_bits, stride)
    for c in codes_batches:
        sk.update(c)
    # raw .tables read: settle any pending scatter-deferral buffers first
    # (finalize/save/merge do this themselves; this helper bypasses them)
    sk._flush_deferred()
    tables = np.asarray(sk.tables)
    f1s = [int(x) for x in sk._f1_totals()]
    return tables, f1s


@pytest.mark.parametrize(
    "s_bits,r_bits",
    [
        (7, 10),  # sparse density -> hist kernel path
        (1, 10),  # 75% density -> density guard falls back to XLA scatter
        (7, 18),  # table too big for the hist packing -> compact+scatter path
        (6, 19),  # multi-k big-table -> combined flat-offset compact path
    ],
)
def test_update_sparse_path_bitexact(monkeypatch, s_bits, r_bits):
    rng = np.random.default_rng(4)
    ks = (8, 12)
    stride = 120
    batches = [
        jnp.asarray(rng.integers(0, 5, (16, 128), dtype=np.uint8)) for _ in range(2)
    ]

    monkeypatch.delenv("NTCARD_SCATTER", raising=False)
    base_t, base_f1 = _run_updates(batches, ks, s_bits, r_bits, stride)

    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    jax.clear_caches()  # _update's trace bakes in the mode
    try:
        got_t, got_f1 = _run_updates(batches, ks, s_bits, r_bits, stride)
    finally:
        monkeypatch.delenv("NTCARD_SCATTER", raising=False)
        jax.clear_caches()

    r_buck = 1 << r_bits
    # dump row (sentinel bin) is not maintained by the sparse path; the
    # product never reads it (models/sketch.finalize slices it off)
    np.testing.assert_array_equal(got_t[:, : 2 * r_buck], base_t[:, : 2 * r_buck])
    assert got_f1 == base_f1

def test_r17_collision_routes_to_compact(monkeypatch):
    """At r_bits=17 the hist packed encoding (fpos << 18) | idx equals the
    _BIG exhaustion sentinel for fpos=8191, idx=2^18-1 — a legal s1-sample
    bucket whose update the hist kernel silently dropped (ADVICE r2).
    hist_add_pallas must reject r17 and _table_add must route it to the
    compact path, which counts that exact element."""
    r_bits = 17
    r_buck = 1 << r_bits
    sent = 2 * r_buck
    idx = np.full((8, 1024), sent, np.int32)
    idx[7, 1023] = 2 * r_buck - 1  # window-flat position 8191, max bucket
    with pytest.raises(ValueError):
        hist_add_pallas(jnp.asarray(idx), r_bits, interpret=True, block_rows=16)
    monkeypatch.setenv("NTCARD_SCATTER", "pallas-interpret")
    table = jnp.zeros((2 * r_buck + 1,), jnp.int32)
    got, over = sketch_mod._table_add(table, jnp.asarray(idx), r_bits)
    assert np.asarray(got)[2 * r_buck - 1] == 1
    assert not bool(over)
