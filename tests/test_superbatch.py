"""Superbatching (pipeline.superbatch + models/sketch._update_stack).

Contract: folding a [n, rows, width] stack of same-format wire batches with
one scanning dispatch is bit-identical to n single update calls — the scan
applies the same fold body in the same order, so tables and F1 accumulators
match exactly. The grouper must keep stacks format-homogeneous and flush
mixed/tail batches as singles.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ntcard_tpu.io.packing import pack_rows, pack_rows_quad, quad_wire_rows, wire_mode_of
from ntcard_tpu.models.sketch import CountTableSketch
from ntcard_tpu.ops.nthash import N_CODE
from ntcard_tpu.pipeline import superbatch

rng = np.random.default_rng(11)


def _codes(B, L, n_density=0.004):
    c = rng.integers(0, 4, (B, L), dtype=np.uint8)
    m = rng.random((B, L)) < n_density
    c[m] = N_CODE
    return c


def _assert_same(a, b):
    np.testing.assert_array_equal(np.asarray(a.tables), np.asarray(b.tables))
    assert a._f1_totals() == b._f1_totals()


@pytest.mark.parametrize("packed,pack", [(False, None), ("nibble", pack_rows), ("quad", pack_rows_quad)])
def test_stack_matches_sequential(packed, pack):
    ks, stride = (12, 17), 120
    a = CountTableSketch(ks, 7, 10, stride)
    b = CountTableSketch(ks, 7, 10, stride)
    batches = [_codes(128, 128) for _ in range(5)]
    if pack is not None:
        batches = [pack(x) for x in batches]
        assert all(w is not None for w in batches)
    for w in batches:
        a.update(w, packed=bool(packed) if packed != "quad" else "quad")
    stack = np.stack(batches)
    b.update(stack, packed=bool(packed) if packed != "quad" else "quad")
    _assert_same(a, b)


def test_stack_matches_sequential_quad2():
    """quad2 wire stacks carry the jit-static halo mode string through the
    scan body identically."""
    from ntcard_tpu.io.packing import pack_rows_quad2

    ks, stride = (12, 17), 112
    L = stride + 16
    a = CountTableSketch(ks, 7, 10, stride)
    b = CountTableSketch(ks, 7, 10, stride)
    batches = []
    B = 1024  # quad2_ok needs (B/128 * stride) % 128 == 0
    for _ in range(4):
        # rows must be consecutive spans of one code stream (the quad2
        # precondition validated by pack_rows_quad2): carve overlapping
        # windows out of a single stream like StreamPacker does
        s = _codes(1, B * stride + (L - stride))[0]
        x = np.stack([s[b * stride : b * stride + L] for b in range(B)])
        w = pack_rows_quad2(x, stride)
        assert w is not None
        batches.append(w)
    for w in batches:
        a.update(w, packed=f"quad2:{L - stride}")
    b.update(np.stack(batches), packed=f"quad2:{L - stride}")
    _assert = np.testing.assert_array_equal
    _assert(np.asarray(a.tables), np.asarray(b.tables))
    assert a._f1_totals() == b._f1_totals()


def test_stack_matches_sequential_big_table_multi_k():
    """r_bits > 17 routes through the combined compact+scatter path — the
    scan body must carry the lax.cond fallback identically."""
    ks, stride = (12, 17), 120
    a = CountTableSketch(ks, 7, 18, stride)
    b = CountTableSketch(ks, 7, 18, stride)
    batches = [_codes(128, 128) for _ in range(3)]
    for x in batches:
        a.update(x)
    b.update(np.stack(batches))
    _assert_same(a, b)


def test_superbatch_grouping():
    quad = [np.zeros((quad_wire_rows(256), 64), np.uint8) for _ in range(7)]
    nib = np.ones((128, 64), np.uint8)
    stream = quad[:3] + [nib] + quad[3:]
    out = list(superbatch(iter(stream), 3))
    # 3 quads -> stack; nibble arrives while 0 pending -> the 3 pending quads
    # had just flushed as a stack... walk it: [q,q,q]->stack, then nib (pending
    # [nib]), then q (shape change -> flush nib single), then q,q -> stack,
    # tail q -> single
    shapes = [o.shape for o in out]
    assert shapes[0] == (3,) + quad[0].shape
    assert shapes[1] == nib.shape
    assert shapes[2] == (3,) + quad[0].shape
    assert shapes[3] == quad[0].shape
    # order within each group preserved, nothing lost
    total = sum(o.shape[0] if o.ndim == 3 else 1 for o in out)
    assert total == len(stream)


def test_superbatch_n1_passthrough():
    xs = [_codes(16, 32) for _ in range(3)]
    out = list(superbatch(iter(xs), 1))
    assert all(o is x for o, x in zip(out, xs))


def test_wire_mode_of_stack_head():
    """The CLI derives the jit-static wire mode from stack[0]; it must match
    the mode of every element (same shape => same format)."""
    B, L = 256, 64
    w = pack_rows(_codes(B, L))
    stack = np.stack([w, w, w])
    assert wire_mode_of(stack[0], B) == "nibble"
