"""The window-doubling kernel (ops/nthash.window_hashes_doubling) must be
bit-identical to the rotated-prefix-scan formulation (window_hashes) — the
two backends behind NTCARD_KERNEL. Both realize the same algebra
(nthash.hpp:220-257 lifted to windowed composition); equality here plus the
oracle tests on sketch_scan pin both to the reference."""

import numpy as np
import pytest

from ntcard_tpu.io.packing import aligned_stride, pack_rows
from ntcard_tpu.ops.nthash import window_hashes, window_hashes_doubling


@pytest.mark.parametrize(
    "L,B,ks",
    [
        (256, 128, (25,)),
        (1024, 256, (12, 32, 64, 96, 128)),
        (512, 128, (144,)),
        (256, 128, (1,)),
        (256, 128, (3,)),
    ],
)
def test_doubling_equals_prefix(L, B, ks):
    rng = np.random.default_rng(7)
    S = aligned_stride(L, max(ks))
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    a = window_hashes(codes, ks, S)
    b = window_hashes_doubling(codes, ks, S)
    for k in ks:
        for i in range(3):
            np.testing.assert_array_equal(np.asarray(a[k][i]), np.asarray(b[k][i]))


def test_doubling_equals_prefix_gap_seed():
    rng = np.random.default_rng(8)
    S = aligned_stride(256, 13)
    codes = rng.integers(0, 5, size=(128, 256), dtype=np.uint8)
    mask = (5, 6, 7)
    a = window_hashes(codes, (13,), S, mask_positions=mask)
    b = window_hashes_doubling(codes, (13,), S, mask_positions=mask)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(a[13][i]), np.asarray(b[13][i]))


def test_doubling_equals_prefix_packed_wire():
    rng = np.random.default_rng(9)
    S = aligned_stride(1024, 64)
    codes = rng.integers(0, 5, size=(256, 1024), dtype=np.uint8)
    a = window_hashes(codes, (64,), S)
    b = window_hashes_doubling(pack_rows(codes), (64,), S, packed=True)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(a[64][i]), np.asarray(b[64][i]))
