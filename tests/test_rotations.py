"""Rotation primitives vs the scalar srol_n oracle, exhaustively over all
residue combinations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ntcard_tpu.constants import srol_n
from ntcard_tpu.ops.rotations import rot_amounts, srol_const, srol_var_iota


def u64_join(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(np.uint64)


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
    # include ring-edge patterns
    v[:6] = [0, (1 << 64) - 1, 1, 1 << 32, 1 << 33, (1 << 33) - 1]
    return v


def test_srol_var_iota_all_amounts(vals):
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    f = jax.jit(srol_var_iota)
    for n in range(0, 1023):  # full permutation period
        n33, n31 = rot_amounts(np.full(vals.size, n))
        gh, gl = f(hi, lo, jnp.asarray(n33.astype(np.int32)), jnp.asarray(n31.astype(np.int32)))
        want = np.array([srol_n(int(v), n) for v in vals], dtype=np.uint64)
        np.testing.assert_array_equal(u64_join(gh, gl), want, err_msg=f"n={n}")


def test_srol_const_range(vals):
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    for n in list(range(0, 80)) + [128, 144, 1000, 1023]:
        gh, gl = srol_const(hi, lo, n)
        want = np.array([srol_n(int(v), n) for v in vals], dtype=np.uint64)
        np.testing.assert_array_equal(u64_join(gh, gl), want, err_msg=f"n={n}")
