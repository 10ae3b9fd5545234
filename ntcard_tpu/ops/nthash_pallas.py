"""Pallas TPU kernel: the entire rotated-prefix-XOR ntHash pipeline fused in
VMEM.

The XLA formulation (ops/nthash.py) is correct but materializes ~30
[L, B]-sized uint32 intermediates in HBM per batch — memory traffic, not
compute, bounds it. This kernel runs the identical math per row-block with
every intermediate resident in VMEM: HBM traffic collapses to the uint8
codes in and the int32 emit indices out.

Layout inside the kernel: [BLOCK_ROWS, L] with the position axis on lanes.
The prefix XOR / prefix sum run as log-depth ``pltpu.roll`` ladders along
lanes; rotation amounts derive from a lane iota with the same
float-exponent power-of-two synthesis as the XLA path (ops/rotations.py).

Emit protocol (differs from ops/nthash.sketch_scan): each window start
position p in [0, stride) yields a count-table index in [0, 2^(r_bits+1)),
or sentinel S0 = 2^(r_bits+1) when the window is valid but unsampled, or
S1 = S0+1 when invalid/out of stride. models/sketch.py consumes this under
NTCARD_KERNEL=pallas: S0 lands in its existing sentinel row, S1 falls
outside the (2*r_buck+1)-row table and is dropped by the scatter, and
F1 = count of non-S1 positions — bit-identical to the XLA path.

Reference parity surface: identical to ops/nthash.py (NTC64 canonical
values, ntcard.cpp:132-145 sampling, nthll.cpp:92-97 HLL updates).
"""

from __future__ import annotations

import functools
from typing import Tuple

from ntcard_tpu import _jax_config  # noqa: F401  (platform/cache config before backend init)
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntcard_tpu.ops.nthash import _CSEED_HI, _CSEED_LO, _SEED_HI, _SEED_LO

BLOCK_ROWS = 128


def _sel5(code, table5):
    out = jnp.full(code.shape, np.uint32(table5[4]))
    for i in range(4):
        out = jnp.where(code == i, np.uint32(table5[i]), out)
    return out


def _pow2(n):
    """2^n as uint32 for int32 n in [0, 31] (float exponent-field trick).
    Mosaic lacks f32->u32 casts, so convert through int32 (exact for
    n <= 30) and patch n == 31 with a select."""
    bits = (jnp.minimum(n, np.int32(30)) + np.int32(127)) << np.int32(23)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32)
    v = jax.lax.convert_element_type(f, jnp.int32).astype(jnp.uint32)
    return jnp.where(n >= np.int32(31), np.uint32(0x80000000), v)


def _mulhi(a, c):
    """Exact high 32 bits of u32 a * u32 c (16-bit limbs)."""
    m16 = np.uint32(0xFFFF)
    s16 = np.uint32(16)
    al, ah = a & m16, a >> s16
    cl, ch = c & m16, c >> s16
    t1 = ah * cl + ((al * cl) >> s16)
    t2 = al * ch + (t1 & m16)
    return ah * ch + (t1 >> s16) + (t2 >> s16)


def _srol_var(hi, lo, n33, n31):
    """P^n with per-element residues (multiply-based; ops/rotations.py)."""
    z = jnp.zeros_like(hi)
    i0 = np.int32(0)
    c31 = _pow2(n31)
    c31b = _pow2(n31 + np.int32(1))
    cl33 = jnp.where(n33 == np.int32(32), z, _pow2(jnp.minimum(n33, np.int32(31))))
    cd33 = jnp.where(n33 == i0, z, _pow2(jnp.maximum(n33 - np.int32(1), i0)))
    m32 = jnp.where(n33 == i0, z, _pow2(np.int32(32) - jnp.maximum(n33, np.int32(1))))
    one = np.uint32(1)
    r31 = hi >> one
    rot31 = ((r31 * c31) & np.uint32(0x7FFFFFFF)) | _mulhi(r31, c31b)
    a = lo
    b = hi & one
    t2 = _mulhi(a, cd33) | (b * cd33)
    low = (a * cl33) | t2
    bit32 = ((a & m32) != np.uint32(0)).astype(jnp.uint32) | jnp.where(n33 == i0, b, z)
    return (rot31 << one) | bit32, low


def _srol_const(hi, lo, n: int):
    """P^n, fixed amount (constant shifts; ops/rotations.py srol_const)."""
    n33, n31 = n % 33, n % 31
    one = np.uint32(1)
    r31 = hi >> one
    if n31:
        rot31 = ((r31 << np.uint32(n31)) | (r31 >> np.uint32(31 - n31))) & np.uint32(0x7FFFFFFF)
    else:
        rot31 = r31
    a, b = lo, hi & one
    if n33 == 0:
        low, bit32 = a, b
    else:
        s = 33 - n33
        t2 = b if s == 32 else (a >> np.uint32(s)) | (b << np.uint32(n33 - 1))
        low = ((a << np.uint32(n33)) if n33 < 32 else jnp.zeros_like(a)) | t2
        bit32 = (a >> np.uint32(32 - n33)) & one
    return (rot31 << one) | bit32, low


def _shift_pos(x, s: int, lane):
    """out[.., i] = x[.., i+s] (s may be negative for i-s), zero beyond.
    The fill must be a dtype-matched scalar: weak-typed Python ints recurse
    in Mosaic's promotion path."""
    rolled = pltpu.roll(x, np.int32(-s % x.shape[-1]), axis=len(x.shape) - 1)
    L = x.shape[-1]
    fill = np.dtype(x.dtype).type(0)
    if s >= 0:
        return jnp.where(lane < np.int32(L - s), rolled, fill)
    return jnp.where(lane >= np.int32(-s), rolled, fill)


def _prefix_xor(x, lane):
    L = x.shape[-1]
    s = 1
    while s < L:
        x = x ^ _shift_pos(x, -s, lane)
        s *= 2
    return x


def _prefix_sum(x, lane):
    L = x.shape[-1]
    s = 1
    while s < L:
        x = x + _shift_pos(x, -s, lane)
        s *= 2
    return x


def _min64(ah, al, bh, bl):
    sel = (ah < bh) | ((ah == bh) & (al < bl))
    return jnp.where(sel, ah, bh), jnp.where(sel, al, bl)


def _sketch_kernel(codes_ref, out_ref, *, ks, stride, s_bits, r_bits):
    c = codes_ref[:].astype(jnp.int32)
    Bb, L = c.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, L), 1)
    i33 = lane % np.int32(33)
    i31 = lane % np.int32(31)

    s_hi = _sel5(c, _SEED_HI)
    s_lo = _sel5(c, _SEED_LO)
    # amounts (-m) mod: (33 - i33) % 33
    z32 = np.int32(0)
    g_hi, g_lo = _srol_var(
        s_hi,
        s_lo,
        jnp.where(i33 == z32, z32, np.int32(33) - i33),
        jnp.where(i31 == z32, z32, np.int32(31) - i31),
    )
    c_hi = _sel5(c, _CSEED_HI)
    c_lo = _sel5(c, _CSEED_LO)
    gc_hi, gc_lo = _srol_var(c_hi, c_lo, i33, i31)

    x_hi = _prefix_xor(g_hi, lane)
    x_lo = _prefix_xor(g_lo, lane)
    xc_hi = _prefix_xor(gc_hi, lane)
    xc_lo = _prefix_xor(gc_lo, lane)

    y_hi, y_lo = _srol_var(x_hi, x_lo, i33, i31)
    yc_hi, yc_lo = _srol_var(xc_hi, xc_lo, np.int32(32) - i33, np.int32(30) - i31)

    ncnt = _prefix_sum((c == np.int32(4)).astype(jnp.int32), lane)

    r_buck = 1 << r_bits
    s_mask = (1 << (s_bits - 1)) - 1
    sent0 = np.int32(2 * r_buck)      # valid, unsampled
    sent1 = np.int32(2 * r_buck + 1)  # invalid / outside stride

    for t, k in enumerate(ks):
        # F(i) = Y(i+k-1) ^ P^k(Y(i-1));  R(i) = P^k(Yc(i+k-1)) ^ Yc(i-1)
        ye_hi = _shift_pos(y_hi, k - 1, lane)
        ye_lo = _shift_pos(y_lo, k - 1, lane)
        yp_hi = _shift_pos(y_hi, -1, lane)
        yp_lo = _shift_pos(y_lo, -1, lane)
        pk_hi, pk_lo = _srol_const(yp_hi, yp_lo, k)
        fh_hi = ye_hi ^ pk_hi
        fh_lo = ye_lo ^ pk_lo

        yce_hi = _shift_pos(yc_hi, k - 1, lane)
        yce_lo = _shift_pos(yc_lo, k - 1, lane)
        qk_hi, qk_lo = _srol_const(yce_hi, yce_lo, k)
        rh_hi = qk_hi ^ _shift_pos(yc_hi, -1, lane)
        rh_lo = qk_lo ^ _shift_pos(yc_lo, -1, lane)

        valid = (_shift_pos(ncnt, k - 1, lane) - _shift_pos(ncnt, -1, lane)) == np.int32(0)
        valid = valid & (lane < np.int32(stride))

        ch, cl = _min64(fh_hi, fh_lo, rh_hi, rh_lo)
        s0 = (ch >> np.uint32(31 - s_bits)) == np.uint32(1)
        s1 = (ch >> np.uint32(32 - s_bits)) == np.uint32(s_mask)
        bucket = (cl & np.uint32(r_buck - 1)).astype(jnp.int32)
        bucket = bucket + jnp.where(s1, np.int32(r_buck), np.int32(0))
        idx = jnp.where(s0 | s1, bucket, sent0)
        idx = jnp.where(valid, idx, sent1)
        out_ref[t] = idx


@functools.partial(
    jax.jit, static_argnames=("ks", "stride", "s_bits", "r_bits", "interpret")
)
def sketch_idx_pallas(
    codes: jnp.ndarray,
    ks: Tuple[int, ...],
    stride: int,
    s_bits: int,
    r_bits: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, L] uint8 -> [nK, B, L] int32 emit indices (see module docstring
    for the sentinel protocol)."""
    B, L = codes.shape
    if B % BLOCK_ROWS:
        raise ValueError(f"B ({B}) must be a multiple of {BLOCK_ROWS}")
    nk = len(ks)
    kernel = functools.partial(
        _sketch_kernel, ks=ks, stride=stride, s_bits=s_bits, r_bits=r_bits
    )
    return pl.pallas_call(
        kernel,
        grid=(B // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nk, BLOCK_ROWS, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nk, B, L), jnp.int32),
        interpret=interpret,
    )(codes)
