"""Variable-amount split rotation P^n on (hi, lo) uint32 pairs.

P = srol is ntHash's split rotation: a 33-bit ring in u64 bits 0..32 and a
31-bit ring in bits 33..63 (reference nthash.hpp:185-217). The windowed-XOR
hash formulation (ops/nthash.py) needs P^n with *per-position* n — but the
amounts derive from the static position index, so they are trace-time
constant arrays and every select below folds to cheap vector ops.

Ring mapping for the (hi, lo) pair: lo = u64 bits 0..31, hi = bits 32..63;
the 33-bit ring is (hi&1, lo), the 31-bit ring is hi>>1.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

MASK31 = np.uint32(0x7FFFFFFF)
U1 = np.uint32(1)


def _rotl31(r31, n31):
    """Rotate a 31-bit value left by n31 in [0, 30]. All shifts stay < 32."""
    return ((r31 << n31) | (r31 >> (np.uint32(31) - n31))) & MASK31


def _rotl33(a, b, n33):
    """Rotate the 33-bit value (b:bit32, a:bits0..31) left by n33 in [0, 32].

    Returns (ya, yb). Guards for shift-by-32 are selects over static
    amounts."""
    n = n33
    s = np.uint32(33) - n  # in [1, 33]
    # (X << n) & M33: low 32 bits from a<<n (a<<32 undefined -> guard);
    # bit 32 is bit (32-n) of a for n>=1, else b.
    low_shift = jnp.where(n >= 32, np.uint32(0), a << n)
    yb = jnp.where(n == 0, b, (a >> (np.uint32(32) - n)) & U1)
    # X >> s for s in [1, 33]: fits in n bits.
    rs = jnp.where(
        s >= 33,
        np.uint32(0),
        jnp.where(s == 32, b, (a >> s) | (b << (np.uint32(32) - s))),
    )
    ya = low_shift | rs
    return ya, yb


def srol_var(hi, lo, n33, n31):
    """P^n applied elementwise, with per-element rotation amounts
    n33 = n mod 33, n31 = n mod 31 (uint32 arrays, broadcastable)."""
    r31 = _rotl31(hi >> U1, n31)
    ya, yb = _rotl33(lo, hi & U1, n33)
    return (r31 << U1) | yb, ya


def rot_amounts(n: np.ndarray):
    """Static helper: (n mod 33, n mod 31) as uint32 arrays for any integer
    array n (negative allowed)."""
    n = np.asarray(n, dtype=np.int64)
    return (n % 33).astype(np.uint32), (n % 31).astype(np.uint32)


# ---------------------------------------------------------------------------
# Multiply-based variable rotation.
#
# The TPU vector unit handles variable-amount shifts poorly (they compile to
# enormous select ladders), but 32x32 multiplies are cheap. A left-rotation
# by n is a multiply by 2^n (low part) plus a multiply-high (wrapped part),
# with the power-of-two constants precomputed per position.
# ---------------------------------------------------------------------------

_M16 = np.uint32(0xFFFF)
_U16 = np.uint32(16)


def _mulhi(a, ch, cl):
    """Exact high 32 bits of a * c, with c pre-split as (ch, cl) = (c >> 16,
    c & 0xFFFF). Standard 16-bit-limb schoolbook product."""
    al = a & _M16
    ah = a >> _U16
    t1 = ah * cl + ((al * cl) >> _U16)
    t2 = al * ch + (t1 & _M16)
    return ah * ch + (t1 >> _U16) + (t2 >> _U16)


def var_rot_consts(n: np.ndarray):
    """Per-position constants for :func:`srol_var_mul`, for rotation amounts
    n (any integer array, negatives allowed). Returns uint32 arrays (each
    additionally pre-split into 16-bit halves where used by _mulhi)."""
    n33, n31 = rot_amounts(n)
    n33 = n33.astype(np.int64)
    n31 = n31.astype(np.int64)
    c31 = (1 << n31).astype(np.uint32)
    c31b = (1 << (n31 + 1)).astype(np.uint32)
    cl33 = np.where(n33 == 32, 0, 1 << np.minimum(n33, 31)).astype(np.uint32)
    cd33 = np.where(n33 == 0, 0, 1 << np.maximum(n33 - 1, 0)).astype(np.uint32)
    m32 = np.where(n33 == 0, 0, 1 << (32 - np.maximum(n33, 1))).astype(np.uint32)
    z0 = (n33 == 0).astype(np.uint32)
    out = {"c31": c31, "cl33": cl33, "m32": m32, "z0": z0}
    for name, c in (("c31b", c31b), ("cd33", cd33)):
        out[name + "_h"] = (c >> 16).astype(np.uint32)
        out[name + "_l"] = (c & 0xFFFF).astype(np.uint32)
    return out


def srol_var_mul(hi, lo, K):
    """P^n elementwise with per-element amounts, given the constant arrays of
    :func:`var_rot_consts` (broadcast-compatible with hi/lo). Pure multiply /
    add / constant-shift ops."""
    one = jnp.uint32(1)
    # 31-bit ring (u64 bits 33..63): rot = (r*2^n31 & M31) | (r >> (31-n31))
    r31 = hi >> one
    rot31 = ((r31 * K["c31"]) & MASK31) | _mulhi(r31, K["c31b_h"], K["c31b_l"])
    # 33-bit ring (bits 0..32), value X = (b:bit32, a:low32):
    #   T2 = X >> (33-n33) = (a >> (33-n33)) | b << (n33-1)
    #   low32 = (a << n33) | T2 ;  bit32 = bit (32-n33) of a   (n33 >= 1)
    #   n33 == 0 -> identity (cd33 = m32 = 0, z0 = 1 make the terms vanish)
    a = lo
    b = hi & one
    t2 = _mulhi(a, K["cd33_h"], K["cd33_l"]) | (b * (K["cd33_l"] | (K["cd33_h"] << _U16)))
    low = (a * K["cl33"]) | t2
    bit32 = ((a & K["m32"]) != 0).astype(jnp.uint32) | (K["z0"] * b)
    return (rot31 << one) | bit32, low


def _pow2_u32(n):
    """2^n as uint32 for n int32 in [0, 31], with no variable shifts, no
    gathers, no multiplies: build the float32 bit pattern (exponent 127+n,
    zero mantissa) with a constant shift, bitcast, and convert — exact for
    powers of two."""
    import jax

    f = jax.lax.bitcast_convert_type(((n + 127) << 23).astype(jnp.int32), jnp.float32)
    return jax.lax.convert_element_type(f, jnp.uint32)


def srol_var_iota(hi, lo, n33, n31):
    """P^n elementwise with per-element amounts given as residue arrays
    n33 = n mod 33 (int32, [0,32]) and n31 = n mod 31 (int32, [0,30]),
    typically derived from a positional iota.

    Entirely multiply / add / constant-shift / select ops: the power-of-two
    multipliers are synthesized from the residues with the float-exponent
    bit trick, so there are no gathers, no broadcasts of small arrays, and
    no variable-amount shifts — the three op classes this TPU backend
    mishandles. See srol_var_mul for the rotation algebra."""
    z = jnp.zeros_like(hi)
    c31 = _pow2_u32(n31)
    c31b = _pow2_u32(n31 + 1)  # n31+1 in [1,31]: always in range
    cl33 = jnp.where(n33 == 32, z, _pow2_u32(jnp.minimum(n33, 31)))
    cd33 = jnp.where(n33 == 0, z, _pow2_u32(jnp.maximum(n33 - 1, 0)))
    m32 = jnp.where(n33 == 0, z, _pow2_u32(32 - jnp.maximum(n33, 1)))

    one = np.uint32(1)
    r31 = hi >> one
    rot31 = ((r31 * c31) & MASK31) | _mulhi(r31, c31b >> _U16, c31b & _M16)
    a = lo
    b = hi & one
    t2 = _mulhi(a, cd33 >> _U16, cd33 & _M16) | (b * cd33)
    low = (a * cl33) | t2
    bit32 = ((a & m32) != 0).astype(jnp.uint32) | jnp.where(n33 == 0, b, z)
    return (rot31 << one) | bit32, low


# ---------------------------------------------------------------------------
# Gather-based variable rotation.
#
# On the TPU backend in use, 32-bit integer multiplies are also slow, while
# gathers from small VMEM-resident tables are essentially free. A rotation is
# a bit permutation, so it distributes over OR across byte pieces: rotate
# each byte of the input with a (residue, byte-value)-indexed table lookup
# and OR the contributions.
# ---------------------------------------------------------------------------


def _rotl33_int(x: int, n: int) -> int:
    m33 = (1 << 33) - 1
    x &= m33
    return ((x << n) | (x >> (33 - n))) & m33 if n else x


def _rotl31_int(x: int, n: int) -> int:
    m31 = (1 << 31) - 1
    x &= m31
    return ((x << n) | (x >> (31 - n))) & m31 if n else x


@lru_cache(maxsize=None)
def _byte_rot_tables():
    """Byte-piece rotation tables.

    T31[p][n*256+v]  = rotl31(v << 8p, n) << 1      (positioned into hi)
    L33[p][n*256+v]  = low32 of rotl33(v << 8p, n)
    B33[p][n*256+v]  = bit32 of rotl33(v << 8p, n)
    LB[n*2+b] / BB[n*2+b] — same for the 33-bit ring's bit-32 input piece."""
    T31 = np.zeros((4, 31 * 256), np.uint32)
    L33 = np.zeros((4, 33 * 256), np.uint32)
    B33 = np.zeros((4, 33 * 256), np.uint32)
    for p in range(4):
        for n in range(31):
            for v in range(256):
                T31[p, n * 256 + v] = _rotl31_int(v << (8 * p), n) << 1
        for n in range(33):
            for v in range(256):
                y = _rotl33_int(v << (8 * p), n)
                L33[p, n * 256 + v] = y & 0xFFFFFFFF
                B33[p, n * 256 + v] = y >> 32
    LB = np.zeros(33 * 2, np.uint32)
    BB = np.zeros(33 * 2, np.uint32)
    for n in range(33):
        for b in range(2):
            y = _rotl33_int(b << 32, n)
            LB[n * 2 + b] = y & 0xFFFFFFFF
            BB[n * 2 + b] = y >> 32
    return T31, L33, B33, LB, BB


def srol_var_gather(hi, lo, i33, i31):
    """P^n elementwise where the amounts are given as residues i33 = n mod 33,
    i31 = n mod 31 (int32 arrays, same shape as hi/lo). Only gathers,
    constant shifts, ands and ors. Byte extraction stays in uint32 (an int32
    arithmetic shift would sign-extend)."""
    T31, L33, B33, LB, BB = _byte_rot_tables()
    i33b = i33 << 8
    i31b = i31 << 8
    one = np.uint32(1)
    m255 = np.uint32(255)
    r31 = hi >> one
    hi_out = jnp.zeros_like(hi)
    low = jnp.zeros_like(lo)
    bit = jnp.zeros_like(hi)
    for p in range(4):
        sh = np.uint32(8 * p)
        b31 = ((r31 >> sh) & m255).astype(jnp.int32)
        hi_out = hi_out | jnp.asarray(T31[p])[i31b + b31]
        b33 = ((lo >> sh) & m255).astype(jnp.int32)
        low = low | jnp.asarray(L33[p])[i33b + b33]
        bit = bit | jnp.asarray(B33[p])[i33b + b33]
    bidx = (i33 << 1) + (hi & one).astype(jnp.int32)
    low = low | jnp.asarray(LB)[bidx]
    bit = bit | jnp.asarray(BB)[bidx]
    return hi_out | bit, low


def srol_const(hi, lo, n: int):
    """P^n with a fixed Python-int amount: constant shifts only."""
    n33 = n % 33
    n31 = n % 31
    one = np.uint32(1)
    r31 = hi >> one
    if n31:
        rot31 = ((r31 << np.uint32(n31)) | (r31 >> np.uint32(31 - n31))) & MASK31
    else:
        rot31 = r31
    a = lo
    b = hi & one
    if n33 == 0:
        low, bit32 = a, b
    else:
        s = 33 - n33
        if s == 32:
            t2 = b
        else:
            t2 = (a >> np.uint32(s)) | (b << np.uint32(n33 - 1))
        low = ((a << np.uint32(n33)) if n33 < 32 else jnp.zeros_like(a)) | t2
        bit32 = (a >> np.uint32(32 - n33)) & one
    return (rot31 << one) | bit32, low
