"""Pallas TPU kernels that exploit emit sparsity for the count-table update.

Why this exists: the XLA scatter-add `table.at[idx].add(1, mode="drop")` on
this TPU costs ~9-13 ns *per update element* regardless of how many updates
are sentinels (measured: 7.9M updates -> 79 ms at rBits=16, and dropped
out-of-bounds updates cost the same as landing ones). But ntCard's sampling
(ntcard.cpp:135-139) keeps only ~2^-(sBits+1) + 2^-sBits of windows — at the
<50 GB default sBits=7 that is 1.17%, so ~99% of the scatter is sentinel
traffic. The reference's CPU loop never pays for unsampled k-mers (the
sample test branches before the table touch); these kernels restore that
algorithmic sparsity on the TPU.

Design (shaped by measured Mosaic/v5e-lite constraints):
  * no scalar stores to VMEM, and single-element loads need a lane index
    that is statically 128-aligned -> never address single elements;
  * instead, per [8, 1024] window: enc = (flat_pos << 18) | idx for sampled
    positions, then extract elements in increasing enc order with one
    full-window min-reduction each ("iterated extraction") — ~2 vector ops
    plus one vector->scalar move per *sampled* element;
  * two windows are processed with interleaved carries so the two
    independent min->scalar moves overlap (measured ~1.6x over one stream);
  * the table row update is a dynamic-sublane vector read-modify-write
    `table[b // 128, :] += onehot(b % 128)` (dynamic sublane indices are
    legal where dynamic lane indices are not).

The packed encoding needs idx < 2^18 and window positions < 2^13, so the
in-VMEM histogram applies to r_bits <= 17 (the table, 2^(r_bits+1) ints,
also fits VMEM there). Larger tables (the rBits=27 default) use
``compact_pallas``: the same extraction loop, but writing the surviving
indices into a small dense buffer that the normal XLA scatter then applies
— the scatter pays for ~1% of the batch instead of 100%.

Worst-case safety: extraction time scales with the *sampled* count, which
an adversarial input can push to 100%. Callers guard with a density check
and fall back to the plain XLA scatter (models/sketch.py), so results are
always bit-identical to the reference semantics and the pathological case
is merely as slow as before.
"""

from __future__ import annotations

import functools
import os

from ntcard_tpu import _jax_config  # noqa: F401  (platform/cache config before backend init)
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(0x7FFFFFFF)
_LANES = 1024
_BLOCK_ROWS = 256  # rows of 1024 per grid step: 1 MB VMEM, 16 windows


def _pad_rows(flat: jnp.ndarray, sent: np.int32, block_rows: int) -> jnp.ndarray:
    """[N] int32 -> [R, 1024] with R a multiple of ``block_rows``, padded
    with the sentinel (padding is masked out by construction)."""
    block = block_rows * _LANES
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), sent, jnp.int32)])
    return flat.reshape(-1, _LANES)


def _window_iotas():
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    ln = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    return sub * np.int32(_LANES) + ln


def _extract_pair(idx_ref, w, fpos, sent, update):
    """Interleaved iterated extraction over windows 2w and 2w+1.

    ``update(e)`` consumes one packed (pos << 18) | value per sampled
    element; the two streams' min-reductions are independent so their
    vector->scalar moves pipeline."""
    rowA = idx_ref[pl.ds(w * 16, 8), :]
    rowB = idx_ref[pl.ds(w * 16 + 8, 8), :]
    mA = rowA != sent
    mB = rowB != sent
    encA = jnp.where(mA, (fpos << np.int32(18)) | rowA, _BIG)
    encB = jnp.where(mB, (fpos << np.int32(18)) | rowB, _BIG)
    n = jnp.maximum(jnp.sum(mA.astype(jnp.int32)), jnp.sum(mB.astype(jnp.int32)))

    def body(_, prevs):
        pA, pB = prevs
        eA = jnp.min(jnp.where(encA > pA, encA, _BIG))
        eB = jnp.min(jnp.where(encB > pB, encB, _BIG))
        update(eA)
        update(eB)
        return (eA, eB)

    jax.lax.fori_loop(0, n, body, (np.int32(-1), np.int32(-1)))


def _hist_kernel(idx_ref, out_ref, *, sent, trows, block_rows):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros((trows, 128), jnp.int32)

    fpos = _window_iotas()
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def update(e):
        @pl.when(e != _BIG)
        def _():
            b = e & np.int32(0x3FFFF)
            tr = b >> np.int32(7)
            cur = out_ref[pl.ds(tr, 1), :]
            out_ref[pl.ds(tr, 1), :] = cur + (
                lane128 == (b & np.int32(127))
            ).astype(jnp.int32)

    def w_body(w, _):
        _extract_pair(idx_ref, w, fpos, sent, update)
        return 0

    jax.lax.fori_loop(0, block_rows // 16, w_body, 0)


@functools.partial(jax.jit, static_argnames=("r_bits", "interpret", "block_rows"))
def hist_add_pallas(
    idx: jnp.ndarray, r_bits: int, interpret: bool = False, block_rows: int = _BLOCK_ROWS
) -> jnp.ndarray:
    """Sparse histogram of emit indices (any shape, int32 in [0, 2^(r_bits+1)],
    sentinel 2*r_buck means "no update") -> int32[2*r_buck + 1] counts, bit-
    identical to `zeros(2*r_buck+1).at[idx].add(1, mode="drop")` except that
    the sentinel bin stays 0 (callers never read it). Requires r_bits <= 16:
    at r_bits=17 the packed encoding (fpos << 18) | idx reaches exactly
    _BIG for fpos=8191, idx=2^18-1 — a legal s1-sample bucket would collide
    with the exhaustion sentinel and be silently dropped (r_bits=17 routes
    to compact_pallas instead, models/sketch.py). ``block_rows`` (multiple
    of 16) is a tuning/test knob for the per-grid-step VMEM tile."""
    if not (1 <= r_bits <= 16):
        raise ValueError(f"hist_add_pallas requires r_bits in [1, 16], got {r_bits}")
    if block_rows % 16:
        raise ValueError(f"block_rows ({block_rows}) must be a multiple of 16")
    r_buck = 1 << r_bits
    sent = np.int32(2 * r_buck)
    tsize = 2 * r_buck + 1
    trows = ((tsize + 127) // 128 + 7) // 8 * 8
    rows = _pad_rows(idx.reshape(-1), sent, block_rows)
    grid = rows.shape[0] // block_rows
    out = pl.pallas_call(
        functools.partial(_hist_kernel, sent=sent, trows=trows, block_rows=block_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((trows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((trows, 128), jnp.int32),
        interpret=interpret,
    )(rows)
    return out.reshape(-1)[:tsize]


def _extract_multi_full(idx_ref, w, fpos, sent, update, ways, transform=None):
    """Iterated extraction for arbitrary int32 payloads (no 18-bit bound):
    the extraction order rides on positions alone and the value is fetched
    with a second masked reduction — two vector->scalar moves per element,
    so ``ways`` windows run interleaved with independent carries to
    pipeline the moves. ``update(pos, val)`` is called once per
    non-sentinel element; pos == _BIG means an exhausted stream.
    ``transform`` (optional) maps each loaded VMEM row elementwise before
    extraction (value rewrite + sentinel mapping — the prefilter path)."""
    load = (lambda sl: transform(idx_ref[sl])) if transform else (lambda sl: idx_ref[sl])
    rows = [load(pl.ds((w * ways + j) * 8, 8)) for j in range(ways)]
    encs = [jnp.where(r != sent, fpos, _BIG) for r in rows]
    n = jnp.sum((rows[0] != sent).astype(jnp.int32))
    for r in rows[1:]:
        n = jnp.maximum(n, jnp.sum((r != sent).astype(jnp.int32)))

    def body(_, prevs):
        es = [jnp.min(jnp.where(enc > p, enc, _BIG)) for enc, p in zip(encs, prevs)]
        vs = [
            jnp.sum(jnp.where(fpos == e, r, np.int32(0))) for e, r in zip(es, rows)
        ]
        for e, v in zip(es, vs):
            update(e, v)
        return tuple(es)

    jax.lax.fori_loop(0, n, body, tuple(np.int32(-1) for _ in range(ways)))


def _extract_multi_packed2(idx_ref, w, fpos, sent, update, ways, transform=None):
    """Iterated extraction for values < 2^31 with NO serial reduction chain:
    the value is split across two pos-keyed packed encodings,

        encA = (pos << 17) | (val & 0x1FFFF)   (max 2^30 - 1)
        encB = (pos << 14) | (val >> 17)       (max 2^27 - 1)

    and extracted by two *independent* min-reductions. Window positions are
    unique, so both mins select the same element and ordering rides on pos
    in both; _extract_multi_full's value fetch (a second reduction
    *dependent* on the min result) is replaced by a reduction that issues
    in parallel with it. fpos must be < 2^13 (the [8, 1024] window flat
    positions); the 17/14 payload split keeps every real encoding strictly
    below the _BIG exhaustion sentinel (an 18-bit low split would make
    pos 8191 + all-ones low bits collide with it). ``transform`` as in
    _extract_multi_full."""
    load = (lambda sl: transform(idx_ref[sl])) if transform else (lambda sl: idx_ref[sl])
    rows = [load(pl.ds((w * ways + j) * 8, 8)) for j in range(ways)]
    encAs, encBs = [], []
    for r in rows:
        m = r != sent
        encAs.append(jnp.where(m, (fpos << np.int32(17)) | (r & np.int32(0x1FFFF)), _BIG))
        encBs.append(jnp.where(m, (fpos << np.int32(14)) | (r >> np.int32(17)), _BIG))
    n = jnp.sum((rows[0] != sent).astype(jnp.int32))
    for r in rows[1:]:
        n = jnp.maximum(n, jnp.sum((r != sent).astype(jnp.int32)))

    def body(_, prevs):
        pA, pB = prevs
        eA = [jnp.min(jnp.where(a > p, a, _BIG)) for a, p in zip(encAs, pA)]
        eB = [jnp.min(jnp.where(b > p, b, _BIG)) for b, p in zip(encBs, pB)]
        for a, b in zip(eA, eB):
            val = ((b & np.int32(0x3FFF)) << np.int32(17)) | (a & np.int32(0x1FFFF))
            update(a, val)
        return (tuple(eA), tuple(eB))

    init = tuple(np.int32(-1) for _ in range(ways))
    jax.lax.fori_loop(0, n, body, (init, init))


def _compact_kernel(
    idx_ref, out_ref, cnt_out_ref, cnt_ref, *, sent, cap_rows, block_rows, ways,
    extractor, prefilter=None
):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.full((cap_rows, 128), np.int32(-1))
        cnt_ref[0] = np.int32(0)
        if prefilter is not None:
            cnt_ref[1] = np.int32(0)

    fpos = _window_iotas()
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def update(pos, val):
        @pl.when(pos != _BIG)
        def _():
            c = cnt_ref[0]
            rs = jnp.minimum(c >> np.int32(7), np.int32(cap_rows - 1))
            onehot = (lane128 == (c & np.int32(127))).astype(jnp.int32)
            cur = out_ref[pl.ds(rs, 1), :]
            # slots start at -1; adding (val + 1) turns exactly one slot into
            # val. Untouched slots stay -1 (dropped by the downstream OOB
            # scatter); a clamped overflow row accumulates garbage that
            # callers discard after testing cnt > cap.
            out_ref[pl.ds(rs, 1), :] = cur + onehot * (val + np.int32(1))
            cnt_ref[0] = c + np.int32(1)

    transform = None
    if prefilter is not None:
        lo, hi = prefilter

        def transform(raw):
            # pad/sentinel is -1 (no non-negative count equals it); values
            # are wrapped mod 2^16 (the reference's uint16 table read) and
            # kept only in [lo, hi)
            r16 = raw & np.int32(0xFFFF)
            keep = (raw != np.int32(sent)) & (r16 >= np.int32(lo)) & (r16 < np.int32(hi))
            return jnp.where(keep, r16, np.int32(sent))

    def w_body(w, _):
        if prefilter is not None:
            # bin-0 count (wrapped value 0) over the same VMEM block — the
            # caller's histogram needs it and a separate XLA pass over the
            # GiB row would cost a full HBM read
            raw = idx_ref[pl.ds(w * ways * 8, 8 * ways), :]
            z = (raw != np.int32(sent)) & ((raw & np.int32(0xFFFF)) == 0)
            cnt_ref[1] = cnt_ref[1] + jnp.sum(z.astype(jnp.int32))
        extractor(idx_ref, w, fpos, sent, update, ways, transform=transform)
        return 0

    jax.lax.fori_loop(0, block_rows // (8 * ways), w_body, 0)

    # scalar stores to VMEM are illegal; emit the running count(s) as
    # one-hot row adds on the final grid step
    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        row = (lane128 == np.int32(0)).astype(jnp.int32) * cnt_ref[0]
        if prefilter is not None:
            row = row + (lane128 == np.int32(1)).astype(jnp.int32) * cnt_ref[1]
        cnt_out_ref[:] = row


def compact_packed2_default() -> bool:
    """packed2 splits the value across two independent pos-keyed reductions
    (no serial chain per element) and is the default — measured on the real
    chip (r27 3-k hash+compact): 39.2 vs 50.2 ms/batch for the
    reduce-then-fetch extraction, reproducibly. NTCARD_COMPACT=full
    restores the old extractor (A/B knob)."""
    import os

    return os.environ.get("NTCARD_COMPACT", "packed2") != "full"


@functools.partial(
    jax.jit,
    static_argnames=("sent", "cap", "interpret", "block_rows", "packed2", "prefilter"),
)
def compact_pallas(
    idx: jnp.ndarray,
    sent: int,
    cap: int,
    interpret: bool = False,
    block_rows: int = _BLOCK_ROWS,
    packed2: bool | None = None,
    prefilter: tuple | None = None,
):
    """Compact the non-sentinel elements of ``idx`` (any shape, int32 >= 0,
    ``sent`` marks "no update") into a dense int32[cap] buffer (unused tail
    slots -1) plus the true non-sentinel count.

    A downstream `table.at[vals].add(1, mode="drop")` then costs ~cap
    updates instead of idx.size — this is how tables too large for VMEM
    (the rBits=27 default) exploit emit sparsity. If count > cap the buffer
    is invalid; callers must test and fall back to the full scatter
    (models/sketch.py wraps this in a lax.cond).

    ``prefilter=(lo, hi)`` is the finalize counter-hist mode: elements are
    table counter values, read as ``v & 0xFFFF`` (the reference's uint16
    wrap) and kept only when lo <= wrapped < hi; ``sent`` must be -1 (no
    non-negative counter equals it; it also pads). Returns a THIRD value —
    the count of wrapped-zero (untouched-bucket) elements — so the caller's
    whole histogram needs exactly one pass over the GiB row instead of
    separate mask/zero-count passes."""
    if cap % 128:
        raise ValueError(f"cap ({cap}) must be a multiple of 128")
    if block_rows % 16:
        raise ValueError(f"block_rows ({block_rows}) must be a multiple of 16")
    if prefilter is not None and sent != -1:
        raise ValueError("prefilter mode requires sent == -1 (pad/sentinel)")
    cap_rows = (cap // 128 + 7) // 8 * 8
    rows = _pad_rows(idx.reshape(-1), np.int32(sent), block_rows)
    grid = rows.shape[0] // block_rows
    # interleave as many extraction streams as the block allows: the
    # extraction loop is iteration-count/scalar-latency-bound (a lane-group
    # variant with 8x narrower min-reductions measured SLOWER, 56.5 vs
    # 36.2 ms/batch at r27 3-k), so deeper interleave wins until the
    # per-iteration vector work and the max-over-streams loop-count waste
    # catch up — on-chip ways sweep at r27 3-k (ms/batch): 4 -> 36.2,
    # 8 -> 26.9, **16 -> 23.1**, 32 -> 29.2. NTCARD_COMPACT_WAYS overrides
    # for A/B tuning (must divide block_rows // 8).
    ways_env = os.environ.get("NTCARD_COMPACT_WAYS")
    if ways_env:
        ways = int(ways_env)
        if ways < 1 or (block_rows // 8) % ways:
            raise ValueError(
                f"NTCARD_COMPACT_WAYS={ways} must be >= 1 and divide {block_rows // 8}"
            )
    else:
        nwin = block_rows // 8
        ways = next((w for w in (16, 8, 4, 2) if nwin % w == 0), 1)
    use_packed2 = compact_packed2_default() if packed2 is None else packed2
    extractor = _extract_multi_packed2 if use_packed2 else _extract_multi_full
    vals, cnt = pl.pallas_call(
        functools.partial(
            _compact_kernel,
            sent=np.int32(sent),
            cap_rows=cap_rows,
            block_rows=block_rows,
            ways=ways,
            extractor=extractor,
            prefilter=prefilter,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((cap_rows, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((2 if prefilter is not None else 1,), jnp.int32)],
        interpret=interpret,
    )(rows)
    if prefilter is not None:
        return vals.reshape(-1)[:cap], cnt[0, 0], cnt[0, 1]
    return vals.reshape(-1)[:cap], cnt[0, 0]
