"""The ntCard sampled count-table sketch as a device-resident model.

The reference keeps one shared ``uint16[nK][2][2^rBits]`` table updated with
``#pragma omp atomic`` increments (ntcard.cpp:132-145, 437-439). TPU-natively
the table is a pure functional state: per batch the fused hash+sample kernel
(ops/nthash.sketch_scan) produces flat index streams, and a scatter-add folds
them into per-k int32 tables. Addition commutes, so any batching/sharding
order yields the same table; the uint16 wraparound of the reference is
recovered exactly at finalization time by ``% 65536`` (int32 accumulation
overflows only after 2^31 hits on one bucket — unreachable: each hit requires
a sampled k-mer occurrence, and F1 fits well under 2^31 per bucket in any
real workload; the wrap test covers the semantics).

Sharding story (SURVEY.md §2.6): tables are private per data-parallel shard
and merged by summation — the collective analog of the reference's atomics —
so 1-shard and N-shard runs are bit-identical by construction.
"""

from __future__ import annotations

import os
import sys
from functools import partial
from typing import Dict, Sequence

from ntcard_tpu import _jax_config  # noqa: F401  (platform/cache config before backend init)
import jax
import jax.numpy as jnp
import numpy as np

from ntcard_tpu.ops.nthash import sketch_scan
from ntcard_tpu.utils.aot import aot_jit


def _u64_acc_add(hi, lo, add_u32):
    """Exact unsigned-64 accumulate in a (hi, lo) uint32 pair — device int64
    is unavailable (global x64 breaks Mosaic) and draining to the host
    mid-stream is ruinous (device->host transfers on tunneled TPUs have
    multi-second latency)."""
    new_lo = lo + add_u32
    carry = (new_lo < add_u32).astype(jnp.uint32)
    return hi + carry, new_lo


def _sparse_mode() -> str:
    """Sparse-update path selection, checked at trace time:
    "on" on real TPUs (NTCARD_SCATTER unset/auto), "off" when disabled
    (NTCARD_SCATTER=xla) or off-TPU, "interpret" to force the Pallas
    kernels through the interpreter on any backend (tests)."""
    env = os.environ.get("NTCARD_SCATTER", "auto")
    if env == "xla":
        return "off"
    if env == "pallas-interpret":
        return "interpret"
    if env == "pallas-noguard":  # perf-analysis probe: skip the density cond
        return "on"
    return "on" if jax.devices()[0].platform == "tpu" else "off"


def _defer_slots(r_bits: int) -> int:
    """Scatter-deferral window (batches folded per table scatter) for the
    big-table sparse path. The GiB-operand XLA scatter costs ~11.6 ms FIXED
    per op nearly independent of element count (tools/probe_r27.py-style
    chained probe: 114688 vs 917504 elements = 11.6 vs 12.0 ms/op), so
    deferring S batches reclaims (S-1)/S of the scatter stage. 0 disables
    (NTCARD_SCATTER_DEFER=0); the hist path (r_bits <= 16) and the plain
    XLA scatter path never defer."""
    if _sparse_mode() == "off" or r_bits <= 16:
        return 0
    env = os.environ.get("NTCARD_SCATTER_DEFER")
    if env is not None:
        try:
            return max(0, int(env))
        except ValueError:
            # malformed knob degrades to the default window like the sibling
            # NTCARD_* knobs instead of aborting sketch construction
            sys.stderr.write(
                f"ntcard: ignoring malformed NTCARD_SCATTER_DEFER={env!r}\n"
            )
    return 8


def _emit_cap(n: int) -> int:
    """Compaction buffer slots for an n-window emit stream. Expected sampled
    density is 2^-(sBits+1)+2^-sBits (1.17% at the sBits=7 default) and
    binomially concentrated (sigma ~ 500 on 8M windows), so 1/64 ~ 1.56% is
    a >>100-sigma margin for random content; the cap also bounds the
    kernel's VMEM-resident output buffer, which must stay small (an n/16
    cap made a 12 MB VMEM buffer and starved the kernel). Low-complexity
    repeats (telomeric/centromeric runs whose few distinct k-mers pass the
    sample test) CAN exceed any cap — that is the overflow path below."""
    cap = min(max(n // 64, 128), 1 << 20)
    return (cap + 127) // 128 * 128


def _table_add(table, idx, r_bits):
    """(table[2*r_buck+1] += histogram(idx), overflowed) — idx is the emit
    stream (sentinel 2*r_buck marks "no update", landing in the ignored
    dump row).

    On TPU the XLA scatter costs ~9-13 ns per update *element* — sentinels
    included — i.e. ~79 ms per 7.9M-window batch of which ~99% is sentinel
    traffic at the default sampling rates (docs/TPU_BACKEND_NOTES.md). The
    Pallas kernels in ops/scatter_pallas.py instead pay per *sampled*
    element; the big-table path compacts the sampled indices and scatters
    only those.

    Compaction-overflow exactness (an adversarial or repeat-heavy batch can
    exceed the cap): the hot path applies the batch ALL-OR-NOTHING (indices
    masked to dropped when cnt > cap) and returns the overflow flag —
    round-3 probing showed ANY reference to the full stream from a
    cond/while fallback costs ~30-50 ms/k per batch even untaken
    (tools/probe_r27.py condfree/whiledrain), so recovery runs OUTSIDE this
    program: the owning sketch replays flagged (batch, k) wires through the
    separate full-scatter program (_replay_update / _replay_sharded) a few
    dispatches later — bit-identical because the fold commutes and a
    flagged batch contributed nothing.

    The reference semantics this preserves: every sampled k-mer increments
    its bucket exactly once (ntcard.cpp:437-439)."""
    mode = _sparse_mode()
    no = jnp.zeros((), jnp.bool_)
    if mode == "off":
        return table.at[idx].add(1, mode="drop"), no
    interp = mode == "interpret"

    from ntcard_tpu.ops.scatter_pallas import compact_pallas, hist_add_pallas

    r_buck = 1 << r_bits
    sent = 2 * r_buck

    if r_bits <= 16:
        # table fits VMEM: in-kernel histogram, guarded by sampled density
        # (the hist kernel's runtime scales with the sampled count; both
        # branches are exact, so no overflow flag). r_bits=17 is excluded:
        # hist_add_pallas's (fpos << 18) | idx packed encoding collides
        # with its exhaustion sentinel there (a legal update would be
        # silently dropped); it takes the compact path.
        thresh = max(idx.size // 16, 1)  # ~5x the expected sBits=7 density
        n = jnp.sum((idx != np.int32(sent)).astype(jnp.int32))
        return (
            jax.lax.cond(
                n <= thresh,
                lambda t: t + hist_add_pallas(idx, r_bits, interpret=interp),
                lambda t: t.at[idx].add(1, mode="drop"),
                table,
            ),
            no,
        )

    masked, over = _compact_masked(idx, r_bits, interp)
    # NOTE: do NOT pass indices_are_sorted to this scatter — on the real
    # TPU a sorted-hint scatter whose buffer starts with OOB (-1) padding
    # dropped EVERY update (silently wrong AND "fast"); plain drop-mode is
    # the verified path
    table = table.at[masked].add(1, mode="drop")
    return table, over


def _compact_masked(idx, r_bits, interp):
    """Big-table sparse emit: compact the sampled indices of one batch's
    emit stream into a dense int32[cap] buffer (unused slots -1, dropped by
    the downstream scatter) plus the per-batch overflow flag. All-or-
    nothing: on overflow every slot is masked to -1, so the recovery path
    (_replay_update) re-applies the WHOLE batch exactly once."""
    from ntcard_tpu.ops.scatter_pallas import compact_pallas

    r_buck = 1 << r_bits
    cap = _emit_cap(idx.size)
    vals, cnt = compact_pallas(idx, 2 * r_buck, cap, interpret=interp)
    over = cnt > np.int32(cap)
    return jnp.where(over, np.int32(-1), vals), over


def _update_impl(
    tables, f1s, codes, ks, stride, s_bits, r_bits, mask_positions, packed=False,
    defer=False,
):
    """One batch step: tables = tuple of nK int32[2*rbuck+1] arrays; f1s
    [nK, 2] uint32 (hi, lo) exact 64-bit F1 accumulators. Returns
    (tables, f1s, flags) with flags [nK] bool — per-k compaction-overflow
    markers the owning sketch replays through a separate program a few
    dispatches later (see _table_add).

    Tables are SEPARATE per-k buffers, never a stacked [nK, T] array: on
    this TPU a scatter whose operand exceeds ~2.1 GiB falls off a cliff
    (measured r27 3-k: 198 ms for one combined flat-table scatter of 344k
    updates vs 37 ms for the same updates as three per-k 1.07 GB scatters,
    tools/probe_r27.py), and re-stacking per-k results would copy the
    GiB-scale tables every batch.

    The +1 table row is the sentinel dump for unsampled/invalid windows.

    NTCARD_KERNEL=pallas routes this step through the VMEM-fused Pallas
    kernel (ops/nthash_pallas.py); its extra invalid-window sentinel
    (2*r_buck+1) falls outside the table and is dropped by the scatter, and
    F1 is recovered as the count of non-invalid positions — bit-identical
    tables and F1 by construction (tests/test_pallas_kernel.py). Spaced
    seeds fall back to the XLA kernel (single-seed NTMS64 lives there)."""
    if os.environ.get("NTCARD_KERNEL") == "pallas" and not mask_positions:
        return _update_pallas(
            tables, f1s, codes, ks, stride, s_bits, r_bits, packed, defer=defer
        )
    idx, f1 = sketch_scan(codes, ks, stride, s_bits, r_bits, mask_positions, packed=packed)
    new_f1s = []
    for i, k in enumerate(ks):
        hi, lo = _u64_acc_add(f1s[i, 0], f1s[i, 1], f1[k].astype(jnp.uint32))
        new_f1s.append(jnp.stack([hi, lo]))
    if defer:
        # deferred-scatter hot path: compact + mask only; the owning sketch
        # accumulates the per-batch buffers and applies them in one scatter
        # per k every few batches (_flush_scatter) — the XLA scatter on a
        # GiB-scale operand costs ~11.6 ms FIXED per op nearly independent
        # of element count (measured: 114688 vs 917504 elements = 11.6 vs
        # 12.0 ms), so batching S batches' buffers reclaims (S-1)/S of the
        # per-batch scatter stage (~33 ms of the 70 ms r27 3-k step)
        interp = _sparse_mode() == "interpret"
        vals = []
        flags = []
        for i, k in enumerate(ks):
            v, over = _compact_masked(idx[k].reshape(-1), r_bits, interp)
            vals.append(v)
            flags.append(over)
        return tuple(vals), jnp.stack(new_f1s), jnp.stack(flags)
    new_tables = []
    flags = []
    for i, k in enumerate(ks):
        t, over = _table_add(tables[i], idx[k], r_bits)
        new_tables.append(t)
        flags.append(over)
    return tuple(new_tables), jnp.stack(new_f1s), jnp.stack(flags)


def _update_pallas(tables, f1s, codes, ks, stride, s_bits, r_bits, packed, defer=False):
    """Pallas-backed batch step (called inside _update's jit trace). The
    kernel wants [B, L] row-major codes; wire batches are unpacked on
    device first (cheap fused elementwise pass; quad additionally costs a
    transpose back to row-major)."""
    from ntcard_tpu.ops.nthash_pallas import sketch_idx_pallas

    if isinstance(packed, str) and packed.startswith("quad2"):
        from ntcard_tpu.ops.nthash import _codes_T

        codes = _codes_T(codes, packed).T
    elif packed == "quad":
        from ntcard_tpu.ops.nthash import unpack_quad

        codes = unpack_quad(codes).T
    elif packed:
        codes = jnp.concatenate([codes >> 4, codes & 0x0F], axis=0)
    interpret = jax.devices()[0].platform != "tpu"
    idx = sketch_idx_pallas(
        codes, ks, stride, s_bits, r_bits, interpret=interpret
    )  # [nK, B, L] int32; sent1 = 2*r_buck+1 marks invalid windows
    sent0 = np.int32(2 * (1 << r_bits))
    sent1 = np.int32(2 * (1 << r_bits) + 1)
    new_tables = []
    new_f1s = []
    flags = []
    vals = []
    for i, _k in enumerate(ks):
        flat = idx[i].reshape(-1)
        # fold the invalid-window sentinel (sent1, outside the table) into
        # the unsampled dump row so the sparse path masks both; the dump row
        # is never read, and the plain scatter's only difference is which
        # ignored bucket the sentinels land in
        if defer:
            interp = _sparse_mode() == "interpret"
            v, over = _compact_masked(jnp.minimum(flat, sent0), r_bits, interp)
            vals.append(v)
        else:
            t, over = _table_add(tables[i], jnp.minimum(flat, sent0), r_bits)
            new_tables.append(t)
        flags.append(over)
        f1 = (flat != sent1).sum(dtype=jnp.uint32)
        hi, lo = _u64_acc_add(f1s[i, 0], f1s[i, 1], f1)
        new_f1s.append(jnp.stack([hi, lo]))
    if defer:
        return tuple(vals), jnp.stack(new_f1s), jnp.stack(flags)
    return tuple(new_tables), jnp.stack(new_f1s), jnp.stack(flags)


@partial(
    aot_jit,
    static_argnames=("ks", "stride", "s_bits", "r_bits", "mask_positions", "packed"),
    donate_argnums=(0, 1),
)
def _update(
    tables, f1s, ocount, codes, ks, stride, s_bits, r_bits, mask_positions, packed=False
):
    """Jitted single-batch step. ``ocount`` (uint32 scalar, NOT donated —
    the sketch retains old refs) is the running total of overflow flags:
    the host checks it once every ~32 batches instead of fetching per-batch
    flags (each tiny D2H fetch costs ~90 ms of tunnel RPC latency,
    measured: per-batch fetches added ~1.1 s to a 12-batch run)."""
    t, f, flags = _update_impl(
        tables, f1s, codes, ks, stride, s_bits, r_bits, mask_positions, packed
    )
    return t, f, flags, ocount + flags.sum(dtype=jnp.uint32)


@partial(
    aot_jit,
    static_argnames=("ks", "stride", "s_bits", "r_bits", "mask_positions", "packed"),
    donate_argnums=(0,),
)
def _update_first(
    f1s, ocount, codes, ks, stride, s_bits, r_bits, mask_positions, packed=False
):
    """First-batch step with the table allocation FUSED into the program:
    the per-k zero tables are created in here rather than by a separate
    _make_tables dispatch. On the tunneled runtime every distinct program's
    first call pays ~0.7-1.3 s of executable-load RPC, so a cold CLI run
    paid one load for the alloc program and another for the update; fusing
    them removes a full load from the startup serial chain (the sketch
    allocates lazily — CountTableSketch.tables property)."""
    nk = len(ks)
    tables = tuple(jnp.zeros((2 * (1 << r_bits) + 1,), jnp.int32) for _ in range(nk))
    t, f, flags = _update_impl(
        tables, f1s, codes, ks, stride, s_bits, r_bits, mask_positions, packed
    )
    return t, f, flags, ocount + flags.sum(dtype=jnp.uint32)


@partial(
    aot_jit,
    static_argnames=("ks", "stride", "s_bits", "r_bits", "mask_positions", "packed"),
    donate_argnums=(0,),
)
def _update_defer(
    f1s, ocount, codes, ks, stride, s_bits, r_bits, mask_positions, packed=False
):
    """Deferred-scatter batch step: identical hash + compact + mask + F1 +
    overflow accounting to _update, but the per-k table scatters are NOT
    applied — the compacted buffers (int32[cap] each, unused slots -1) come
    back instead, and the owning sketch folds several batches' buffers into
    ONE scatter per k via _flush_scatter. Exactness is unchanged: scatter-
    adds commute, flags/F1/ocount are computed exactly as in _update, and
    an overflow-masked buffer is all -1 (contributes nothing) just like the
    masked direct scatter. The tables never enter this program, so its
    dispatch carries no GiB-scale operands at all."""
    vals, f, flags = _update_impl(
        None, f1s, codes, ks, stride, s_bits, r_bits, mask_positions, packed,
        defer=True,
    )
    return vals, f, flags, ocount + flags.sum(dtype=jnp.uint32)


@partial(aot_jit, static_argnames=("nk", "n"))
def _flush_scatter_first(slots, nk, n):
    """First flush with the per-k table allocation FUSED in — equivalent to
    ``_flush_scatter(zero_tables, slots)`` but without a separate
    _make_tables program: with scatter deferral on (the big-table default)
    the cold path's only table-allocating executable is this one, and the
    big _update_first program never loads at all (round-5 cold-chain cut;
    ntcard.cpp:437-439 is the reference's host-side calloc analog)."""
    zeros = tuple(jnp.zeros((n,), jnp.int32) for _ in range(nk))
    return _flush_scatter_impl(zeros, slots)


def _flush_scatter_impl(tables, slots):
    new = []
    for i, t in enumerate(tables):
        cat = jnp.concatenate([s[i] for s in slots])
        new.append(t.at[cat].add(1, mode="drop"))
    return tuple(new)


@partial(aot_jit, donate_argnums=(0,))
def _flush_scatter(tables, slots):
    """Apply S deferred batches' compacted buffers in one scatter per k.
    ``slots``: tuple over batches of tuples over k of int32[cap] buffers
    (-1 slots drop). One program per distinct S (the sketch flushes in
    greedy power-of-two chunks, so at most log2(S_max)+1 shapes exist).
    The concatenate is a few-MB VMEM-side copy; the scatter's ~11.6 ms
    fixed cost is paid once per flush instead of once per batch."""
    return _flush_scatter_impl(tables, slots)


@partial(
    aot_jit,
    static_argnames=("ks", "stride", "s_bits", "r_bits", "mask_positions", "packed"),
    donate_argnums=(0, 1),
)
def _update_stack(
    tables, f1s, ocount, stack, ks, stride, s_bits, r_bits, mask_positions, packed=False
):
    """Super-batch step: fold a [n, rows, width] stack of same-format wire
    batches with an on-device lax.scan — ONE host->device put and ONE
    dispatch amortize the tunneled runtime's per-call fixed costs over n
    batches. Bit-identical to n single _update calls (the same fold body
    applied in the same order). Per-sub-batch overflow flags come back
    stacked [n, nK] so the sketch can replay the exact offending wire;
    ``ocount`` accumulates their total as in _update."""

    def body(carry, codes):
        t, f = carry
        t, f, flags = _update_impl(
            t, f, codes, ks, stride, s_bits, r_bits, mask_positions, packed
        )
        return (t, f), flags

    (tables, f1s), flags = jax.lax.scan(body, (tables, f1s), stack)
    return tables, f1s, flags, ocount + flags.sum(dtype=jnp.uint32)


@partial(
    aot_jit,
    static_argnames=("ki", "ks", "stride", "s_bits", "r_bits", "mask_positions", "packed"),
    donate_argnums=(0,),
)
def _replay_update(
    tables, codes, ki, ks, stride, s_bits, r_bits, mask_positions, packed=False
):
    """Overflow replay: re-apply ONE wire batch's table update for k index
    ``ki`` with the plain full-stream scatter (exact for any density). The
    flagged batch's hot-path update was all-or-nothing-masked to nothing,
    so this lands every one of its increments exactly once; F1 was already
    exact. Compiles lazily — only runs (and only pays the big-scatter
    compile) when a compaction overflow actually happened."""
    k = ks[ki]
    idx, _f1 = sketch_scan(
        codes, (k,), stride, s_bits, r_bits, mask_positions, packed=packed
    )
    new = list(tables)
    new[ki] = tables[ki].at[idx[k]].add(1, mode="drop")
    return tuple(new)


@partial(aot_jit, static_argnames=("nk", "n"))
def _make_tables(nk, n):
    """All nK per-k table buffers in ONE program: three separate GiB-scale
    jnp.zeros calls cost ~2 s of per-call tunnel overhead at init
    (measured); one fused dispatch pays it once."""
    return tuple(jnp.zeros((n,), jnp.int32) for _ in range(nk))


@partial(aot_jit, donate_argnums=(0,))
def _merge_add(a, b):
    # donate only `a` (the output aliases it); donating `b` too is unusable
    # and makes every run print a donation warning. tree.map handles both
    # the per-k table tuples and plain arrays (f1s, sharded stacks).
    return jax.tree.map(jnp.add, a, b)


@aot_jit
def _hist_row_device(row):
    """int32[r_buck] -> int32[65536] histogram of the mod-2^16-wrapped
    counter values (compEst's p[sample][v], ntcard.cpp:240-247)."""
    return jnp.zeros((65536,), jnp.int32).at[row & 0xFFFF].add(1)


@partial(aot_jit, static_argnames=("nbins",))
def _hist_row_device_small(row, nbins):
    """int32[r_buck] -> int32[nbins] counter-value histogram via per-bin
    compare-reduce — no scatter. Each bin costs a full-row reduction
    (~5 ms at r27), so this is only for tiny bin counts; larger requests
    route to _hist_row_device_sparse. Values >= nbins are simply not
    counted (they'd land past the slice the estimator reads); bins
    0..nbins-1 are exact."""
    v = row & 0xFFFF
    return jnp.stack([(v == np.int32(b)).sum(dtype=jnp.int32) for b in range(nbins)])


_HIST_CAP = 1 << 18  # sparse-hist compaction slots (1 MB VMEM buffer)


def _hist_row_sparse_parts(row, nbins, interp):
    """No-cond core of the sparse counter-hist: (hist, cnt) where hist is
    only valid when cnt <= _HIST_CAP — the caller (host-driven finalize)
    checks cnt and substitutes the exact scatter fallback, avoiding a
    device cond over the GiB row. The whole thing is ONE pass over the row:
    the compaction kernel's prefilter mode reads counters mod 2^16 (the
    reference's uint16 wrap), keeps the in-range nonzero values, and counts
    the wrapped-zero (untouched) buckets in the same sweep
    (ops/scatter_pallas.compact_pallas). The per-bin compare-reduce
    alternative costs ~5 ms/bin at r27 (the default -c1000 would take ~30 s
    per run) and a full-row 65536-bin scatter costs seconds."""
    from ntcard_tpu.ops.scatter_pallas import compact_pallas

    vals, cnt, zero_cnt = compact_pallas(
        row, -1, _HIST_CAP, interpret=interp, prefilter=(1, nbins)
    )
    # -1 empty slots (and any overflow-row garbage) route to a discard bin:
    # .at[] WRAPS negative indices (NumPy semantics) instead of dropping
    idx2 = jnp.where(vals < 0, np.int32(nbins), vals)
    h = jnp.zeros((nbins + 1,), jnp.int32).at[idx2].add(1, mode="drop")[:nbins]
    return h.at[0].set(zero_cnt), cnt


@partial(jax.jit, static_argnames=("nbins", "interp"))
def _hist_row_device_sparse(row, nbins, interp):
    """int32[r_buck] -> int32[nbins] counter-value histogram that exploits
    table sparsity (see _hist_row_sparse_parts). A (deep-coverage) row
    whose in-range nonzero count exceeds the compaction buffer falls back
    to the exact full-row scatter under a cond — this variant exists for
    callers inside shard_map (parallel/multihost.py) where the host cannot
    branch; host-driven finalize uses the parts directly."""
    h, cnt = _hist_row_sparse_parts(row, nbins, interp)
    return jax.lax.cond(
        cnt <= np.int32(_HIST_CAP),
        lambda _: h,
        lambda vv: _hist_row_fallback(vv, nbins),
        row,
    )


def _sparse_hist_rows(tables, r_buck, nbins, interp):
    """Traced helper shared by _hists_all_sparse and _finalize_bundle: every
    (k, sample) row's sparse counter hist with its nonzero count appended —
    list of 2nK [nbins + 1] int32 vectors."""
    rows = []
    for t in tables:
        for s in range(2):
            h, c = _hist_row_sparse_parts(
                jax.lax.dynamic_slice(t, (s * r_buck,), (r_buck,)), nbins, interp
            )
            rows.append(jnp.concatenate([h, c[None]]))
    return rows


@partial(aot_jit, static_argnames=("r_buck", "nbins", "interp"))
def _hists_all_sparse(tables, r_buck, nbins, interp):
    """Every (k, sample) row's sparse hist in ONE program and ONE fetched
    array — [2nK, nbins + 1] with the row's nonzero count in the last
    column — instead of six dispatches and two fetches (each dispatch /
    fetch pays ~90 ms of tunnel RPC latency)."""
    return jnp.stack(_sparse_hist_rows(tables, r_buck, nbins, interp))


@partial(aot_jit, static_argnames=("r_buck", "nbins", "interp"))
def _finalize_bundle(tables, f1s, ocount, r_buck, nbins, interp):
    """Everything the device finalize needs in ONE program and ONE fetched
    array ([2nK+1, nbins+1] int32): every (k, sample) row's sparse counter
    hist with its nonzero count in the last column (as _hists_all_sparse),
    plus a trailer row carrying [overflow count, F1 (hi, lo) words...].
    On the tunneled runtime each D2H fetch costs ~90 ms of RPC latency;
    the unfused finalize paid three (hists, overflow count, f1s).
    NOT donating: the warm-loading path (warm_finalize) runs this on the
    live zero tables before any update."""
    rows = _sparse_hist_rows(tables, r_buck, nbins, interp)
    f1_words = jax.lax.bitcast_convert_type(f1s.reshape(-1), jnp.int32)
    trailer = jnp.zeros((nbins + 1,), jnp.int32)
    trailer = trailer.at[0].set(ocount.astype(jnp.int32))
    trailer = jax.lax.dynamic_update_slice(trailer, f1_words, (1,))
    rows.append(trailer)
    return jnp.stack(rows)


@partial(aot_jit, static_argnames=("nbins",))
def _hist_row_fallback(row, nbins):
    """Exact full-row scatter hist (bins 0..nbins-1) — the rare dense-table
    fallback the host dispatches when a row's in-range nonzero count
    exceeds _HIST_CAP."""
    v = (row & 0xFFFF).astype(jnp.int32)
    clamped = jnp.minimum(v, np.int32(nbins))
    return jnp.zeros((nbins + 1,), jnp.int32).at[clamped].add(1)[:nbins]


def _counter_hists_device(tables, r_buck, nbins):
    """sequence of nK int32[2*r_buck+1] tables -> [nK, 2, nbins] int32 —
    computed on device so only KBs cross to the host instead of the (up to
    1 GB/k) table itself. One dispatch per (k, sample) row keeps the peak
    HBM temp at one 4*r_buck-byte slice instead of a full-table copy (at
    the default rBits=27 and 3 k values the all-at-once variant added 3.2
    GiB on top of the live tables and exhausted a 16 GB part). Small bin
    counts use the scatter-free compare-reduce kernel; a (rare) large
    cov_max falls back to the full 65536-bin scatter."""
    nk = len(tables)
    if 32 < nbins < 65536:
        # sparse path: one fused program for all rows; the host checks the
        # per-row nonzero counts and substitutes the exact scatter fallback
        # for (rare, deep-coverage) dense rows — a host-level branch, free
        # of the device cond-over-big-operand penalty
        interp = jax.devices()[0].platform != "tpu"
        combined = np.asarray(_hists_all_sparse(tables, r_buck, nbins, interp))
        hists, cnts = combined[:, :nbins], combined[:, nbins]
        for r in np.flatnonzero(cnts > _HIST_CAP):
            i, s = divmod(int(r), 2)
            hists[r] = np.asarray(
                _hist_row_fallback(tables[i][s * r_buck : (s + 1) * r_buck], nbins)
            )
        return hists.reshape(nk, 2, nbins)
    fn = (
        partial(_hist_row_device_small, nbins=nbins) if nbins <= 32 else _hist_row_device
    )
    rows = [
        fn(tables[i][s * r_buck : (s + 1) * r_buck])
        for i in range(nk)
        for s in range(2)
    ]
    return jnp.stack(rows)[:, :nbins].reshape(nk, 2, nbins)


def _counter_hists(tables, r_buck, nbins: int = 65536):
    """Counter-value histograms over bins 0..nbins-1 ([nK, 2, nbins] int32)
    of a sequence of nK per-k tables (int32[2*r_buck(+1)] each), routed by
    where they live: XLA's CPU scatter is serial and pathologically slow at
    rBits=27 (tens of seconds for 2^28 elements), so host tables go through
    the native threaded histogram / np.bincount (~0.5 s/GiB); on
    accelerators the table never crosses the (slow) device->host link —
    small nbins (the estimator reads cov_max+1 bins) use a scatter-free
    compare-reduce."""
    t0 = tables[0]
    dev = next(iter(t0.devices())) if hasattr(t0, "devices") else None
    if dev is not None and dev.platform != "cpu":
        return _counter_hists_device(tables, r_buck, nbins)
    from ntcard_tpu import native

    nk = len(tables)
    out = np.empty((nk, 2, 65536), np.int64)
    for i in range(nk):
        arr = np.asarray(tables[i])  # zero-copy view when host-resident
        for s in range(2):
            row = arr[s * r_buck : (s + 1) * r_buck]  # contiguous view
            h = native.hist_u16(row)
            if h is None:
                h = np.bincount(row.astype(np.uint16), minlength=65536)
            out[i, s] = h
    return out[:, :, :nbins].astype(np.int32)


class DeferredReplayMixin:
    """The pending/reap side of the deferred-overflow-replay contract
    (_table_add docstring), shared by the single-device and sharded
    sketches: per-batch overflow flags plus a running count ride the device;
    the host checks the count once per NTCARD_REPLAY_LAG batches — reading
    the MIDDLE pending entry's count mid-stream (computed half a window ago:
    latency-only, never syncing in-flight work; flush reads the newest) —
    and drops the covered window without per-batch fetches when it is
    unchanged (the always case). A changed count fans out to the subclass's
    ``_replay_flagged``. Tracking engages only when overflow is possible at
    all (big-table sparse path): the r_bits <= 16 hist path and the plain
    XLA scatter are exact by construction, and retaining wires / fetching
    counts there would cost HBM and ~90 ms tunnel RPCs for nothing."""

    def _init_replay(self) -> None:
        self._pending: list = []
        self._ocount = jnp.zeros((), jnp.uint32)
        self._reaped = 0
        self._replay_lag = int(os.environ.get("NTCARD_REPLAY_LAG", "32"))
        self.replays = 0  # overflowed (batch, k) replays issued (stats/tests)
        self._can_overflow = _sparse_mode() != "off" and self.r_bits > 16

    def _track_replay(self, flags, wire, packed) -> None:
        if not self._can_overflow:
            return
        self._pending.append((flags, self._ocount, wire, packed))
        if len(self._pending) >= self._replay_lag:
            self._reap_window()

    def _reap_window(self, flush: bool = False, known_count: int | None = None) -> None:
        if not self._pending:
            return
        m = len(self._pending) - 1
        if not flush:
            m = min(self._replay_lag // 2, m)
        if flush and known_count is not None:
            # finalize already fetched the newest overflow count inside its
            # fused bundle (_finalize_bundle trailer) — reuse it instead of
            # paying another ~90 ms tunnel fetch for self._pending[m][1]
            count = known_count
        else:
            count = int(np.asarray(self._pending[m][1]))
        window, self._pending = self._pending[: m + 1], self._pending[m + 1 :]
        if count == self._reaped:
            return
        self._reaped = count
        for flags, _oc, wire, packed in window:
            f = np.asarray(flags)
            if f.any():
                self._replay_flagged(f, flags, wire, packed)

    def _flush_replays(self, known_count: int | None = None) -> None:
        """Settle every pending overflow flag (finalize/save/merge must see
        fully-applied tables). ``known_count``: the already-fetched newest
        overflow count, when the caller has one."""
        self._reap_window(flush=True, known_count=known_count)


class ChainedCountTableSketch:
    """N independent CountTableSketch donation chains fed round-robin, merged
    at finalize. On the tunneled TPU runtime, consecutive updates of ONE
    donated table serialize their dispatch RPCs; two independent chains let
    transfers/dispatches interleave (measured ~1.6x end-to-end). The fold
    commutes, so the merged result is bit-identical to a single chain."""

    def __init__(self, *args, n_chains: int = 2, **kwargs):
        probe = CountTableSketch(*args, **kwargs)
        # chains multiply resident table HBM; cap them so total table bytes
        # stay within budget (default-r27 multi-k tables are GiB-scale).
        # Measured: a second 3.2 GiB chain does NOT help r27 multi-k (the
        # batch step is compute-bound, and finalize pays a GiB-scale merge),
        # so the 4 GiB default deliberately collapses r27 multi-k to one
        # chain while r<=20 runs keep two.
        budget = int(os.environ.get("NTCARD_CHAIN_TABLE_BYTES", 4 << 30))
        # from the config, NOT probe.tables (those allocate lazily)
        table_bytes = len(probe.ks) * (2 * probe.r_buck + 1) * 4
        n_chains = max(1, min(n_chains, budget // max(table_bytes, 1)))
        self._chains = [probe] + [
            CountTableSketch(*args, **kwargs) for _ in range(n_chains - 1)
        ]
        self._i = 0
        s0 = self._chains[0]
        self.ks, self.s_bits, self.r_bits = s0.ks, s0.s_bits, s0.r_bits
        self.stride, self.gap_positions, self.r_buck = s0.stride, s0.gap_positions, s0.r_buck

    @property
    def replays(self) -> int:
        return sum(c.replays for c in self._chains)

    def update(self, codes, packed: bool = False) -> None:
        self._chains[self._i].update(codes, packed=packed)
        self._i = (self._i + 1) % len(self._chains)

    def merged(self) -> "CountTableSketch":
        head = self._chains[0]
        head._flush_replays()  # merge_ flushes both sides, but a 1-chain
        head._flush_deferred()  # merged() must settle head too
        for other in self._chains[1:]:
            head.merge_(other)
        self._chains = [head]
        self._i = 0
        return head

    def save(self, path: str) -> None:
        self.merged().save(path)

    def merge_host_(self, host) -> None:
        self._chains[0].merge_host_(host)

    def warm_update(self, wire_rows: int, wire_cols: int, packed) -> list:
        # the update programs are module-level and shape-keyed, so one
        # preload serves every chain
        return self._chains[0].warm_update(wire_rows, wire_cols, packed)

    def warm_finalize(self, cov_max: int = 65535) -> list:
        """Pre-load the finalize executables (CountTableSketch.warm_finalize)
        — one load serves every chain (identical program signatures). With
        >1 chain the finalize-time merge program is warmed too, but ONLY
        when its dummy operands are cheap: at 2-chain boundary configs
        (e.g. single-k rBits=27, ~1.07 GiB/table) the two extra table sets
        would be a multi-GiB transient HBM spike racing the live update
        allocations — there, finalize just pays the one-time load."""
        threads = self._chains[0].warm_finalize(cov_max=cov_max)
        nk = len(self.ks)
        table_bytes = 2 * nk * (2 * self.r_buck + 1) * 4  # both dummy sets
        if len(self._chains) > 1 and table_bytes <= (256 << 20):
            import threading

            def _w_merge():
                try:
                    a = _make_tables(nk, 2 * self.r_buck + 1)
                    b = _make_tables(nk, 2 * self.r_buck + 1)
                    _merge_add(a, b)
                except Exception:
                    pass

            t = threading.Thread(target=_w_merge, daemon=True)
            t.start()
            threads.append(t)
        return threads

    def finalize(self, return_table: bool = False, cov_max: int = 65535):
        if len(self._chains) == 1:
            # skip merged()'s pre-flush: the chain's own finalize settles
            # overflow replays with the count already in its fused bundle
            # fetch (one tunnel RPC instead of two)
            return self._chains[0].finalize(return_table=return_table, cov_max=cov_max)
        return self.merged().finalize(return_table=return_table, cov_max=cov_max)


class CountTableSketch(DeferredReplayMixin):
    """Streaming ntcard sketch over one device.

    feed [B, L] uint8 batches via :meth:`update`; :meth:`finalize` returns
    the reference-equivalent counter-value histograms (and, on request, the
    raw uint16 tables) plus exact F1 counts."""

    def __init__(
        self,
        ks: Sequence[int],
        s_bits: int,
        r_bits: int,
        stride: int,
        gap_positions: Sequence[int] | None = None,
    ):
        if stride % 8 or stride < 8:
            raise ValueError(
                f"stride ({stride}) must be a positive multiple of 8 — use "
                "io.packing.aligned_stride(chunk_len, kmax) so the sketch and "
                "packer agree on window ownership"
            )
        self.ks = tuple(ks)
        self.s_bits = s_bits
        self.r_bits = r_bits
        self.stride = stride
        self.gap_positions = tuple(gap_positions) if gap_positions else None
        self.r_buck = 1 << r_bits
        nk = len(self.ks)
        # per-k SEPARATE table buffers (see _update_impl: a stacked [nK, T]
        # operand crosses the ~2.1 GiB scatter cliff at the default rBits=27).
        # Allocated LAZILY: the first update runs _update_first, which fuses
        # the zero-fill into the update program — one executable load fewer
        # on the cold-start critical path. Readers of .tables (merge, save,
        # finalize on an empty sketch, multihost helpers) transparently get
        # zero tables via the property.
        self._tables = None
        self.f1s = jnp.zeros((nk, 2), jnp.uint32)  # (hi, lo) u64 accumulators
        self._f1_loaded = [0] * nk  # merged-in totals from load/merge_
        self._init_replay()  # deferred overflow replay (DeferredReplayMixin)
        # scatter deferral (see _update_defer/_flush_scatter): pending
        # compacted per-batch buffers, applied S at a time
        self._defer_max = _defer_slots(r_bits)
        self._defer_vals: list = []

    @property
    def tables(self):
        if self._tables is None:
            self._tables = _make_tables(len(self.ks), 2 * self.r_buck + 1)
        return self._tables

    @tables.setter
    def tables(self, value):
        self._tables = value

    def _f1_totals(self):
        """Exact per-k F1 as Python ints (single device->host transfer)."""
        vals = np.asarray(self.f1s)
        return [
            self._f1_loaded[i] + ((int(vals[i, 0]) << 32) | int(vals[i, 1]))
            for i in range(len(self.ks))
        ]

    def warm_update(self, wire_rows: int, wire_cols: int, packed) -> list:
        """Pre-load the first-batch and steady-state update executables on
        background threads (utils/aot.preload) for a known wire geometry —
        on the tunneled runtime each program's first call otherwise pays a
        ~0.7-4 s executable load serially in front of the first dispatch;
        started from the CLI boot thread the loads overlap input decode and
        the first H2D puts. A geometry mismatch (e.g. a per-batch nibble
        fallback) just wastes the preload — the real call loads its own
        program exactly as before. Returns the started threads."""
        import threading

        from jax import ShapeDtypeStruct

        nk = len(self.ks)
        spec_args = (
            ShapeDtypeStruct((nk, 2), jnp.uint32),
            ShapeDtypeStruct((), jnp.uint32),
            ShapeDtypeStruct((wire_rows, wire_cols), jnp.uint8),
            self.ks,
            self.stride,
            self.s_bits,
            self.r_bits,
            self.gap_positions,
            packed,
        )
        if self._defer_max > 0:
            # the deferral path never runs _update_first (batch 1 defers
            # too; tables allocate inside the first flush) — ONE big
            # update program covers the whole stream
            targets = [(_update_defer, spec_args)]
        else:
            tables_spec = tuple(
                ShapeDtypeStruct((2 * self.r_buck + 1,), jnp.int32)
                for _ in range(nk)
            )
            targets = [
                (_update_first, spec_args),
                (_update, (tables_spec,) + spec_args),
            ]
        targets = [(fn, args) for fn, args in targets if hasattr(fn, "preload")]

        # ONE thread, in dispatch order: the preload cost is dominated by
        # client-side tracing (~2 s of pure Python for the r27 3-k
        # program), which the GIL serializes anyway — two concurrent
        # preloads would each take ~2x wall and the FIRST dispatch blocks
        # on _update_first alone. Sequential ordering readies the
        # first-batch program ~2 s sooner; the steady-state program warms
        # while batch 1 executes.
        def _warm_all():
            for fn, args in targets:
                fn.preload(*args)

        t = threading.Thread(target=_warm_all, daemon=True, name="ntcard-aot-warm")
        t.start()
        return [t]

    def update(self, codes: np.ndarray, packed: bool = False) -> None:
        """codes: [B, L] uint8, or a wire batch when ``packed`` (see
        io/packing.py) — or a [n, rows, width] stack of same-format wire
        batches (pipeline superbatching), folded by one scanning dispatch."""
        if self._defer_max > 0 and codes.ndim == 2:
            # deferred-scatter hot path FROM BATCH 1: no table operands in
            # the dispatch at all — the tables allocate inside the first
            # flush (_flush_scatter_first), so a cold deferral-path run
            # traces and loads ONE big update program instead of two
            # (_update_first's trace + ~10 MB executable drop off the
            # round-5 cold-start critical chain); pending buffers fold
            # into one scatter per k every S batches
            vals, self.f1s, flags, self._ocount = _update_defer(
                self.f1s,
                self._ocount,
                codes,
                self.ks,
                self.stride,
                self.s_bits,
                self.r_bits,
                self.gap_positions,
                packed,
            )
            self._defer_vals.append(vals)
            if len(self._defer_vals) >= self._defer_max:
                self._flush_deferred()
        elif self._tables is None and codes.ndim == 2:
            # first batch, direct path: table alloc fused into the update
            # program (one executable load fewer on a cold start)
            self._tables, self.f1s, flags, self._ocount = _update_first(
                self.f1s,
                self._ocount,
                codes,
                self.ks,
                self.stride,
                self.s_bits,
                self.r_bits,
                self.gap_positions,
                packed,
            )
        else:
            fn = _update_stack if codes.ndim == 3 else _update
            self.tables, self.f1s, flags, self._ocount = fn(
                self.tables,
                self.f1s,
                self._ocount,
                codes,
                self.ks,
                self.stride,
                self.s_bits,
                self.r_bits,
                self.gap_positions,
                packed,
            )
        self._track_replay(flags, codes, packed)

    def _flush_deferred(self) -> None:
        """Apply pending deferred-scatter buffers in greedy power-of-two
        chunks (at most log2(S)+1 distinct _flush_scatter program shapes
        ever exist). Every reader of .tables (finalize/save/merge) calls
        this first; replay does not need to (scatter-adds commute). The
        VERY first flush allocates the tables inside its own program
        (_flush_scatter_first — bit-identical to flushing into fresh
        zeros), keeping the cold path at one table-allocating program."""
        while self._defer_vals:
            n = 1 << (len(self._defer_vals).bit_length() - 1)
            chunk, self._defer_vals = self._defer_vals[:n], self._defer_vals[n:]
            if self._tables is None:
                self._tables = _flush_scatter_first(
                    tuple(chunk), len(self.ks), 2 * self.r_buck + 1
                )
            else:
                self._tables = _flush_scatter(self._tables, tuple(chunk))

    def _replay_flagged(self, f, _flags_dev, codes, packed) -> None:
        """f: [nK] or [n, nK] (superbatch stack) numpy overflow flags."""
        if f.ndim == 1:
            f = f[None]
            stack = [codes]
        else:
            stack = [codes[j] for j in range(f.shape[0])]
        for j in range(f.shape[0]):
            for i in range(len(self.ks)):
                if f[j, i]:
                    self.replays += 1
                    self.tables = _replay_update(
                        self.tables,
                        stack[j],
                        i,
                        self.ks,
                        self.stride,
                        self.s_bits,
                        self.r_bits,
                        self.gap_positions,
                        packed,
                    )

    def save(self, path: str) -> None:
        """Checkpoint the sketch state (pure, commutative — partial runs can
        be merged offline; the reference has no equivalent, SURVEY.md §5)."""
        from ntcard_tpu.utils.aot import check_trace_verifications

        check_trace_verifications()  # fast-key loads must verify first
        self._flush_replays()
        self._flush_deferred()
        np.savez_compressed(
            path,
            tables=np.asarray(self.tables),
            f1s=np.asarray(self._f1_totals(), np.int64),
            ks=np.asarray(self.ks, np.int64),
            s_bits=self.s_bits,
            r_bits=self.r_bits,
            stride=self.stride,
            gap=np.asarray(self.gap_positions or [], np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "CountTableSketch":
        z = np.load(path)
        gap = tuple(int(x) for x in z["gap"]) or None
        self = cls(
            tuple(int(k) for k in z["ks"]),
            int(z["s_bits"]),
            int(z["r_bits"]),
            int(z["stride"]),
            gap_positions=gap,
        )
        self.tables = tuple(jnp.asarray(z["tables"][i]) for i in range(len(self.ks)))
        self._f1_loaded = [int(v) for v in z["f1s"]]
        return self

    def merge_(self, other: "CountTableSketch") -> None:
        """Fold another sketch's counts into this one (sum merge). The full
        hash configuration must match — merging sketches built with different
        spaced seeds or strides would silently sum semantically incompatible
        tables."""
        mine = (self.ks, self.s_bits, self.r_bits, self.stride, self.gap_positions)
        theirs = (other.ks, other.s_bits, other.r_bits, other.stride, other.gap_positions)
        if mine != theirs:
            raise ValueError(
                f"sketch configs differ; cannot merge ({mine} vs {theirs})"
            )
        self._flush_replays()
        other._flush_replays()
        self._flush_deferred()
        other._flush_deferred()
        # donate both operands: at default rBits the tables are GiB-scale,
        # and a non-donating add would hold three copies live mid-merge
        self.tables = _merge_add(self.tables, other.tables)
        other.tables = None
        self._f1_loaded = [a + b for a, b in zip(self._f1_loaded, other._f1_totals())]

    def merge_host_(self, host) -> None:
        """Fold a HostCountTableSketch's counts into this device sketch (the
        hybrid-engine merge): the host's uint16 table rides one small H2D put
        and sums into the int32 table — summing uint16-wrapped counts mod
        2^16 equals summing unwrapped counts mod 2^16, so finalize's wrap
        recovers the exact single-engine histogram. Only sensible when the
        host table is small (the CLI gates hybrid on r_bits)."""
        mine = (self.ks, self.s_bits, self.r_bits, self.stride, self.gap_positions)
        theirs = (host.ks, host.s_bits, host.r_bits, host.stride, host.gap_positions)
        if mine != theirs:
            raise ValueError(f"sketch configs differ; cannot merge ({mine} vs {theirs})")
        self._flush_replays()
        self._flush_deferred()
        nk = len(self.ks)
        padded = []
        for i in range(nk):
            t32 = np.zeros((2 * self.r_buck + 1,), np.int32)
            t32[: 2 * self.r_buck] = host.tables[i]
            padded.append(jnp.asarray(t32))
        self.tables = _merge_add(self.tables, tuple(padded))
        self._f1_loaded = [a + int(b) for a, b in zip(self._f1_loaded, host.f1s)]

    def _bundle_ok(self, nbins: int) -> bool:
        """The fused one-fetch finalize applies on accelerator platforms in
        the sparse-hist bin range (the same routing as _counter_hists), and
        needs the trailer row to fit the F1 words. NTCARD_FINALIZE=fused
        forces it on CPU (tests, via the Pallas interpreter);
        NTCARD_FINALIZE=unfused disables it."""
        shape_ok = 32 < nbins < 65536 and nbins >= 2 * len(self.ks) + 1
        env = os.environ.get("NTCARD_FINALIZE", "auto")
        if env == "fused":
            return shape_ok
        if env == "unfused":
            return False
        dev = next(iter(self.tables[0].devices())) if hasattr(self.tables[0], "devices") else None
        return dev is not None and dev.platform != "cpu" and shape_ok

    def _finalize_fused(self, nbins: int):
        """One program + ONE D2H fetch for hists, overflow count and F1
        (_finalize_bundle): -> (hists [nK, 2, nbins] int64, f1 totals list).
        The overflow flush reuses the bundled count, so the common case
        (no overflow) adds zero fetches; a flush that actually replays
        (rare) invalidates the optimistic hists and recomputes."""
        interp = jax.devices()[0].platform != "tpu"
        nk = len(self.ks)

        def fetch():
            combined = np.asarray(
                _finalize_bundle(
                    self.tables, self.f1s, self._ocount, self.r_buck, nbins, interp
                )
            )
            hists, cnts = combined[:-1, :nbins].copy(), combined[:-1, nbins]
            for r in np.flatnonzero(cnts > _HIST_CAP):
                i, s = divmod(int(r), 2)
                hists[r] = np.asarray(
                    _hist_row_fallback(
                        self.tables[i][s * self.r_buck : (s + 1) * self.r_buck], nbins
                    )
                )
            return hists.reshape(nk, 2, nbins), combined[-1]

        pre_replays = self.replays
        hists, trailer = fetch()
        self._flush_replays(known_count=int(trailer[0]))
        if self.replays != pre_replays:
            hists, trailer = fetch()
        words = trailer[1 : 1 + 2 * nk].astype(np.int64) & 0xFFFFFFFF
        f1s = [
            self._f1_loaded[i] + int((words[2 * i] << 32) | words[2 * i + 1])
            for i in range(nk)
        ]
        return hists, f1s

    def warm_finalize(self, cov_max: int = 65535) -> list:
        """Pre-load the finalize-bundle executable on a background thread.

        On the tunneled runtime the FIRST call of each jitted program pays
        ~0.7-1.3 s of executable-load RPC even when the server compile
        cache is warm, and loads across programs parallelize (measured,
        docs/TPU_BACKEND_NOTES.md round-4). The CLI calls this right after
        its first real update dispatch, so the finalize program loads
        during the dispatch loop instead of serializing into finalize.
        The warm call runs on the live tables — _finalize_bundle does not
        donate, its result is discarded unfetched, and it chains behind
        whatever updates are in flight (pure latency hiding)."""
        import threading

        if self._tables is None:
            return []  # nothing dispatched yet; finalize will pay its load
        nbins = min(cov_max + 1, 65536)
        if not self._bundle_ok(nbins):
            return []

        def _w_finalize():
            try:
                interp = jax.devices()[0].platform != "tpu"
                _finalize_bundle(
                    self.tables, self.f1s, self._ocount, self.r_buck, nbins, interp
                )
            except Exception:
                pass  # warm-loading is best-effort; the real call will load

        t = threading.Thread(target=_w_finalize, daemon=True)
        t.start()
        return [t]

    def finalize(self, return_table: bool = False, cov_max: int = 65535) -> Dict[int, dict]:
        """-> {k: {"hist": int64[2, <=cov_max+1], "f1": int, ["table": ...]}}.

        "hist" is compEst's counter-value histogram, computed on device and
        sliced to the cov_max+1 bins the estimator reads (device->host
        bandwidth can be the bottleneck on tunneled TPUs);
        return_table=True additionally pulls the raw uint16 table (large —
        test/debug use)."""
        from ntcard_tpu.utils.aot import check_trace_verifications

        check_trace_verifications()  # fast-key loads must verify first
        self._flush_deferred()  # pending scatter-deferral buffers first
        nbins = min(cov_max + 1, 65536)
        if self._bundle_ok(nbins):
            hists, f1s = self._finalize_fused(nbins)
        else:
            # optimistic ordering: dispatch + fetch the histograms BEFORE
            # settling overflow flags — the hist program chains after the
            # in-flight updates on device, so its fetch absorbs the drain
            # wait AND the subsequent flush fetch returns instantly (two
            # sequential ~0.5-1 s tunnel waits become one). A flush that
            # actually replays (rare) invalidates the optimistic hists;
            # recompute then.
            pre_replays = self.replays
            hists = np.asarray(_counter_hists(self.tables, self.r_buck, nbins))
            self._flush_replays()
            if self.replays != pre_replays:
                hists = np.asarray(_counter_hists(self.tables, self.r_buck, nbins))
            f1s = self._f1_totals()
        out = {}
        for i, k in enumerate(self.ks):
            out[k] = {"hist": hists[i].astype(np.int64), "f1": f1s[i]}
            if return_table:
                t = np.asarray(self.tables[i][: 2 * self.r_buck]).astype(np.uint16)
                out[k]["table"] = t.reshape(2, self.r_buck)
        return out
