"""Pallas TPU kernel: small-bin counter-value histogram over a GiB-scale
count table — the finalize hot op at default rBits=27.

The reference scans the whole uint16 table once per k building
p[sample][value] (ntcard.cpp:240-247). On TPU an `.at[v].add(1)` scatter
is catastrophic here: ~99% of table entries are zero, so nearly every
update collides on bin 0 and the scatter serializes (measured ~40 s for a
default-r27 3-k finalize). The estimator only ever reads bins
0..cov_max (66 at the default -c64), so this kernel makes one pass over
the table in [BLOCK_ROWS, LANES] VMEM blocks, computes per-bin
equality-count partials reduced to the lane axis, and accumulates them
into a [nbins, LANES] output that the caller sums to [nbins] — no
scatter, no collisions, HBM-bandwidth bound.

Values >= nbins are deliberately not counted: they land beyond the slice
the estimator reads (models/sketch._counter_hists semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256
LANES = 1024


def _hist_kernel(row_ref, out_ref, *, nbins):
    v = row_ref[:] & np.int32(0xFFFF)  # [BLOCK_ROWS, LANES]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    parts = [
        (v == np.int32(b)).astype(jnp.int32).sum(axis=0, keepdims=True)
        for b in range(nbins)
    ]  # nbins x [1, LANES]
    out_ref[:] += jnp.concatenate(parts, axis=0)


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def hist_small_pallas(row: jnp.ndarray, nbins: int, interpret: bool = False) -> jnp.ndarray:
    """int32[r_buck] (r_buck a multiple of BLOCK_ROWS*LANES) -> int32[nbins]
    histogram of the mod-2^16-wrapped values over bins 0..nbins-1."""
    n = row.shape[0]
    block = BLOCK_ROWS * LANES
    if n % block:
        raise ValueError(f"row length {n} must be a multiple of {block}")
    grid = n // block
    partial_counts = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=nbins),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((nbins, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbins, LANES), jnp.int32),
        interpret=interpret,
    )(row.reshape(grid * BLOCK_ROWS, LANES))
    return partial_counts.sum(axis=1)
