#!/usr/bin/env python
"""Attribution probe for the default-r27 multi-k device batch step.

Round-2 measured ~540 ms/batch of device work at r27 -k64,96,128 (vs 13.3
ms/batch at r16 single-k) but could not attribute it (repeated multi-minute
server-side compiles). This script isolates one phase per PROCESS so each
program compiles once into the persistent cache and a wedged run loses only
one phase:

    python tools/probe_r27.py hash        # sketch_scan only (3 k values)
    python tools/probe_r27.py compact     # + per-k compact_pallas
    python tools/probe_r27.py update      # the real production _update step
    python tools/probe_r27.py noguard     # _update minus the overflow lax.cond
    python tools/probe_r27.py scatter     # combined small scatter into the
                                          # 3.2 GiB table, no cond
    python tools/probe_r27.py scattercond # same under a data-dependent
                                          # lax.cond with identical branches
                                          # (isolates cond-over-GiB-table cost)

Timing protocol per docs/TPU_BACKEND_NOTES.md: distinct input batches,
chained data dependency, host drain at the end, divide by step count.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

KS = (64, 96, 128)
S_BITS = 7
R_BITS = 27
CHUNK_LEN = 1024
BATCH_ROWS = 8192


def main() -> int:
    phase = sys.argv[1] if len(sys.argv) > 1 else "update"
    nb = int(os.environ.get("PROBE_BATCHES", "6"))
    if phase == "noguard":
        os.environ["NTCARD_SCATTER"] = "pallas-noguard"

    import ntcard_tpu  # noqa: F401  (platform + persistent compile cache)
    import jax
    import jax.numpy as jnp

    from ntcard_tpu.io.packing import aligned_stride
    from ntcard_tpu.models import sketch as S
    from ntcard_tpu.ops.nthash import sketch_scan

    stride = aligned_stride(CHUNK_LEN, max(KS))
    n_windows = stride * BATCH_ROWS
    r_buck = 1 << R_BITS
    T = 2 * r_buck + 1
    sent = 2 * r_buck
    cap = min(max(n_windows // 64, 128), 1 << 20)
    cap = (cap + 127) // 128 * 128

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device={dev} phase={phase} stride={stride} cap={cap}", flush=True)

    def drain(a):
        # slice ON DEVICE before np.asarray: np.asarray(full_table) would
        # fetch the whole GiB-scale buffer over the ~30 MB/s tunnel and
        # dominate the measurement (this exact bug produced bogus 5-20
        # s/batch readings for every big-table phase)
        leaf = jax.tree.leaves(a)[0]
        return np.asarray(leaf.reshape(-1)[:8])

    def chained(step, batches, acc_factory):
        # fresh accumulators for warmup and the timed pass: the production
        # step donates its table buffers, so a warmup acc cannot be reused
        a = step(batches[0], acc_factory())
        _ = drain(a)  # compile+drain
        a = acc_factory()
        t0 = time.perf_counter()
        for b in batches:
            a = step(b, a)
        _ = drain(a)
        return (time.perf_counter() - t0) / len(batches)

    if phase in ("hash", "compact"):
        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]

        if phase == "hash":

            @jax.jit
            def step(c, acc):
                idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
                for k in KS:
                    acc = acc + jnp.sum(idx[k], dtype=jnp.int32)
                return acc

        else:
            from ntcard_tpu.ops.scatter_pallas import compact_pallas

            @jax.jit
            def step(c, acc):
                idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
                for k in KS:
                    vals, cnt = compact_pallas(idx[k].reshape(-1), sent, cap)
                    acc = acc + jnp.sum(vals, dtype=jnp.int32) + cnt
                return acc

        dt = chained(step, batches, lambda: jnp.int32(0))

    elif phase in ("update", "noguard"):
        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]
        def acc_factory():
            return (
                jnp.zeros((len(KS), T), jnp.int32),
                jnp.zeros((len(KS), 2), jnp.uint32),
            )

        def step(c, acc):
            t, f = acc
            return S._update(t, f, c, KS, stride, S_BITS, R_BITS, None, False)

        dt = chained(step, batches, acc_factory)

    elif phase in ("scatter1k", "scatter2k", "scatter3sep"):
        # table-operand-size sweep: is the catastrophic combined-scatter cost
        # (17.8 s/batch for 344k updates into the 3-k 3.2 GiB flat table) a
        # >2^31-byte operand cliff? 1k = one [T] table (1.07 GB), 2k = one
        # [2T] flat table (2.1 GiB), 3sep = three separate [T] tables updated
        # in one program (the proposed production layout).
        from functools import partial

        nk_probe = {"scatter1k": 1, "scatter2k": 2, "scatter3sep": 3}[phase]
        if phase == "scatter3sep":
            batches = [
                tuple(
                    jnp.asarray(rng.integers(0, 2 * r_buck, cap, dtype=np.int32))
                    for _ in range(3)
                )
                for _ in range(nb)
            ]

            @partial(jax.jit, donate_argnums=(1,))
            def step(vs, ts):
                return tuple(t.at[v].add(1, mode="drop") for t, v in zip(ts, vs))

            dt = chained(
                step, batches, lambda: tuple(jnp.zeros((T,), jnp.int32) for _ in range(3))
            )
            mbps = n_windows / dt / 1e6
            print(
                f"{phase}: {dt * 1e3:.1f} ms/batch  ({mbps:.1f} Mwindows/s, "
                f"{nb} distinct batches)",
                flush=True,
            )
            return 0
        batches = [
            jnp.asarray(
                np.concatenate(
                    [
                        rng.integers(0, 2 * r_buck, cap, dtype=np.int64) + i * T
                        for i in range(nk_probe)
                    ]
                ).astype(np.int32)
            )
            for _ in range(nb)
        ]

        @partial(jax.jit, donate_argnums=(1,))
        def step(v, t):
            return t.at[v].add(1, mode="drop")

        dt = chained(step, batches, lambda: jnp.zeros((nk_probe * T,), jnp.int32))

    elif phase in ("scatter", "scattercond"):
        # combined small scatter into the flattened 3-k big table: cap*nk
        # random in-range offsets per batch (slightly pessimistic — the
        # production buffers are ~85% -1 slots, but drop-mode scatters cost
        # the same either way per TPU_BACKEND_NOTES)
        batches = [
            jnp.asarray(
                np.concatenate(
                    [
                        rng.integers(0, 2 * r_buck, cap, dtype=np.int64) + i * T
                        for i in range(len(KS))
                    ]
                ).astype(np.int32)
            )
            for _ in range(nb)
        ]
        from functools import partial

        if phase == "scatter":

            @partial(jax.jit, donate_argnums=(1,))
            def step(v, t):
                return t.reshape(-1).at[v].add(1, mode="drop").reshape(len(KS), T)

        else:

            @partial(jax.jit, donate_argnums=(1,))
            def step(v, t):
                ok = v[0] < np.int32(2**30)  # data-dependent, always true

                def go(tt):
                    return (
                        tt.reshape(-1).at[v].add(1, mode="drop").reshape(len(KS), T)
                    )

                def go2(tt):
                    return (
                        tt.reshape(-1).at[v + np.int32(0)].add(1, mode="drop").reshape(len(KS), T)
                    )

                return jax.lax.cond(ok, go, go2, t)

        dt = chained(step, batches, lambda: jnp.zeros((len(KS), T), jnp.int32))

    else:
        print(f"unknown phase {phase}", file=sys.stderr)
        return 2

    mbps = n_windows / dt / 1e6
    print(
        f"{phase}: {dt * 1e3:.1f} ms/batch  ({mbps:.1f} Mwindows/s, "
        f"{nb} distinct batches)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
