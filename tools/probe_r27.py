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
    from ntcard_tpu import _jax_config  # noqa: F401
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
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.zeros((len(KS), 2), jnp.uint32),
                jnp.zeros((), jnp.uint32),
            )

        def step(c, acc):
            t, f, oc = acc
            t, f, _flags, oc = S._update(
                t, f, oc, c, KS, stride, S_BITS, R_BITS, None, False
            )
            return t, f, oc

        dt = chained(step, batches, acc_factory)

    elif phase == "defer":
        # the production sketch at its defaults (scatter deferral ON unless
        # NTCARD_SCATTER_DEFER=0): whole-sketch wall over nb batches incl.
        # the flush scatters and finalize-side settle — the number the CLI
        # dispatch loop actually pays per batch. Round-4 measured: 43.7
        # (defer=8) vs 69.5 (defer=0) ms/batch.
        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]

        def run_sketch():
            sk = S.CountTableSketch(KS, S_BITS, R_BITS, stride)
            for b in batches:
                sk.update(b)
            sk._flush_deferred()
            return drain(sk.tables)

        run_sketch()  # compile + load
        t0 = time.perf_counter()
        run_sketch()
        dt = (time.perf_counter() - t0) / nb

    elif phase == "csf":
        # cs + the production f1 (per-k sum of the validity mask) but plain
        # uint32 accumulation — isolates the valid-sum reduction's cost
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f = acc
            idx, f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            for i, k in enumerate(KS):
                vals, cnt = compact_pallas(idx[k].reshape(-1), sent, cap)
                new_ts.append(ts[i].at[vals].add(1, mode="drop"))
                new_f = new_f + f1[k].astype(jnp.uint32)
            return tuple(new_ts), new_f

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

        dt = chained(step, batches, acc_factory)

    elif phase in ("csu64", "csu64v"):
        # csf + the exact production u64 (hi,lo) f1 carry: per-k scalar
        # slice/stack chain ("csu64") vs one vectorized [nK]-wide pass
        # ("csu64v") — isolates tiny-op dispatch overhead in the f1 update
        from functools import partial

        from ntcard_tpu.models.sketch import _u64_acc_add
        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]
        vec = phase.endswith("v")

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f1s = acc
            idx, f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            for i, k in enumerate(KS):
                vals, cnt = compact_pallas(idx[k].reshape(-1), sent, cap)
                new_ts.append(ts[i].at[vals].add(1, mode="drop"))
            if vec:
                adds = jnp.stack([f1[k].astype(jnp.uint32) for k in KS])
                new_lo = f1s[:, 1] + adds
                carry = (new_lo < adds).astype(jnp.uint32)
                new_f1s = jnp.stack([f1s[:, 0] + carry, new_lo], axis=1)
            else:
                accs = []
                for i, k in enumerate(KS):
                    hi, lo = _u64_acc_add(f1s[i, 0], f1s[i, 1], f1[k].astype(jnp.uint32))
                    accs.append(jnp.stack([hi, lo]))
                new_f1s = jnp.stack(accs)
            return tuple(new_ts), new_f1s

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.zeros((len(KS), 2), jnp.uint32),
            )

        dt = chained(step, batches, acc_factory)

    elif phase in ("condsame", "condfree"):
        # csu64 + a data-dependent per-k lax.cond around the table update,
        # with BOTH branches the sparse scatter ("condsame") or with the
        # cond's untaken branch scattering the FULL idx stream ("condfree"
        # == the production guard) — isolates whether cond-over-a-GiB-table
        # costs a copy, and whether the fallback branch's existence alone
        # (keeping the full stream alive) costs anything.
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]
        same = phase == "condsame"

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f = acc
            idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            for i, k in enumerate(KS):
                flat = idx[k].reshape(-1)
                vals, cnt = compact_pallas(flat, sent, cap)
                if same:
                    fb = lambda t, v=vals: t.at[v + np.int32(0)].add(1, mode="drop")
                else:
                    fb = lambda t, v=flat: t.at[v].add(1, mode="drop")
                new_ts.append(
                    jax.lax.cond(
                        cnt <= np.int32(cap),
                        lambda t, v=vals: t.at[v].add(1, mode="drop"),
                        fb,
                        ts[i],
                    )
                )
                new_f = new_f + cnt.astype(jnp.uint32)
            return tuple(new_ts), new_f

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

        dt = chained(step, batches, acc_factory)

    elif phase in ("condsmall", "conddrain"):
        # condsmall: cond with two genuinely-different SMALL branches (flip
        # defeats branch dedup) — if slow, ANY data-dependent cond over the
        # GiB donated table copies it; if fast, the condfree cost is specific
        # to the big-scatter fallback branch.
        # conddrain: the proposed production design — unconditional masked
        # sparse scatter + a cond whose rare branch drains the stream in
        # cap-sized rank windows (while_loop of compact+small-scatter).
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]
        drainv = phase == "conddrain"

        def rank_colmajor(flat):
            m = (flat != np.int32(sent)).astype(jnp.int32)
            R2 = m.reshape(-1, 1024)
            colsum = jnp.cumsum(R2, axis=0)
            totals = colsum[-1]
            offs = jnp.cumsum(totals) - totals
            return (colsum + offs[None, :]).reshape(-1)  # 1-based where mask

        def drain_windows(t, flat, cnt):
            rank = rank_colmajor(flat)
            mask = flat != np.int32(sent)

            def body(state):
                j, tt = state
                lo = j * np.int32(cap)
                hi = lo + np.int32(cap)
                sub = jnp.where(mask & (rank > lo) & (rank <= hi), flat, np.int32(sent))
                v2, _c2 = compact_pallas(sub, sent, cap)
                return j + np.int32(1), tt.at[v2].add(1, mode="drop")

            _, t = jax.lax.while_loop(
                lambda s: s[0] * np.int32(cap) < cnt, body, (np.int32(0), t)
            )
            return t

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f = acc
            idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            for i, k in enumerate(KS):
                flat = idx[k].reshape(-1)
                vals, cnt = compact_pallas(flat, sent, cap)
                ok = cnt <= np.int32(cap)
                if drainv:
                    masked = jnp.where(ok, vals, np.int32(-1))
                    t1 = ts[i].at[masked].add(1, mode="drop")
                    new_ts.append(
                        jax.lax.cond(
                            ok,
                            lambda tt: tt,
                            lambda tt, fl=flat, cc=cnt: drain_windows(tt, fl, cc),
                            t1,
                        )
                    )
                else:
                    new_ts.append(
                        jax.lax.cond(
                            ok,
                            lambda t, v=vals: t.at[v].add(1, mode="drop"),
                            lambda t, v=vals: t.at[jnp.flip(v)].add(1, mode="drop"),
                            ts[i],
                        )
                    )
                new_f = new_f + cnt.astype(jnp.uint32)
            return tuple(new_ts), new_f

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

        dt = chained(step, batches, acc_factory)

    elif phase == "whiledrain":
        # The candidate production design: unconditional all-or-nothing
        # masked sparse scatter, then a 0-trip-in-the-common-case while_loop
        # that (rarely) drains EVERY element in cap-sized rank windows —
        # no lax.cond anywhere, so the full stream is never a conditional
        # operand (condfree/conddrain measured that at ~40-50 ms/k even for
        # the untaken branch).
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]

        def table_add_drain(t, flat):
            vals, cnt = compact_pallas(flat, sent, cap)
            masked = jnp.where(cnt <= np.int32(cap), vals, np.int32(-1))
            t = t.at[masked].add(1, mode="drop")

            def cond_fn(s):
                return (cnt > np.int32(cap)) & (s[0] * np.int32(cap) < cnt)

            def body(s):
                j, tt = s
                m = (flat != np.int32(sent)).astype(jnp.int32)
                R2 = m.reshape(-1, 1024)
                colsum = jnp.cumsum(R2, axis=0)
                totals = colsum[-1]
                offs = jnp.cumsum(totals) - totals
                rank = (colsum + offs[None, :]).reshape(-1)
                lo = j * np.int32(cap)
                hi = lo + np.int32(cap)
                sub = jnp.where(
                    (flat != np.int32(sent)) & (rank > lo) & (rank <= hi),
                    flat,
                    np.int32(sent),
                )
                v2, _c2 = compact_pallas(sub, sent, cap)
                return j + np.int32(1), tt.at[v2].add(1, mode="drop")

            _, t = jax.lax.while_loop(cond_fn, body, (np.int32(0), t))
            return t, cnt

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f = acc
            idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            for i, k in enumerate(KS):
                t2, cnt = table_add_drain(ts[i], idx[k].reshape(-1))
                new_ts.append(t2)
                new_f = new_f + cnt.astype(jnp.uint32)
            return tuple(new_ts), new_f

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

        dt = chained(step, batches, acc_factory)

    elif phase == "twostep":
        # Candidate: split the batch into TWO chained dispatches — P1 =
        # hash+compact+masked scatter (the 83 ms floor), P2 = the rare-drain
        # while_loop alone (0 trips normally). If the control-flow penalty
        # is per-program-composition, isolating it in P2 leaves P1 clean and
        # P2 costs only its fixed dispatch.
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]

        @partial(jax.jit, donate_argnums=(1,))
        def step1(c, acc):
            ts, f = acc
            idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            flats = []
            cnts = []
            for i, k in enumerate(KS):
                flat = idx[k].reshape(-1)
                vals, cnt = compact_pallas(flat, sent, cap)
                masked = jnp.where(cnt <= np.int32(cap), vals, np.int32(-1))
                new_ts.append(ts[i].at[masked].add(1, mode="drop"))
                new_f = new_f + cnt.astype(jnp.uint32)
                flats.append(flat)
                cnts.append(cnt)
            return (tuple(new_ts), new_f), tuple(flats), jnp.stack(cnts)

        @partial(jax.jit, donate_argnums=(0,))
        def step2(acc, flats, cnts):
            ts, f = acc
            new_ts = []
            for i, _k in enumerate(KS):
                flat = flats[i]
                cnt = cnts[i]

                def cond_fn(s, cnt=cnt):
                    return (cnt > np.int32(cap)) & (s[0] * np.int32(cap) < cnt)

                def body(s, flat=flat):
                    j, tt = s
                    m = (flat != np.int32(sent)).astype(jnp.int32)
                    R2 = m.reshape(-1, 1024)
                    colsum = jnp.cumsum(R2, axis=0)
                    totals = colsum[-1]
                    offs = jnp.cumsum(totals) - totals
                    rank = (colsum + offs[None, :]).reshape(-1)
                    lo = j * np.int32(cap)
                    sub = jnp.where(
                        (flat != np.int32(sent))
                        & (rank > lo)
                        & (rank <= lo + np.int32(cap)),
                        flat,
                        np.int32(sent),
                    )
                    v2, _c2 = compact_pallas(sub, sent, cap)
                    return j + np.int32(1), tt.at[v2].add(1, mode="drop")

                _, t2 = jax.lax.while_loop(cond_fn, body, (np.int32(0), ts[i]))
                new_ts.append(t2)
            return tuple(new_ts), f

        def step(c, acc):
            acc1, flats, cnts = step1(c, acc)
            return step2(acc1, flats, cnts)

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

        dt = chained(step, batches, acc_factory)

    elif phase == "shardwrap":
        # per-shard step cost through the sharded path (shard_map +
        # _update_impl on a 1-device mesh) vs the plain single-chip _update
        # — VERDICT r2 #2's "per-shard step ~= single-chip step" evidence on
        # real hardware (multi-chip isn't available; the wrapper overhead
        # and the per-shard program are what this isolates).
        import jax.numpy as jnp2  # noqa: F401

        from ntcard_tpu.parallel.data_parallel import (
            ShardedCountTableSketch,
            _sketch_update_sharded,
        )

        sh = ShardedCountTableSketch(KS, S_BITS, R_BITS, stride, n_devices=1)
        # pre-put with the row sharding: the plain-update probe times
        # device-resident batches, so this must too (a per-step 8.4 MB put
        # costs ~180 ms of tunnel transfer and would swamp the comparison)
        batches = [
            jax.device_put(
                rng.integers(0, 4, (1, BATCH_ROWS, CHUNK_LEN), dtype=np.uint8),
                sh._row_sharding,
            )
            for _ in range(nb)
        ]

        def step(c, acc):
            t, f, oc = acc
            t, f, _flags, oc = _sketch_update_sharded(
                t, f, oc, c, sh.mesh, KS, stride, S_BITS, R_BITS,
                None, False,
            )
            return t, f, oc

        def acc_factory():
            return (
                tuple(jnp.zeros((1, T), jnp.int32) for _ in KS),
                jnp.zeros((1, len(KS), 2), jnp.uint32),
                jnp.zeros((), jnp.uint32),
            )

        dt = chained(step, batches, acc_factory)

    elif phase in ("shardscatter", "shardhash", "shardcs"):
        # bisect the shardwrap 5x penalty: the same isolated stages as
        # scatter3sep / hash / cs, but wrapped in a 1-device-mesh shard_map.
        from functools import partial as _partial

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        shard = NamedSharding(mesh, P("data"))

        if phase == "shardscatter":
            batches = [
                jax.device_put(
                    rng.integers(0, 2 * r_buck, (1, 3, cap), dtype=np.int32), shard
                )
                for _ in range(nb)
            ]

            @_partial(jax.jit, donate_argnums=(1,))
            def step(v, ts):
                def local(vv, tt):
                    tt = tuple(t[0] for t in tt)
                    vv = vv[0]
                    return tuple(
                        t.at[vv[i]].add(1, mode="drop")[None] for i, t in enumerate(tt)
                    )

                return jax.shard_map(
                    local, mesh=mesh, in_specs=(P("data"), P("data")),
                    out_specs=P("data"), check_vma=False,
                )(v, ts)

            dt = chained(
                step, batches,
                lambda: tuple(jnp.zeros((1, T), jnp.int32) for _ in range(3)),
            )
        else:
            batches = [
                jax.device_put(
                    rng.integers(0, 4, (1, BATCH_ROWS, CHUNK_LEN), dtype=np.uint8),
                    shard,
                )
                for _ in range(nb)
            ]
            if phase == "shardhash":

                @jax.jit
                def step(c, acc):
                    def local(cc):
                        idx, _f1 = sketch_scan(cc[0], KS, stride, S_BITS, R_BITS, None)
                        s = jnp.int32(0)
                        for k in KS:
                            s = s + jnp.sum(idx[k], dtype=jnp.int32)
                        return s[None]

                    out = jax.shard_map(
                        local, mesh=mesh, in_specs=(P("data"),),
                        out_specs=P("data"), check_vma=False,
                    )(c)
                    return acc + out.sum()

                dt = chained(step, batches, lambda: jnp.int32(0))
            else:  # shardcs: hash + compact + scatter + f1 inside shard_map
                from ntcard_tpu.ops.scatter_pallas import compact_pallas

                @_partial(jax.jit, donate_argnums=(1,))
                def step(c, acc):
                    def local(cc, tt, ff):
                        tt = tuple(t[0] for t in tt)
                        cc = cc[0]
                        f = ff[0]
                        idx, _f1 = sketch_scan(cc, KS, stride, S_BITS, R_BITS, None)
                        new_ts = []
                        for i, k in enumerate(KS):
                            vals, cnt = compact_pallas(idx[k].reshape(-1), sent, cap)
                            new_ts.append(tt[i].at[vals].add(1, mode="drop")[None])
                            f = f + cnt.astype(jnp.uint32)
                        return tuple(new_ts), f[None]

                    ts, f = acc
                    ts, f = jax.shard_map(
                        local, mesh=mesh, in_specs=(P("data"), P("data"), P("data")),
                        out_specs=(P("data"), P("data")), check_vma=False,
                    )(c, ts, f)
                    return ts, f

                def acc_factory():
                    return (
                        tuple(jnp.zeros((1, T), jnp.int32) for _ in KS),
                        jnp.zeros((1,), jnp.uint32),
                    )

                dt = chained(step, batches, acc_factory)

    elif phase in ("cs", "csnof1"):
        # hash + per-k compact + per-k scatter into donated separate tables,
        # WITHOUT the f1 accumulation / cond ("csnof1") or with plain uint32
        # f1 sums replacing the u64 (hi,lo) carry chain ("cs") — bisects the
        # ~150 ms gap between the composed production step (236 ms) and the
        # sum of its isolated phases (~87 ms).
        from functools import partial

        from ntcard_tpu.ops.scatter_pallas import compact_pallas

        batches = [
            jnp.asarray(rng.integers(0, 4, (BATCH_ROWS, CHUNK_LEN), dtype=np.uint8))
            for _ in range(nb)
        ]
        with_f1 = phase == "cs"

        @partial(jax.jit, donate_argnums=(1,))
        def step(c, acc):
            ts, f = acc
            idx, _f1 = sketch_scan(c, KS, stride, S_BITS, R_BITS, None)
            new_ts = []
            new_f = f
            for i, k in enumerate(KS):
                vals, cnt = compact_pallas(idx[k].reshape(-1), sent, cap)
                new_ts.append(ts[i].at[vals].add(1, mode="drop"))
                if with_f1:
                    new_f = new_f + cnt.astype(jnp.uint32)
            return tuple(new_ts), new_f

        def acc_factory():
            return (
                tuple(jnp.zeros((T,), jnp.int32) for _ in KS),
                jnp.uint32(0),
            )

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
