#!/usr/bin/env python
"""Measured 2-host weak-scaling efficiency on the CPU 'fake cluster'
(SURVEY.md §4: jax.distributed over localhost Gloo is the DCN analog —
no multi-chip/multi-host TPU hardware exists in this container).

Protocol (weak scaling: constant work PER HOST, resources pinned so the
two-host run does not simply contend for the same cores):

  T1 = wall of ONE CLI process pinned to half the cores, processing one
       input file of S bases.
  T2 = wall of TWO jax.distributed CLI processes (coordinator on
       localhost), each pinned to its own half of the cores, each
       processing its own S-base file, INCLUDING the cross-host table
       merge at finalize (parallel/multihost.merged_finalize).

  efficiency = T1 / T2   (1.0 = perfect weak scaling)

This measures everything the reference's OpenMP scaling claim measures
(per-worker stream + merge) plus a real network merge the reference does
not have. It does NOT measure TPU ICI (no hardware); bench.py's
scaling_efficiency_proxy covers the on-chip merge cost instead.

Usage: python tools/scaling_proxy.py [--reads 150000] [--passes 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import socket
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def make_input(path: Path, n_reads: int, seed: int) -> None:
    rng = random.Random(seed)
    genome = "".join(rng.choice("ACGT") for _ in range(500_000))
    with open(path, "w") as f:
        q = "I" * 150
        for i in range(n_reads):
            s = rng.randint(0, len(genome) - 150)
            f.write(f"@r{i}\n{genome[s:s + 150]}\n+\n{q}\n")


def _env(extra: dict | None = None) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", NTCARD_FAST_EXIT="1")
    env.update(extra or {})
    return env


def _pin(cores: str) -> list:
    return ["taskset", "-c", cores] if os.path.exists("/usr/bin/taskset") else []


def run_single(fq: Path, out: Path, cores: str) -> float:
    cmd = _pin(cores) + [
        sys.executable, "-m", "ntcard_tpu.cli", "-k12", "-c64", "-r16",
        "-p", str(out), str(fq),
    ]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True, capture_output=True, cwd=str(REPO), timeout=600, env=_env())
    return time.perf_counter() - t0


def run_two_hosts(fqs: list, out: Path, core_sets: list) -> float:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    t0 = time.perf_counter()
    for pid in (0, 1):
        cmd = _pin(core_sets[pid]) + [
            sys.executable, "-m", "ntcard_tpu.cli", "-k12", "-c64", "-r16",
            "-p", str(out) + f"_h{pid}",
            "--coordinator", f"localhost:{port}",
            "--num-hosts", "2", "--host-id", str(pid),
        ] + [str(f) for f in fqs]
        procs.append(
            subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=str(REPO),
                env=_env(),
            )
        )
    for p in procs:
        _o, e = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(e.decode()[-1000:])
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=150_000, help="reads per host")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/ntcard_scaling")
    args = ap.parse_args()

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    fq0, fq1 = work / "h0.fq", work / "h1.fq"
    for f, seed in ((fq0, 1), (fq1, 2)):
        if not f.exists():
            make_input(f, args.reads, seed)

    ncpu = os.cpu_count() or 4
    half = ncpu // 2
    c0 = f"0-{half - 1}" if half > 1 else "0"
    c1 = f"{half}-{ncpu - 1}" if half > 1 else "1"

    t1 = min(run_single(fq0, work / "one", c0) for _ in range(args.passes))
    t2 = min(run_two_hosts([fq0, fq1], work / "two", [c0, c1]) for _ in range(args.passes))

    # calibrate the FIXED costs (interpreter + jax init + compile-cache
    # loads; for 2 hosts additionally jax.distributed init + the collective
    # finalize program) with a near-empty input, so the stream-scaling
    # number is separable from one-time setup that amortizes at production
    # input sizes
    tiny0, tiny1 = work / "tiny0.fq", work / "tiny1.fq"
    for f, seed in ((tiny0, 3), (tiny1, 4)):
        if not f.exists():
            make_input(f, 1000, seed)
    t1_fix = min(run_single(tiny0, work / "one_t", c0) for _ in range(args.passes))
    t2_fix = min(
        run_two_hosts([tiny0, tiny1], work / "two_t", [c0, c1])
        for _ in range(args.passes)
    )
    s1 = max(t1 - t1_fix, 1e-6)
    s2 = max(t2 - t2_fix, 1e-6)
    stream_eff = s1 / s2
    # extrapolation to 1 Gbp/host: stream seconds scale linearly with
    # input, fixed costs do not
    bases = args.reads * 150
    s1_1g = s1 * (1e9 / bases)
    eff_1gbp = min(1.0, (s1_1g + t1_fix) / (s1_1g / stream_eff + t2_fix))
    # sanity: the 2-host run's output must equal a 1-process run over BOTH
    # files (bit-exact merge) — correctness rides with the measurement
    subprocess.run(
        _pin(c0) + [sys.executable, "-m", "ntcard_tpu.cli", "-k12", "-c64",
                    "-r16", "-p", str(work / "both"), str(fq0), str(fq1)],
        check=True, capture_output=True, cwd=str(REPO), timeout=600, env=_env(),
    )
    merged = (Path(str(work / "two") + "_h0_k12.hist")).read_bytes()
    combined = (work / "both_k12.hist").read_bytes()
    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency_2host_cpu",
                "t1_sec": round(t1, 3),
                "t2_sec": round(t2, 3),
                "efficiency_whole_wall": round(t1 / t2, 4),
                "fixed_overhead_1host_sec": round(t1_fix, 3),
                "fixed_overhead_2host_sec": round(t2_fix, 3),
                "stream_efficiency": round(stream_eff, 4),
                "efficiency_extrapolated_1gbp_per_host": round(eff_1gbp, 4),
                "reads_per_host": args.reads,
                "cores_per_host": half,
                "merge_bit_exact": merged == combined,
                # both 'hosts' are pinned core-halves of ONE box: they share
                # memory bandwidth and co-tenant load, so stream_efficiency
                # LOWER-BOUNDS real 2-host efficiency
                "note": "stream_efficiency is a lower bound (shared box)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
