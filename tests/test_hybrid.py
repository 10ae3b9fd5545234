"""Hybrid engine: work-stealing split of one batch stream between the native
host engine and the device sketch (pipeline.hybrid_feed), merged at finalize
(CountTableSketch.merge_host_).

Contract: the sketch fold commutes and uint16-wrapped counts sum mod 2^16
exactly, so ANY split — including the degenerate all-host and all-device
splits and whatever split the work-stealing happens to produce — yields
byte-identical histograms and F1 to a single-engine run.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ntcard_tpu.models.sketch import CountTableSketch
from ntcard_tpu.ops.nthash import N_CODE
from ntcard_tpu.pipeline import hybrid_feed

rng = np.random.default_rng(23)


def _codes(B, L, n_density=0.004):
    c = rng.integers(0, 4, (B, L), dtype=np.uint8)
    m = rng.random((B, L)) < n_density
    c[m] = N_CODE
    return c


def _host_sketch(ks, s_bits, r_bits, stride, **kw):
    from ntcard_tpu.models.host_engine import HostCountTableSketch, host_engine_available

    if not host_engine_available():
        pytest.skip("native host engine unavailable")
    return HostCountTableSketch(ks, s_bits, r_bits, stride, **kw)


def _final_eq(a, b, ks, cov_max=1000):
    fa, fb = a.finalize(cov_max=cov_max), b.finalize(cov_max=cov_max)
    for k in ks:
        assert fa[k]["f1"] == fb[k]["f1"]
        np.testing.assert_array_equal(fa[k]["hist"], fb[k]["hist"])


@pytest.mark.parametrize("split", [0, 2, 5])
def test_merge_host_any_split(split):
    """Explicit splits (all-device, mixed, all-host) all equal device-only."""
    ks, stride = (12, 17), 112
    batches = [_codes(128, 128) for _ in range(5)]
    ref = CountTableSketch(ks, 7, 10, stride)
    for x in batches:
        ref.update(x)

    dev = CountTableSketch(ks, 7, 10, stride)
    host = _host_sketch(ks, 7, 10, stride)
    for x in batches[:split]:
        host.update(x)
    for x in batches[split:]:
        dev.update(x)
    dev.merge_host_(host)
    _final_eq(dev, ref, ks)


def test_hybrid_feed_work_stealing():
    """The actual hybrid_feed split (nondeterministic) is bit-exact, and the
    host workers are joined before the iterator finishes."""
    ks, stride = (12,), 112
    batches = [_codes(128, 128) for _ in range(12)]
    ref = CountTableSketch(ks, 7, 10, stride)
    for x in batches:
        ref.update(x)

    dev = CountTableSketch(ks, 7, 10, stride)
    host = _host_sketch(ks, 7, 10, stride, n_threads=1)
    n_dev = 0
    for b in hybrid_feed(iter(batches), host.update):
        dev.update(b)
        n_dev += 1
    assert 0 <= n_dev <= len(batches)
    dev.merge_host_(host)
    _final_eq(dev, ref, ks)


def test_hybrid_feed_worker_error_propagates():
    def boom(_):
        raise RuntimeError("host engine exploded")

    slow = iter([_codes(16, 64) for _ in range(4)])
    with pytest.raises(RuntimeError, match="exploded"):
        for _ in hybrid_feed(slow, boom):
            pass


def test_merge_host_config_mismatch():
    dev = CountTableSketch((12,), 7, 10, 120)
    host = _host_sketch((13,), 7, 10, 120)
    with pytest.raises(ValueError, match="configs differ"):
        dev.merge_host_(host)


def test_merge_host_uint16_wrap():
    """Host counts near the uint16 wrap must sum with device counts mod 2^16
    exactly (the reference's uint16 table semantics, ntcard.cpp:437-439)."""
    dev = CountTableSketch((12,), 7, 4, 120)
    host = _host_sketch((12,), 7, 4, 120)
    host.tables[0, 3] = 65535  # forged near-wrap host count
    host.f1s[0] = 7
    # device adds 2 -> wraps to 1 (tables are a per-k tuple of buffers)
    dev.tables = (dev.tables[0].at[3].add(2),) + dev.tables[1:]
    dev.merge_host_(host)
    state = dev.finalize(cov_max=1000, return_table=True)
    assert state[12]["table"][0, 3] == 1  # (65535 + 2) % 65536
    assert state[12]["f1"] == 7


def test_cli_hll_hybrid_matches_golden(tmp_path):
    """nthll hybrid (host HLL + device, register max-merge) equals golden."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    # pin ONE device: the conftest's inherited 8-device XLA_FLAGS would make
    # the sketch sharded and silently disable hybrid (the gate warns now)
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", NTCARD_ENGINE="hybrid",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    r = subprocess.run(
        [sys.executable, "-m", "ntcard_tpu.cli_hll", "-k25",
         str(root / "tests/data/reads.fq")],
        capture_output=True, text=True, timeout=600, env=env, cwd=root,
    )
    assert r.returncode == 0, r.stderr
    assert "hybrid ignored" not in r.stderr  # the gate actually engaged
    golden = (root / "tests/golden/nthll_k25.out.good").read_text()
    assert r.stdout == golden


def test_cli_hybrid_matches_golden(tmp_path):
    """End-to-end: NTCARD_ENGINE=hybrid CLI run is byte-identical to the
    stock run (goldens are reference-exact, so this chains to the C++)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    # pin ONE device (see nthll variant above) and require the engine tag in
    # --metrics so this test can never silently cover the non-hybrid path
    env = dict(
        os.environ, JAX_PLATFORMS="cpu", NTCARD_ENGINE="hybrid",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
    )
    out = tmp_path / "hyb"
    r = subprocess.run(
        [sys.executable, "-m", "ntcard_tpu.cli", "-k12", "-c1000", "-r16",
         "--batch-rows", "256", "--metrics", "-p", str(out),
         str(root / "tests/data/reads.fq")],
        capture_output=True, text=True, timeout=600, env=env, cwd=root,
    )
    assert r.returncode == 0, r.stderr
    assert '"engine": "hybrid"' in r.stderr, r.stderr
    golden = (root / "tests/golden/reads_k12.hist.good").read_bytes()
    assert (tmp_path / "hyb_k12.hist").read_bytes() == golden


def test_tail_guard_predicate():
    """The guard's decision math, unit-tested deterministically (the
    threaded integration tests below only pin plumbing — with real sleeps
    the split itself is timing-dependent)."""
    from ntcard_tpu.pipeline import _tail_guard_should_stop

    # host does 10 batches/s; 5 remain (0.5 s of host work); device batch
    # costs 1 s -> stop
    assert _tail_guard_should_stop(40, 35, 10, 1.0, 1.0)
    # 20 remain (2 s of host work) > 1 s device batch -> keep claiming
    assert not _tail_guard_should_stop(40, 20, 10, 1.0, 1.0)
    # fast device (0.01 s/batch) is never stopped until the very tail
    assert not _tail_guard_should_stop(40, 35, 10, 1.0, 0.01)
    # no hint -> never stop
    assert not _tail_guard_should_stop(None, 35, 10, 1.0, 1.0)
    # hint proven an underestimate (compressed input: pulled >= hint) ->
    # distrust it, keep claiming
    assert not _tail_guard_should_stop(40, 40, 10, 1.0, 100.0)
    assert not _tail_guard_should_stop(40, 55, 10, 1.0, 100.0)
    # no host throughput observed yet / no device sample -> keep claiming
    assert not _tail_guard_should_stop(40, 2, 0, 1.0, 1.0)
    assert not _tail_guard_should_stop(40, 2, 10, 1.0, 0.0)


def test_tail_guard_diverts_tail_from_slow_device():
    """With total_hint, a device 10x slower than the host stops claiming
    once the host alone would finish the estimated remainder sooner — every
    batch is still processed exactly once, and the tail lands host-side."""
    import time as _t

    n = 40
    host_items, dev_items = [], []

    def host_update(b):
        _t.sleep(0.004)
        host_items.append(b)

    feed = hybrid_feed(iter(range(n)), host_update, total_hint=n)
    for b in feed:
        dev_items.append(b)
        _t.sleep(0.04)  # a put-bound device batch
    assert sorted(host_items + dev_items) == list(range(n))
    # guard engaged: with host ~10x the device, the cutoff fires while a
    # tail remains, so the device never touches the last batches (plain
    # work-stealing would leave the device racing for them to the end)
    assert max(dev_items) < n - 1, dev_items
    assert len(dev_items) < n // 2
    # the generator drained the host workers before finishing
    assert len(host_items) + len(dev_items) == n


def test_tail_guard_correctness_under_fast_device():
    """A fast device is never starved by the guard (remaining estimate too
    low only flips work host-side, which stays bit-exact; here rates make
    the guard condition never bind)."""
    import time as _t

    n = 30
    host_items, dev_items = [], []

    def host_update(b):
        _t.sleep(0.02)
        host_items.append(b)

    feed = hybrid_feed(iter(range(n)), host_update, total_hint=n)
    for b in feed:
        dev_items.append(b)
    assert sorted(host_items + dev_items) == list(range(n))
    assert len(dev_items) > n // 2  # fast device takes the bulk
