"""Process-level JAX configuration, applied on first import — BEFORE any
backend init — plus lazy axon PJRT-plugin registration for lean-boot
launchers.

Every module that imports ``jax`` imports this module first. The package
``__init__`` deliberately does NOT: the host-engine paths (cli's
NTCARD_ENGINE=host/auto small-input route, cli_hll's host route) never touch
jax, and importing it costs ~2.5 s of pure-Python time — material next to a
sub-second host run (measured: `python -c "import jax"` is 2.2-2.9 s on this
4-core box).

Lean boot: this container's sitecustomize (on PYTHONPATH) imports jax and
registers the axon PJRT plugin at EVERY interpreter start, so even
``python -c pass`` costs ~2.5 s. The ``bin/ntcard``/``bin/nthll`` launchers
strip that path (stashing it in NTCARD_AXON_SITE) so the interpreter starts
in ~30 ms; device runs then perform the identical registration here, lazily,
on whatever thread first imports a jax-using module (the CLI does it on a
background boot thread overlapped with input decode).
"""

from __future__ import annotations

import os
import sys


def _register_axon_if_needed() -> None:
    if "axon.register" in sys.modules:
        return  # sitecustomize (or a prior import of this module) already did it
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # not an axon-tunnel environment
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "axon" not in [p.strip() for p in plats.split(",")]:
        return  # an explicit non-axon platform selection (e.g. cpu test runs)
    # the launcher stashes the stripped PYTHONPATH entries here; fall back to
    # the container's standard location
    for entry in os.environ.get("NTCARD_AXON_SITE", "/root/.axon_site").split(":"):
        if entry and os.path.isdir(entry) and entry not in sys.path:
            sys.path.insert(0, entry)
    import uuid

    # env contract of the tunnel relay (mirrors the container sitecustomize)
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    try:
        from axon.register import register

        register(
            None,
            f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
        )
    except Exception as e:  # an unregistered backend fails loudly at devices()
        print(f"ntcard: axon PJRT registration failed: {e}", file=sys.stderr)


_register_axon_if_needed()

import jax  # noqa: E402

# Honor JAX_PLATFORMS even when a PJRT platform plugin (e.g. the axon TPU
# tunnel) is installed: the plugin otherwise wins over the env var, silently
# sending "CPU" runs to the TPU. The config knob, applied before first
# backend init, is authoritative.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

# NOTE: global x64 mode is deliberately NOT enabled — it breaks Mosaic/Pallas
# kernel compilation on TPU. Device kernels pin uint32/int32 explicitly;
# exact F1 totals (ntcard.cpp:464-466) accumulate in int32 on device and are
# drained to host Python ints before overflow (models/sketch.py).

# Persistent compilation cache: the CLI is a short-lived batch tool, so cold
# jit compiles (~30s for the fused kernel) would otherwise dominate small
# runs.
_cache_dir = os.environ.get(
    "NTCARD_TPU_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "ntcard_tpu_jit")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache support is best-effort
    pass
