"""ntcard-tpu: a TPU-native k-mer cardinality estimation framework.

Capability parity with bcgsc/ntCard v1.2.2 (ntcard + nthll), redesigned for
TPU: batched rolling-hash scan kernels over a packed base stream, pure
functional sketch state merged with collectives, and a host C++/Python I/O
layer. See SURVEY.md for the full blueprint.
"""

import os

import jax

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

__version__ = "1.0.0"
