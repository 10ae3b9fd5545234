"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/collective tests run anywhere (the real-TPU path is exercised by
bench.py and the driver's compile checks)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
