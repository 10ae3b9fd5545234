"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/collective tests run anywhere (the real-TPU path is exercised by
bench.py and the driver's compile checks). The environment may pre-set
JAX_PLATFORMS to the real TPU platform — override it unconditionally."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The CLIs now use an already-serving warm-pool daemon by DEFAULT
# (daemon.py probe mode). Tests must never route through a stray daemon on
# the machine's default socket path; the daemon tests opt back in with
# explicit NTCARD_DAEMON=1 + a private NTCARD_DAEMON_SOCK.
os.environ.setdefault("NTCARD_DAEMON", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container may inject a TPU platform plugin that wins over JAX_PLATFORMS;
# the config knob (applied before first backend init) is authoritative.
import jax

jax.config.update("jax_platforms", "cpu")
