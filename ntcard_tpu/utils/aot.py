"""Client-side AOT executable cache: skip the tunnel's executable-load RPC.

Why: on the tunneled TPU runtime the FIRST call of every jitted program
pays ~0.7-1.3 s of executable-load RPC even against a warm server compile
cache (measured, docs/TPU_BACKEND_NOTES.md round-4 addenda) — the compile
path re-submits HLO and the server compiles-or-cache-hits, then loads. A
serialized PJRT executable, kept CLIENT-side, skips that entire exchange:
``jax.experimental.serialize_executable.deserialize_and_load`` measured
0.05 s + a 0.65 s first run vs 0.6 s compile + 1.5 s first run for the
same tiny program in a cold process (round-5 probe). For the cold CLI the
startup chain loses one serial load per program.

Design: ``aot_jit(fn, static_argnames=..., donate_argnums=...)`` is a
drop-in replacement for ``jax.jit`` at module level for programs that are
(a) on the cold-start critical path and (b) called from host code (never
from inside another trace — a deserialized executable cannot be traced).
The wrapper keeps a per-process call cache keyed on argument
shapes/dtypes + static values, exactly like jit's own cache; on a miss it
lowers (cheap, client-side tracing), keys the DISK cache on the sha256 of
the lowered HLO text plus the jax version, platform and runtime version
(any change to the traced program or the stack changes the key), and
either deserializes a stored executable or compiles and stores one.
Results are bit-identical by construction — the executable IS the
compiled program for that exact HLO; donation semantics ride inside the
executable (verified by test_aot.py and the round-5 device probes).

Enabled on accelerator platforms by default; NTCARD_AOT=0 disables,
NTCARD_AOT=1 forces it on CPU (tests). Every failure path (serialization
unsupported, stale/corrupt payload, version skew, signature surprises)
falls back to the plain jitted function — the cache can only ever change
WHEN work happens, not what it computes.

Reference analog: none — the reference is a cold C++ binary
(/root/reference/ntcard.cpp:317-478); amortizing accelerator program
loads across process lifetimes is a TPU-native concern.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import pickle
import sys
import threading

__all__ = ["aot_jit"]

_PROTO = 1  # bump to invalidate every stored payload


def _cache_dir() -> str:
    return os.environ.get(
        "NTCARD_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "ntcard_tpu_aot"),
    )


_enabled_memo: dict = {}


def _enabled() -> bool:
    env = os.environ.get("NTCARD_AOT", "")
    hit = _enabled_memo.get(env)
    if hit is not None:
        return hit
    if env == "0":
        v = False
    elif env == "1":
        v = True
    else:
        # default: only where executable loads are expensive (accelerators)
        try:
            import jax

            v = jax.devices()[0].platform != "cpu"
        except Exception:
            v = False
    _enabled_memo[env] = v
    return v


def _stack_fingerprint() -> str:
    """Version material folded into every disk key: a payload must never
    outlive the stack that produced it."""
    import jax

    parts = [f"proto{_PROTO}", f"jax{jax.__version__}"]
    try:
        backend = jax.extend.backend.get_backend()
        parts += [backend.platform, str(backend.platform_version)]
    except Exception:
        pass
    parts.append(os.environ.get("XLA_FLAGS", ""))
    return "|".join(parts)


def _prune(cache_dir: str, cap: int = 256) -> None:
    """Drop oldest entries past the cap (each entry: .bin/.tree/.ok)."""
    try:
        names = [n for n in os.listdir(cache_dir) if n.endswith(".bin")]
        if len(names) <= cap:
            return
        names.sort(
            key=lambda n: os.path.getmtime(os.path.join(cache_dir, n))
        )
        for n in names[: len(names) - cap]:
            for suffix in (".bin", ".tree", ".ok"):
                try:
                    os.unlink(os.path.join(cache_dir, n[:-4] + suffix))
                except OSError:
                    pass
    except OSError:
        pass


class _AotFunction:
    """Callable wrapping ``jax.jit(fn, ...)`` with the disk-backed
    executable cache described in the module docstring."""

    def __init__(self, fn, static_argnames=(), donate_argnums=()):
        import jax

        self._fn = fn
        self._name = getattr(fn, "__name__", "fn")
        self._jit = jax.jit(
            fn, static_argnames=static_argnames, donate_argnums=donate_argnums
        )
        self._static = tuple(
            (static_argnames,)
            if isinstance(static_argnames, str)
            else static_argnames
        )
        self._sig = inspect.signature(fn)
        # the split below passes leading non-static params positionally
        # (donation is positional; kwargs are never donated) and statics by
        # keyword; that requires every static to TRAIL every array param
        names = list(self._sig.parameters)
        first_static = min(
            (names.index(s) for s in self._static if s in names),
            default=len(names),
        )
        self._splittable = all(
            n in self._static for n in names[first_static:]
        )
        self._calls: dict = {}
        self._lock = threading.Lock()
        self._warned = False

    # -- helpers -----------------------------------------------------------

    def _split(self, args, kwargs):
        """(array_args_positional, static_kwargs) in signature order."""
        bound = self._sig.bind(*args, **kwargs)
        bound.apply_defaults()
        arrays, statics = [], {}
        for name, val in bound.arguments.items():
            if name in self._static:
                statics[name] = val
            else:
                arrays.append(val)
        return tuple(arrays), statics

    @staticmethod
    def _placement(leaves):
        """Device id the call is pinned to: the committed single device of
        the first committed array leaf, None for default placement, or
        "multi" for sharded operands (AOT then defers to plain jit — a
        deserialized executable binds to an explicit device list, and the
        sharded engines are not on the cold-start path). A commitment to
        the DEFAULT device normalizes to None: it executes identically,
        and the preload path (ShapeDtypeStruct specs, no devices at all)
        must land on the same key as the real device_put-committed call —
        without this the boot-thread preload entry was never hit."""
        import jax

        for v in leaves:
            get = getattr(v, "devices", None)
            if callable(get):
                try:
                    ds = get()
                except Exception:
                    continue
                if len(ds) > 1:
                    return "multi"
                if len(ds) == 1 and getattr(v, "committed", True):
                    dev_id = next(iter(ds)).id
                    return None if dev_id == jax.devices()[0].id else dev_id
        return None

    def _call_key(self, arrays, statics):
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(arrays)
        shapes = tuple(
            (getattr(v, "shape", ()), str(getattr(v, "dtype", type(v))))
            for v in leaves
        )
        return (
            treedef,
            shapes,
            tuple(sorted(statics.items())),
            self._placement(leaves),
        )

    def _note(self, msg: str) -> None:
        if not self._warned and os.environ.get("NTCARD_AOT_VERBOSE"):
            sys.stderr.write(f"ntcard: aot[{self._name}]: {msg}\n")
            self._warned = True

    def _prepare(self, arrays, statics):
        """Build (or load) the compiled executable for this call shape.
        Returns a Compiled, or None to mean 'use the plain jit path'."""
        import jax
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )

        leaves = jax.tree_util.tree_leaves(arrays)
        place = self._placement(leaves)
        if place == "multi":
            raise ValueError("sharded operands: plain jit path")
        # the executable must load onto exactly the device the call is
        # pinned to (deserialize otherwise binds to EVERY client device —
        # wrong on multi-device CPU meshes); the disk payload itself is
        # device-agnostic, so one entry serves any placement
        dev_list = [
            next(
                d for d in jax.devices() if place is None or d.id == place
            )
        ]
        lowered = self._jit.lower(*arrays, **statics)
        key_material = (
            _stack_fingerprint() + "\0" + self._name + "\0" + lowered.as_text()
        )
        digest = hashlib.sha256(key_material.encode()).hexdigest()
        cache_dir = _cache_dir()
        base = os.path.join(cache_dir, digest)
        try:
            with open(base + ".bin", "rb") as fh:
                payload = fh.read()
            with open(base + ".tree", "rb") as fh:
                in_tree, out_tree = pickle.load(fh)
            compiled = deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=dev_list
            )
            # validate on FIRST deserialize, on dummy zero inputs: a broken
            # loader can produce an executable that loads cleanly and fails
            # (or poisons its async outputs) at execution — observed on the
            # XLA:CPU AOT path. Dummies mean a failure consumes no live
            # (possibly donated) state; the block forces async errors out.
            # A prior process's successful validation (the .ok marker)
            # stands in — the failure mode is deterministic per stack, and
            # the marker saves the ~0.7 s dummy execution on every later
            # cold start (load errors are still caught above regardless).
            if not os.path.exists(base + ".ok"):
                import jax.numpy as jnp

                dummies = jax.tree_util.tree_map(
                    lambda v: jax.device_put(
                        jnp.zeros(v.shape, v.dtype), dev_list[0]
                    ),
                    arrays,
                )
                out = compiled(*dummies)
                jax.block_until_ready(out)
                del out, dummies
                with open(base + ".ok", "w"):
                    pass
            self._note("loaded serialized executable")
            return compiled
        except FileNotFoundError:
            pass
        except Exception as e:
            self._note(f"stale/corrupt cache entry, recompiling: {e!r}")
            for suffix in (".bin", ".tree", ".ok"):  # self-heal for the next process
                try:
                    os.unlink(base + suffix)
                except OSError:
                    pass
        compiled = lowered.compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            os.makedirs(cache_dir, exist_ok=True)
            # write-then-rename so a concurrent process never reads a torn
            # payload (the digest names the content, so last-writer-wins
            # races are benign)
            for suffix, data in (
                (".bin", payload),
                (".tree", pickle.dumps((in_tree, out_tree))),
            ):
                tmp = base + suffix + f".tmp{os.getpid()}"
                with open(tmp, "wb") as fh:
                    fh.write(data)
                os.replace(tmp, base + suffix)
            _prune(cache_dir)
        except Exception as e:
            self._note(f"serialize unsupported here, caching skipped: {e!r}")
        return compiled

    def clear_cache(self) -> None:
        """jit-API compat: drop the in-memory call cache (trace-knob tests
        flip NTCARD_* env vars that are baked into traced programs). The
        DISK cache needs no clearing — its key is the lowered HLO text, so
        a knob flip re-traces to a different digest."""
        with self._lock:
            self._calls.clear()
        self._jit.clear_cache()

    def preload(self, *args, **kwargs) -> bool:
        """Load (deserialize or AOT-compile) the executable for this call
        shape WITHOUT running it — argument arrays may be
        ``jax.ShapeDtypeStruct`` specs. Meant for boot threads: the
        ~0.7-4 s first-call executable load then overlaps input decode
        instead of serializing in front of the first dispatch (the
        function-level lock makes a racing real call WAIT for this load
        rather than duplicate it). No-op when AOT is disabled (the plain
        jit path has no way to pre-load without executing). Returns True
        when an executable is ready."""
        if not self._splittable or not _enabled():
            return False
        try:
            arrays, statics = self._split(args, kwargs)
            key = self._call_key(arrays, statics)
        except Exception:
            return False
        if self._calls.get(key) is not None:
            return self._calls[key] is not False
        with self._lock:
            if self._calls.get(key) is None:
                try:
                    self._calls[key] = self._prepare(arrays, statics)
                except Exception as e:
                    self._note(f"preload failed: {e!r}")
                    self._calls[key] = False
            return self._calls[key] is not False

    # -- call --------------------------------------------------------------

    def __call__(self, *args, **kwargs):
        if not self._splittable or not _enabled():
            return self._jit(*args, **kwargs)
        try:
            import jax

            arrays, statics = self._split(args, kwargs)
            # under an enclosing trace (this fn used inside another jitted
            # program) a compiled executable cannot be called — inline via
            # the plain jit path exactly as before
            leaves = jax.tree_util.tree_leaves(arrays)
            if any(isinstance(v, jax.core.Tracer) for v in leaves):
                return self._jit(*args, **kwargs)
            key = self._call_key(arrays, statics)
        except Exception:
            return self._jit(*args, **kwargs)
        entry = self._calls.get(key)
        if entry is None:
            with self._lock:
                entry = self._calls.get(key)
                if entry is None:
                    try:
                        entry = self._prepare(arrays, statics)
                    except Exception as e:
                        self._note(f"aot disabled for this shape: {e!r}")
                        entry = False
                    self._calls[key] = entry
        if entry is False:
            return self._jit(*args, **kwargs)
        return entry(*arrays)


def aot_jit(fn=None, *, static_argnames=(), donate_argnums=()):
    """``jax.jit`` drop-in with the client-side AOT executable cache.
    Usable bare (``@aot_jit``) or with the jit kwargs this codebase uses."""
    if fn is None:
        return lambda f: _AotFunction(
            f, static_argnames=static_argnames, donate_argnums=donate_argnums
        )
    return _AotFunction(
        fn, static_argnames=static_argnames, donate_argnums=donate_argnums
    )
