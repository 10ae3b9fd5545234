"""pipeline.EagerPrefetch semantics: eager start, order preservation,
exception propagation (the decode error contract rides SystemExit through
it), and close() abandoning a stream without deadlock."""

import threading
import time

import numpy as np
import pytest

from ntcard_tpu.pipeline import EagerPrefetch, device_prefetch


def test_eager_start_and_order():
    started = threading.Event()

    def gen():
        started.set()
        for i in range(20):
            yield i

    it = EagerPrefetch(gen(), depth=3)
    # the worker starts at construction, before any next()
    assert started.wait(timeout=5.0)
    assert list(it) == list(range(20))


def test_exception_propagates_after_queued_items():
    def gen():
        yield 1
        yield 2
        raise SystemExit(1)

    it = EagerPrefetch(gen(), depth=8)
    got = []
    with pytest.raises(SystemExit):
        for x in it:
            got.append(x)
    assert got == [1, 2]


def test_close_abandons_stream_promptly():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i
            time.sleep(0.001)

    it = EagerPrefetch(gen(), depth=2)
    assert next(it) == 0
    t0 = time.perf_counter()
    it.close()
    assert time.perf_counter() - t0 < 6.0
    # the worker stopped long before draining the stream
    time.sleep(0.1)
    n = len(produced)
    time.sleep(0.2)
    assert len(produced) == n  # no further production after close
    with pytest.raises(StopIteration):
        next(it)


def test_device_prefetch_is_eager_and_closable():
    batches = [np.full((8, 16), i, np.uint8) for i in range(6)]
    feed = device_prefetch(iter(batches), depth=2)
    out = [np.asarray(b)[0, 0] for b in feed]
    assert out == list(range(6))
    feed2 = device_prefetch(iter(batches), depth=2)
    next(iter(feed2))
    feed2.close()  # must not hang or leak the inner stage
