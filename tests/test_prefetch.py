"""DevicePrefetcher: ordering, exhaustion, and exception propagation."""

import time

import pytest

from cosmos_tpu.data.prefetch import DevicePrefetcher


def test_preserves_order_and_exhausts():
    out = list(DevicePrefetcher(iter(range(17)), depth=2))
    assert out == list(range(17))
    # exhausted iterator keeps raising StopIteration
    p = DevicePrefetcher(iter([1]), depth=2)
    assert next(p) == 1
    with pytest.raises(StopIteration):
        next(p)
    with pytest.raises(StopIteration):
        next(p)


def test_source_exception_reraises_in_consumer():
    def src():
        yield 1
        yield 2
        raise RuntimeError("dead worker")

    p = DevicePrefetcher(src(), depth=2)
    assert next(p) == 1
    assert next(p) == 2
    with pytest.raises(RuntimeError, match="dead worker"):
        next(p)


def test_runs_ahead_of_consumer():
    """The producer fills the queue while the consumer is idle: after a
    pause, depth items must already be buffered (the H2D-overlap
    property, minus the device)."""
    produced = []

    def src():
        for i in range(6):
            produced.append(i)
            yield i

    p = DevicePrefetcher(src(), depth=3)
    deadline = time.monotonic() + 5.0
    # producer thread should buffer depth items + hold one pending put
    while len(produced) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 3
    assert list(p) == list(range(6))


def test_depth_validation():
    with pytest.raises(ValueError):
        DevicePrefetcher(iter([]), depth=0)


def test_close_unblocks_parked_producer_and_drains():
    """Early-exit consumers (mid-epoch exception, bench loops) must be
    able to release the queued device-committed batches and stop the
    producer thread instead of leaving it parked on q.put forever."""
    import itertools
    import time

    from cosmos_tpu.data.prefetch import DevicePrefetcher

    produced = []

    def src():
        for i in itertools.count():
            produced.append(i)
            yield i

    pf = DevicePrefetcher(src(), depth=2)
    assert next(pf) == 0
    time.sleep(0.3)            # let the producer fill the queue and park
    pf.close()
    assert not pf._thread.is_alive()
    assert pf._q.empty()
    with pytest.raises(StopIteration):
        next(pf)
    pf.close()                 # idempotent
    # the epoch wrapper: an exception mid-consumption still closes
    pf2 = DevicePrefetcher(src(), depth=2)
    with pf2:
        next(pf2)
    assert not pf2._thread.is_alive()


def test_close_deadline_abandons_producer_blocked_in_iterator():
    """A producer blocked INSIDE the wrapped iterator (stalled shard read
    on a hung mount) cannot be interrupted — close() must return within
    its deadline and surface control to the caller (so the exception
    that triggered cleanup propagates) instead of deadlocking."""
    import threading

    gate = threading.Event()

    def src():
        yield 0
        gate.wait()            # a stalled remote read, never returns
        yield 1

    pf = DevicePrefetcher(src(), depth=2)
    assert next(pf) == 0
    t0 = time.monotonic()
    pf.close(timeout=0.5)
    assert time.monotonic() - t0 < 2.0   # bounded, not hung
    assert pf._q.empty()                 # queued batches released
    with pytest.raises(StopIteration):
        next(pf)
    gate.set()                 # let the daemon thread exit cleanly
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive()
