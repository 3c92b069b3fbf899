"""Device-side input prefetch: overlap host batch assembly + H2D with
the train step's device execution.

The reference overlaps input and compute with CUDA's async H2D streams +
``pin_memory`` (torch DataLoader semantics).  The TPU-native equivalent
is a small bounded producer thread that assembles the NEXT batches and
issues their ``device_put`` (sharded via ``shard_batch``) while the
current step runs: ``jax.device_put`` releases the GIL for the transfer,
so the H2D leg — expensive through a tunneled PJRT relay, cheap but
nonzero over local PCIe — rides the step's device time instead of
serializing after it.

Depth 2 is the sweet spot: batch i+1 is already on device when step i's
metrics readback blocks the main thread, and batch i+2 is being
assembled.  Deeper queues only add host memory (one decoded multicrop
batch is ~22 MB wire-format).

Ordering and determinism are unchanged — a single producer thread
consumes the loader iterator sequentially and the consumer sees the
exact same sequence; exceptions raised by the loader (dead worker,
unreadable shard — both fail-loud by design, data/loader.py) re-raise
in the consumer at the position they occurred.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterable, Iterator

__all__ = ["DevicePrefetcher"]

_DONE = object()


class DevicePrefetcher:
    """Iterate ``src`` on a daemon thread, ``depth`` items ahead.

    ``src`` should yield batches that are already device-committed (i.e.
    the generator body calls ``shard_batch`` / ``jax.device_put``) so the
    transfer is issued from the producer thread.
    """

    def __init__(self, src: Iterable, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._src = iter(src)
        self._exc: BaseException | None = None
        self._finished = False
        self._stop = False
        self._thread = threading.Thread(
            target=self._produce, name="device-prefetch", daemon=True
        )
        self._thread.start()

    def _produce(self) -> None:
        try:
            for item in self._src:
                # bounded put that watches the stop flag, so close() can
                # always unblock a parked producer
                while not self._stop:
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop:
                    return
        except BaseException as e:  # re-raised in the consumer
            self._exc = e
        finally:
            while not self._stop:
                try:
                    self._q.put(_DONE, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def close(self, timeout: float = 2.0) -> None:
        """Stop the producer and release every queued device-committed
        batch (they pin HBM, not host memory).  For early exits — an
        exception mid-epoch, a bench loop that stops before exhaustion.
        Safe to call repeatedly; iteration afterwards raises
        StopIteration.  The underlying loader iterator is left wherever
        the producer reached — wrap a FRESH iterator per epoch rather
        than reusing one across prefetchers.

        The wait is bounded by ``timeout``: a producer parked on a full
        queue unblocks immediately, but one blocked INSIDE the wrapped
        iterator (a stalled shard read on a hung mount) cannot be
        interrupted — past the deadline the daemon thread is abandoned
        (it exits at its next stop-flag check) so cleanup never converts
        the exception that triggered it into a deadlock."""
        self._stop = True
        self._finished = True
        deadline = time.monotonic() + timeout
        while self._thread.is_alive() and time.monotonic() < deadline:
            try:  # unblock a producer parked on a full queue
                self._q.get(timeout=0.05)
            except queue.Empty:
                pass
            self._thread.join(timeout=0.05)
        while True:    # drop leftovers so the device buffers free now
            try:
                self._q.get_nowait()
            except queue.Empty:
                break

    def __enter__(self) -> "DevicePrefetcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        if self._finished:
            raise StopIteration
        item = self._q.get()
        if item is _DONE:
            self._finished = True
            self._thread.join()
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item
