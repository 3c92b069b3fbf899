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
        self._thread = threading.Thread(
            target=self._produce, name="device-prefetch", daemon=True
        )
        self._thread.start()

    def _produce(self) -> None:
        try:
            for item in self._src:
                self._q.put(item)
        except BaseException as e:  # re-raised in the consumer
            self._exc = e
        finally:
            self._q.put(_DONE)

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
