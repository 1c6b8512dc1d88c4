"""Grain-style device prefetch.

The train loop's host work per step — decode, collate, `jax.device_put` with a
NamedSharding — runs on a background thread, keeping up to `depth` fully
device-dispatched batches queued ahead of the consumer. Because JAX dispatch is
async, the H2D transfers overlap the previous step's compute; the queue absorbs
host-side hiccups (a slow video decode, a preprocessor refill) that would
otherwise stall the step loop.

Checkpoint-exact resume: naive prefetch desynchronizes the dataloader state —
samples sit in the queue, already consumed from the dataset but not yet
trained on. Each queue item therefore carries a state snapshot taken right
after the batch was produced; `consumed_state` always reflects the last batch
handed to the trainer, and checkpoints save that instead of the live loader
state. (Reference analog: torchdata StatefulDataLoader worker-state snapshots,
used by reference data/dataloader.py:13-40.)
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional


class DevicePrefetcher:
    def __init__(
        self,
        source: Iterator[Any],
        depth: int = 2,
        snapshot_fn: Optional[Callable[[], Any]] = None,
    ) -> None:
        self._source = source
        self._snapshot_fn = snapshot_fn or (lambda: None)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._done = False
        #: loader state as of the last batch returned by __next__.
        self.consumed_state: Any = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self) -> None:
        try:
            for batch in self._source:
                snapshot = self._snapshot_fn()
                while not self._stop.is_set():
                    try:
                        self._queue.put((snapshot, batch), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            while not self._stop.is_set():
                try:
                    self._queue.put(_SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Any:
        if self._done:  # the sentinel was already consumed: stay exhausted
            if self._error is not None:
                raise self._error
            raise StopIteration
        item = self._queue.get()
        if item is _SENTINEL:
            self._done = True
            if self._error is not None:
                raise self._error
            raise StopIteration
        snapshot, batch = item
        self.consumed_state = snapshot
        return batch

    def stop(self) -> None:
        self._stop.set()
        # Unblock a producer waiting on a full queue.
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass


_SENTINEL = object()
