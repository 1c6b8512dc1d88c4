"""Stateful dataloader. Parity with reference `data/dataloader.py:13-40` (DPDataLoader):
per-data-parallel-rank sharded iteration with checkpointable position.

No torch/torchdata: a plain iterator with round-robin rank sharding (the JAX analog
of `split_dataset_by_node`, reference parallel/ptd.py:136-143) and optional
background thread prefetch (host decode overlaps device compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional


class DPDataLoader:
    def __init__(
        self,
        rank: int,
        dataset,
        batch_size: int = 1,
        num_workers: int = 0,
        collate_fn=None,
        num_replicas: int = 1,
    ) -> None:
        self._rank = rank
        self._num_replicas = max(num_replicas, 1)
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.collate_fn = collate_fn or (lambda items: items)
        self._resume_skip = 0
        self._batches_yielded = 0
        # Global position in the underlying sample stream. Round-robin rank
        # assignment is by GLOBAL index: on resume the underlying dataset
        # continues mid-stream, so the counter must continue with it — a fresh
        # enumerate() would shift the parity and hand ranks each other's
        # samples (re-training some, dropping others).
        self._stream_index = 0

    def _sample_iter(self) -> Iterator[Any]:
        for sample in self.dataset:
            i = self._stream_index
            self._stream_index += 1
            if i % self._num_replicas == self._rank:
                yield sample

    def _batch_iter(self) -> Iterator[Any]:
        batch = []
        for sample in self._sample_iter():
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []

    def __iter__(self) -> Iterator[Any]:
        it = self._batch_iter()
        # Resume: the underlying dataset restores its own _sample_index; the
        # skip count covers non-stateful datasets.
        for _ in range(self._resume_skip):
            next(it, None)
        self._resume_skip = 0

        if self.num_workers <= 0:
            for batch in it:
                self._batches_yielded += 1
                yield batch
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        _SENTINEL = object()

        def producer():
            try:
                for batch in it:
                    q.put(batch)
            finally:
                q.put(_SENTINEL)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            batch = q.get()
            if batch is _SENTINEL:
                break
            self._batches_yielded += 1
            yield batch

    def state_dict(self) -> Dict[str, Any]:
        state: Dict[str, Any] = {
            f"dp_rank_{self._rank}": {
                "batches_yielded": self._batches_yielded,
                "stream_index": self._stream_index,
            }
        }
        if hasattr(self.dataset, "state_dict"):
            state[f"dp_rank_{self._rank}"]["dataset"] = self.dataset.state_dict()
        return state

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        my_state = state.get(f"dp_rank_{self._rank}", {})
        if "dataset" in my_state and hasattr(self.dataset, "load_state_dict"):
            self.dataset.load_state_dict(my_state["dataset"])
            # The dataset resumes mid-stream: the round-robin counter must
            # resume with it (see _sample_iter).
            self._stream_index = my_state.get("stream_index", 0)
        else:
            # No dataset state: the stream replays from its start, so the
            # counter restarts too and the skip covers already-seen batches.
            self._resume_skip = my_state.get("batches_yielded", 0)
            self._stream_index = 0
        self._batches_yielded = my_state.get("batches_yielded", 0)
