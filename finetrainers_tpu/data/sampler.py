"""Resolution-bucket batch sampler. Parity with reference `data/sampler.py:6-58`.

Consumes (condition, latent) dict pairs, buckets by the shape of the leader tensor
(per-model `_resolution_dim_keys`), and emits a batch when a bucket fills. Because
every emitted batch is shape-homogeneous, each bucket maps to exactly one XLA
compilation of the train step (SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple


class ResolutionSampler:
    def __init__(self, batch_size: int, dim_keys: Dict[str, Tuple[int, ...]]) -> None:
        self.batch_size = batch_size
        self.dim_keys = dim_keys
        self._buckets: Dict[Tuple, List[Tuple[Dict, Dict]]] = {}

    def consume(self, conditions: Dict[str, Any], latents: Dict[str, Any]) -> None:
        leader_key = next(iter(self.dim_keys))
        tensor = latents[leader_key]
        dims = self.dim_keys[leader_key]
        bucket = tuple(tensor.shape[d] for d in dims)
        self._buckets.setdefault(bucket, []).append((conditions, latents))

    @property
    def ready(self) -> bool:
        return any(len(v) >= self.batch_size for v in self._buckets.values())

    def get_batch(self) -> Tuple[List[Dict], List[Dict]]:
        for bucket, items in self._buckets.items():
            if len(items) >= self.batch_size:
                batch = items[: self.batch_size]
                self._buckets[bucket] = items[self.batch_size :]
                conditions = [c for c, _ in batch]
                latents = [l for _, l in batch]
                return conditions, latents
        raise RuntimeError("No bucket is full; check `ready` first")
