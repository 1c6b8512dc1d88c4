"""Scalar cross-device reductions.

Parity with reference `finetrainers/parallel/utils.py:6-19` (dist_reduce/dist_mean/
dist_max). Under single-controller JAX + GSPMD, values produced by a jitted global
computation are already globally reduced, so these are mostly identities; they exist
so trainer code keeps the same shape as the reference and still works if handed
per-shard values inside `shard_map`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dist_reduce(x, op: str = "mean", axis_names=None):
    """Generic scalar reduction (reference parallel/utils.py:6-13)."""
    if op == "mean":
        return dist_mean(x, axis_names)
    if op == "max":
        return dist_max(x, axis_names)
    if op == "sum":
        return jax.lax.psum(x, axis_names) if axis_names else jnp.sum(jnp.asarray(x))
    raise ValueError(f"Unsupported reduce op {op!r}")


def dist_mean(x, axis_names=None):
    if axis_names:
        return jax.lax.pmean(x, axis_names)
    return jnp.mean(jnp.asarray(x))


def dist_max(x, axis_names=None):
    if axis_names:
        return jax.lax.pmax(x, axis_names)
    return jnp.max(jnp.asarray(x))


def all_gather_object(obj):
    """Gather an arbitrary picklable/JSON-able object from every PROCESS; returns
    the list ordered by process index (reference `all_gather_object` use at
    trainer/sft_trainer/trainer.py:695-697 for validation artifact manifests).

    Single-controller analog: serialize to JSON bytes, allgather lengths, pad to
    the global max, allgather the byte arrays, decode per process.
    """
    import json

    import numpy as np

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(obj).encode("utf-8"), dtype=np.uint8)
    lengths = multihost_utils.process_allgather(np.array([payload.size], np.int64))
    lengths = np.asarray(lengths).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[: payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [
        json.loads(gathered[i, : int(lengths[i])].tobytes().decode("utf-8"))
        for i in range(jax.process_count())
    ]
