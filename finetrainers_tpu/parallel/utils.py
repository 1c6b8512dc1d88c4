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
