"""GPipe-style pipeline parallelism as a differentiable SPMD primitive.

The reference raises ``NotImplementedError`` for ``pp_degree > 1``
(reference ``trainer/sft_trainer/trainer.py:91-94``); ``ParallelDims`` here
mirrors that for the trainer CLI. This module goes beyond that parity point
and provides the TPU-native building block: a weight-stationary pipelined
scan over a stacked transformer-block parameter tree, expressed with
``shard_map`` + ``ppermute`` over a named mesh axis so XLA sees one SPMD
program per stage and the backward pass pipelines automatically through
autodiff of ``scan``/``ppermute`` (the reverse schedule is the transpose of
the forward one).

Schedule: the classic GPipe fill-drain loop. With P stages and M
microbatches the loop runs ``T = M + P - 1`` ticks; at tick ``t`` stage ``s``
processes microbatch ``m = t - s`` (masked off when ``m`` is out of range —
every stage executes every tick, which is the standard SPMD formulation: the
bubble is idle *useful* work, not divergent control flow). Activations hop to
the next stage over ICI via ``ppermute`` after each tick. Weights never move.

This is a building block, not yet a trainer mode: the flagship models run
scan-over-layers (``models/layers.block_stack``) whose stacked parameter
layout is exactly what ``pipeline_blocks`` consumes, so wiring a ``pp`` mesh
axis into ``MeshEnv`` later is a layout no-op. Equivalence (forward AND
gradients) against the sequential scan is tested in
``tests/parallel/test_pipeline.py``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8 top-level export (check_vma); fall back for older versions
    from jax import shard_map  # type: ignore[attr-defined]

    _SHARD_MAP_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore[no-redef]

    _SHARD_MAP_KW = {"check_rep": False}

__all__ = ["pipeline_blocks"]


def _leading_dim(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        raise ValueError("stacked_params has no array leaves")
    dims = {leaf.shape[0] for leaf in leaves}
    if len(dims) != 1:
        raise ValueError(f"stacked_params leaves disagree on the layer axis: {sorted(dims)}")
    return dims.pop()


def pipeline_blocks(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pp",
    n_microbatches: int,
) -> jax.Array:
    """Apply ``L`` stacked blocks to ``x`` with the layer stack pipelined over
    the ``axis`` mesh dimension.

    Args:
      block_fn: ``(params_for_one_layer, h) -> h`` with output shaped like the
        input (a residual transformer block). Closures may capture anything
        static; only activations flow between stages.
      stacked_params: pytree whose every leaf has a leading layer axis ``L``
        (the layout produced by ``models/layers.block_stack`` /
        ``flax`` vmapped inits). Requires ``L % P == 0``; each stage holds the
        contiguous slab of ``L // P`` layers — the leading axis is simply
        sharded over ``axis``, so no reshuffling of checkpoints is needed.
      x: global batch ``(B, ...)``; requires ``B % n_microbatches == 0``.
      mesh: mesh containing ``axis``. Other mesh axes are untouched (the
        primitive composes with dp/tp shardings on the non-layer dims).
      n_microbatches: GPipe microbatch count M. Bubble fraction is
        ``(P - 1) / (M + P - 1)``; pick ``M >= 4 * P`` for <20% bubble.

    Returns:
      ``(B, ...)`` output, replicated over ``axis`` (matching the sequential
      ``lax.scan`` over all ``L`` layers bit-for-bit up to reduction order).
    """
    n_stages = mesh.shape[axis]
    n_layers = _leading_dim(stacked_params)
    if n_layers % n_stages != 0:
        raise ValueError(f"L={n_layers} layers not divisible by {n_stages} pipeline stages")
    batch = x.shape[0]
    if batch % n_microbatches != 0:
        raise ValueError(f"batch {batch} not divisible by n_microbatches={n_microbatches}")
    mb = batch // n_microbatches
    x_stack = x.reshape(n_microbatches, mb, *x.shape[1:])

    def stage_program(local_params: Any, xs: jax.Array) -> jax.Array:
        stage = jax.lax.axis_index(axis)
        n_ticks = n_microbatches + n_stages - 1

        def run_local(h: jax.Array) -> jax.Array:
            def body(carry, layer_params):
                return block_fn(layer_params, carry), None

            out, _ = jax.lax.scan(body, h, local_params)
            return out

        def tick(carry, t):
            acts, outbuf = carry
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_microbatches - 1), 0, keepdims=False
            )
            h = jnp.where(stage == 0, inject.astype(acts.dtype), acts)
            y = run_local(h)
            m = t - stage
            emit = (stage == n_stages - 1) & (m >= 0) & (m < n_microbatches)
            slot = jnp.clip(m, 0, n_microbatches - 1)
            current = jax.lax.dynamic_index_in_dim(outbuf, slot, 0, keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(emit, y, current), slot, 0
            )
            y_next = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return (y_next, outbuf), None

        acts0 = jnp.zeros(xs.shape[1:], xs.dtype)
        out0 = jnp.zeros_like(xs)
        (_, outbuf), _ = jax.lax.scan(tick, (acts0, out0), jnp.arange(n_ticks))
        # Only the last stage holds real outputs; replicate over the pipeline
        # axis (one (M, mb, ...) all-reduce at the very end, not per tick).
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outbuf, jnp.zeros_like(outbuf)), axis
        )

    pp = P(axis)
    fn = shard_map(
        stage_program,
        mesh=mesh,
        in_specs=(pp, P()),
        out_specs=P(),
        **_SHARD_MAP_KW,
    )
    out = fn(stacked_params, x_stack)
    return out.reshape(batch, *x.shape[1:])


def bubble_fraction(n_stages: int, n_microbatches: int) -> float:
    """Idle fraction of the GPipe schedule: (P-1)/(M+P-1)."""
    return (n_stages - 1) / (n_microbatches + n_stages - 1)
