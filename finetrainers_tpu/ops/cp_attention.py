"""GSPMD-composable ring attention: `custom_partitioning` + `custom_vjp`.

This makes context-parallel ring attention usable inside the trainer's plain
`jax.jit` train step (no shard_map): when XLA sees the sequence dim of Q/K/V
sharded over a mesh axis, the op partitions to per-shard ring attention
(`ops/ring_attention.py` — Pallas flash per hop + `lax.ppermute` KV rotation);
unsharded inputs degrade to plain flash attention. Forward and backward are each
partitioned, stitched together with an outer `custom_vjp` (custom_partitioning
has no differentiation rule of its own).

Constraints (the CP self-attention case): self-attention shapes (Sq == Skv),
no GQA, no kv_lens mask, default softmax scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning

from .flash_attention import _flash_backward, _flash_forward
from .ring_attention import _ring_blocks, _ring_forward, _ring_mha_bwd


def _seq_axis(arg_shapes):
    spec = arg_shapes[0].sharding.spec
    return spec[1] if len(spec) > 1 else None


def _scale(head_dim: int) -> float:
    return head_dim**-0.5


# ------------------------------------------------------------------- forward

@custom_partitioning
def _fwd(q, k, v):
    """BTNH in; returns (out BTNH, lse (B, N, S))."""
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    block_q, block_kv = _ring_blocks(q.shape[1], k.shape[1])
    out, lse = _flash_forward(
        qt, kt, vt, None,
        None, None, None, _scale(q.shape[-1]), False, block_q, block_kv,
    )
    return jnp.swapaxes(out, 1, 2), lse


def _fwd_partition(mesh, arg_shapes, result_shape):
    q_sharding = arg_shapes[0].sharding
    axis = _seq_axis(arg_shapes)
    lse_sharding = result_shape[1].sharding
    if axis is None:
        def impl(q, k, v):
            return _fwd.__wrapped__(q, k, v)
    else:
        def impl(q, k, v):
            out, lse = _ring_forward(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
                axis, _scale(q.shape[-1]),
            )
            return jnp.swapaxes(out, 1, 2), lse
    return mesh, impl, (q_sharding, lse_sharding), (q_sharding,) * 3


_fwd.def_partition(
    partition=_fwd_partition,
    sharding_rule="b s n h, b s n h, b s n h -> b s n h, b n s",
)


# ------------------------------------------------------------------ backward

@custom_partitioning
def _bwd(q, k, v, out, lse, do):
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    ot, dot = jnp.swapaxes(out, 1, 2), jnp.swapaxes(do, 1, 2)
    block_q, block_kv = _ring_blocks(q.shape[1], k.shape[1])
    dq, dk, dv = _flash_backward(
        qt, kt, vt, None,
        None, None, None, ot, lse, dot, _scale(q.shape[-1]), False, block_q, block_kv,
    )
    return tuple(jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))


def _bwd_partition(mesh, arg_shapes, result_shape):
    q_sharding = arg_shapes[0].sharding
    lse_sharding = arg_shapes[4].sharding
    axis = _seq_axis(arg_shapes)
    if axis is None:
        def impl(q, k, v, out, lse, do):
            return _bwd.__wrapped__(q, k, v, out, lse, do)
    else:
        def impl(q, k, v, out, lse, do):
            qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
            ot, dot = jnp.swapaxes(out, 1, 2), jnp.swapaxes(do, 1, 2)
            dq, dk, dv = _ring_mha_bwd(axis, _scale(q.shape[-1]), (qt, kt, vt, ot, lse), dot)
            return tuple(jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))
    return (
        mesh, impl,
        (q_sharding,) * 3,
        (q_sharding, q_sharding, q_sharding, q_sharding, lse_sharding, q_sharding),
    )


_bwd.def_partition(
    partition=_bwd_partition,
    sharding_rule="b s n h, b s n h, b s n h, b s n h, b n s, b s n h"
                  " -> b s n h, b s n h, b s n h",
)


# ----------------------------------------------------------------- public op

@jax.custom_vjp
def cp_flash_attention(q, k, v):
    """Ring/flash attention that composes with GSPMD: shard the sequence dim of
    q/k/v over a mesh axis and this runs as ring attention per shard; leave them
    unsharded and it is plain flash attention. BTNH layout, self-attention."""
    out, _ = _fwd(q, k, v)
    return out


def _vjp_fwd(q, k, v):
    out, lse = _fwd(q, k, v)
    return out, (q, k, v, out, lse)


def _vjp_bwd(residuals, g):
    q, k, v, out, lse = residuals
    return _bwd(q, k, v, out, lse, g)


cp_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
