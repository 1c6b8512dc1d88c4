"""GSPMD-composable ring attention: `custom_partitioning` + `custom_vjp`.

This makes context-parallel attention usable inside the trainer's plain
`jax.jit` train step (no shard_map): when XLA sees the sequence dim of Q/K/V
sharded over a mesh axis, the op partitions to per-shard ring attention
(`ops/ring_attention.py` — Pallas flash per hop + `lax.ppermute` KV rotation);
unsharded inputs degrade to plain flash attention. Forward and backward are each
partitioned, stitched together with an outer `custom_vjp` (custom_partitioning
has no differentiation rule of its own).

Two ops are exposed (mirroring the reference's ring dispatch surface,
`/root/reference/finetrainers/models/attention_dispatch.py:543-591`, which
normalizes masks across ring hops):

* `cp_flash_attention` — self-attention (Sq == Skv). Supports custom softmax
  scale and `kv_lens` padded-key masks (the global lengths are clipped into
  each ring hop's window). GQA is handled by the caller repeating KV heads
  (see ops/attention.py `_ring`), so the partitioned op stays MHA.
* `cp_cross_flash_attention` — cross-attention: Q sequence-sharded over the cp
  axis, K/V replicated. Each shard runs plain flash against the full KV
  (no ring needed — query rows are independent); the backward psums the
  partial dK/dV across the axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning

from .flash_attention import _flash_backward, _flash_forward
from .ring_attention import _ring_blocks, _ring_forward, _ring_mha_bwd


def _seq_axis(arg_shapes):
    spec = arg_shapes[0].sharding.spec
    return spec[1] if len(spec) > 1 else None


def _kv_seq_replicated(mesh, q_sharding):
    """q's sharding with the sequence dim (dim 1 of BTNH) forced replicated —
    the KV layout for the sharded-Q cross-attention path (heads may stay
    tp-sharded; they must line up with the q shards inside the kernel)."""
    from jax.sharding import NamedSharding, PartitionSpec

    spec = list(q_sharding.spec) + [None] * (4 - len(q_sharding.spec))
    spec[1] = None
    return NamedSharding(mesh, PartitionSpec(*spec))


def _local_flash_fwd(q, k, v, kv_lens, scale):
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    block_q, block_kv = _ring_blocks(q.shape[1], k.shape[1])
    out, lse = _flash_forward(
        qt, kt, vt, kv_lens,
        None, None, None, scale, False, block_q, block_kv,
    )
    return jnp.swapaxes(out, 1, 2), lse


def _local_flash_bwd(q, k, v, kv_lens, out, lse, do, scale):
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    ot, dot = jnp.swapaxes(out, 1, 2), jnp.swapaxes(do, 1, 2)
    block_q, block_kv = _ring_blocks(q.shape[1], k.shape[1])
    dq, dk, dv = _flash_backward(
        qt, kt, vt, kv_lens, None, None, None, ot, lse, dot, scale, False,
        block_q, block_kv,
    )
    return tuple(jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))


# ----------------------------------------------------- self-attention (ring)


@functools.lru_cache(maxsize=32)
def _build_self_ops(scale: float, has_lens: bool):
    """Per-(scale, kv_lens-arity) partitioned fwd/bwd ops. BTNH layout."""

    def _split(args):
        if has_lens:
            q, k, v, kv_lens = args
            return q, k, v, kv_lens
        q, k, v = args
        return q, k, v, None

    @custom_partitioning
    def _fwd(*args):
        q, k, v, kv_lens = _split(args)
        return _local_flash_fwd(q, k, v, kv_lens, scale)

    def _fwd_partition(mesh, arg_shapes, result_shape):
        q_sharding = arg_shapes[0].sharding
        axis = _seq_axis(arg_shapes)
        lse_sharding = result_shape[1].sharding

        if axis is None:
            def impl(*args):
                q, k, v, kv_lens = _split(args)
                return _local_flash_fwd(q, k, v, kv_lens, scale)
        else:
            def impl(*args):
                q, k, v, kv_lens = _split(args)
                out, lse = _ring_forward(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
                    axis, scale, kv_lens,
                )
                return jnp.swapaxes(out, 1, 2), lse
        lens_sharding = (arg_shapes[3].sharding,) if has_lens else ()
        return mesh, impl, (q_sharding, lse_sharding), (q_sharding,) * 3 + lens_sharding

    rule = "b s n h, b s n h, b s n h{} -> b s n h, b n s".format(", b" if has_lens else "")
    _fwd.def_partition(partition=_fwd_partition, sharding_rule=rule)

    @custom_partitioning
    def _bwd(*args):
        q, k, v, kv_lens = _split(args[:4] if has_lens else args[:3])
        out, lse, do = args[-3:]
        return _local_flash_bwd(q, k, v, kv_lens, out, lse, do, scale)

    def _bwd_partition(mesh, arg_shapes, result_shape):
        q_sharding = arg_shapes[0].sharding
        lse_sharding = arg_shapes[-2].sharding
        axis = _seq_axis(arg_shapes)
        if axis is None:
            def impl(*args):
                q, k, v, kv_lens = _split(args[:4] if has_lens else args[:3])
                out, lse, do = args[-3:]
                return _local_flash_bwd(q, k, v, kv_lens, out, lse, do, scale)
        else:
            def impl(*args):
                q, k, v, kv_lens = _split(args[:4] if has_lens else args[:3])
                out, lse, do = args[-3:]
                qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
                ot, dot = jnp.swapaxes(out, 1, 2), jnp.swapaxes(do, 1, 2)
                dq, dk, dv, _ = _ring_mha_bwd(axis, scale, (qt, kt, vt, kv_lens, ot, lse), dot)
                return tuple(jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))
        lens_sharding = (arg_shapes[3].sharding,) if has_lens else ()
        return (
            mesh, impl,
            (q_sharding,) * 3,
            (q_sharding,) * 3 + lens_sharding + (q_sharding, lse_sharding, q_sharding),
        )

    lens_dim = ", b" if has_lens else ""
    rule_b = (f"b s n h, b s n h, b s n h{lens_dim}, b s n h, b n s, b s n h"
              " -> b s n h, b s n h, b s n h")
    _bwd.def_partition(partition=_bwd_partition, sharding_rule=rule_b)

    return _fwd, _bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cp_self(q, k, v, kv_lens, scale: float):
    fwd, _ = _build_self_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ())
    out, _ = fwd(*args)
    return out


def _cp_self_fwd(q, k, v, kv_lens, scale: float):
    fwd, _ = _build_self_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ())
    out, lse = fwd(*args)
    return out, (q, k, v, kv_lens, out, lse)


def _cp_self_bwd(scale: float, residuals, g):
    q, k, v, kv_lens, out, lse = residuals
    _, bwd = _build_self_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ()) + (out, lse, g)
    dq, dk, dv = bwd(*args)
    return dq, dk, dv, None


_cp_self.defvjp(_cp_self_fwd, _cp_self_bwd)


def cp_flash_attention(q, k, v, kv_lens=None, scale=None):
    """Ring/flash self-attention that composes with GSPMD: shard the sequence
    dim of q/k/v over a mesh axis and this runs as ring attention per shard;
    leave them unsharded and it is plain flash attention. BTNH layout,
    Sq == Skv, MHA (repeat GQA heads before calling). `kv_lens` are GLOBAL
    valid-key lengths; `scale` defaults to head_dim**-0.5."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _cp_self(q, k, v, kv_lens, float(scale))


# ------------------------------------------------- cross-attention (sharded Q)


@functools.lru_cache(maxsize=32)
def _build_cross_ops(scale: float, has_lens: bool):
    """Q seq-sharded over the cp axis, KV replicated; rows are independent so
    each shard runs plain flash against the full KV. BTNH layout."""

    def _split(args):
        if has_lens:
            q, k, v, kv_lens = args[:4]
            return q, k, v, kv_lens
        q, k, v = args[:3]
        return q, k, v, None

    @custom_partitioning
    def _fwd(*args):
        q, k, v, kv_lens = _split(args)
        return _local_flash_fwd(q, k, v, kv_lens, scale)

    def _fwd_partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec

        q_sharding = arg_shapes[0].sharding
        lse_sharding = result_shape[1].sharding
        # KV keeps q's batch/head/dim layout (tp head shards must line up with
        # the q shards inside the kernel) but replicates the SEQ dim: the full
        # key set is present on every cp shard.
        kv_sharding = _kv_seq_replicated(mesh, q_sharding)
        rep = NamedSharding(mesh, PartitionSpec())

        def impl(*args):
            q, k, v, kv_lens = _split(args)
            return _local_flash_fwd(q, k, v, kv_lens, scale)

        lens_sharding = (rep,) if has_lens else ()
        return mesh, impl, (q_sharding, lse_sharding), (q_sharding, kv_sharding, kv_sharding) + lens_sharding

    rule = "b s n h, b t n h, b t n h{} -> b s n h, b n s".format(", b" if has_lens else "")
    _fwd.def_partition(partition=_fwd_partition, sharding_rule=rule)

    @custom_partitioning
    def _bwd(*args):
        q, k, v, kv_lens = _split(args)
        out, lse, do = args[-3:]
        return _local_flash_bwd(q, k, v, kv_lens, out, lse, do, scale)

    def _bwd_partition(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding, PartitionSpec

        q_sharding = arg_shapes[0].sharding
        lse_sharding = arg_shapes[-2].sharding
        kv_sharding = _kv_seq_replicated(mesh, q_sharding)
        rep = NamedSharding(mesh, PartitionSpec())
        axis = _seq_axis(arg_shapes)

        def impl(*args):
            q, k, v, kv_lens = _split(args)
            out, lse, do = args[-3:]
            dq, dk, dv = _local_flash_bwd(q, k, v, kv_lens, out, lse, do, scale)
            if axis is not None:
                # Each Q shard contributes a partial dK/dV over the full KV.
                dk = jax.lax.psum(dk, axis)
                dv = jax.lax.psum(dv, axis)
            return dq, dk, dv

        lens_sharding = (rep,) if has_lens else ()
        return (
            mesh, impl,
            (q_sharding, kv_sharding, kv_sharding),
            (q_sharding, kv_sharding, kv_sharding) + lens_sharding
            + (q_sharding, lse_sharding, q_sharding),
        )

    lens_dim = ", b" if has_lens else ""
    rule_b = (f"b s n h, b t n h, b t n h{lens_dim}, b s n h, b n s, b s n h"
              " -> b s n h, b t n h, b t n h")
    _bwd.def_partition(partition=_bwd_partition, sharding_rule=rule_b)

    return _fwd, _bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cp_cross(q, k, v, kv_lens, scale: float):
    fwd, _ = _build_cross_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ())
    out, _ = fwd(*args)
    return out


def _cp_cross_fwd(q, k, v, kv_lens, scale: float):
    fwd, _ = _build_cross_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ())
    out, lse = fwd(*args)
    return out, (q, k, v, kv_lens, out, lse)


def _cp_cross_bwd(scale: float, residuals, g):
    q, k, v, kv_lens, out, lse = residuals
    _, bwd = _build_cross_ops(scale, kv_lens is not None)
    args = (q, k, v) + ((kv_lens,) if kv_lens is not None else ()) + (out, lse, g)
    dq, dk, dv = bwd(*args)
    return dq, dk, dv, None


_cp_cross.defvjp(_cp_cross_fwd, _cp_cross_bwd)


def cp_cross_flash_attention(q, k, v, kv_lens=None, scale=None):
    """Cross-attention under CP: Q rows are sharded over the cp axis, the
    (text) KV stays replicated — each shard runs plain flash against the full
    KV, the backward psums partial dK/dV. `kv_lens` masks padded caption keys.
    BTNH layout, MHA (repeat GQA heads before calling)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _cp_cross(q, k, v, kv_lens, float(scale))
