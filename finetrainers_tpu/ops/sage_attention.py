"""INT8-quantized attention (SageAttention parity) as a Pallas TPU kernel.

The reference exposes sageattention's int8 QK^T kernels as inference-oriented
providers (`/root/reference/finetrainers/models/attention_dispatch.py:1543-1765`,
sage / sage_varlen / _sage_qk_int8_* variants). TPU-native design:

  - Q and K are quantized to int8 **per token** (per-row absmax scales) — finer
    than sage's per-block scales, and free on TPU because dequantization is an
    outer-product rescale of the (bq, bkv) score tile.
  - K is smoothed first (k_mean subtracted, sage's "smooth_k"): softmax is
    invariant to a per-row constant shift, so no correction term is needed, and
    int8 K loses far less precision once the channel means are gone.
  - QK^T runs on the MXU as int8 x int8 -> int32 (2x the bf16 MACs/cycle on
    v5e+), the online softmax runs in fp32, and P@V stays in the input dtype.
  - Forward-only, like the reference (sage providers are excluded from the
    training allow-list); backward raises.

Interface matches `flash_attention` (BTNH)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _cdiv, _interpret, _pad_to


_NEG_INF = -1e30


def _sage_fwd_kernel(
    kv_lens_ref,  # scalar prefetch (B,)
    q_ref,  # (1, 1, bq, H) int8
    k_ref,  # (1, 1, bkv, H) int8
    v_ref,  # (1, 1, bkv, H)
    qs_ref,  # (1, 1, bq, 8) f32 per-token q scales
    ks_ref,  # (1, 1, 8, bkv) f32 per-token k scales
    o_ref,  # (1, 1, bq, H)
    m_scr,  # (bq, 128) f32
    l_scr,  # (bq, 128) f32
    acc_scr,  # (bq, H) f32
    *,
    scale: float,
    block_q: int,
    block_kv: int,
):
    b = pl.program_id(0)
    kj = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv_len = kv_lens_ref[b]

    q = q_ref[0, 0]  # int8 (bq, H)
    k = k_ref[0, 0]  # int8 (bkv, H)
    s32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (bq, bkv) int32 on the MXU
    qs = qs_ref[0, 0, :, :1].astype(jnp.float32)  # (bq, 1)
    ks = ks_ref[0, 0, :1, :].astype(jnp.float32)  # (1, bkv)
    s = s32.astype(jnp.float32) * (qs * ks) * scale

    col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
    mask = col < kv_len
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kj == num_kv - 1)
    def _emit():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)


def _quantize_per_token(x: jax.Array):
    """(B, N, S, H) -> int8 codes + (B, N, S) f32 scales (absmax per token)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    codes = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scales[..., None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("causal", "scale_static", "block_q", "block_kv"))
def _sage_impl(query, key, value, kv_lens, causal, scale_static, block_q, block_kv):
    del causal
    batch, num_heads, q_len, head_dim = query.shape
    kv_len = key.shape[2]

    # smooth_k: softmax is row-shift invariant, so remove per-channel K means
    # (masked to the valid prefix) before quantization.
    col = jnp.arange(kv_len)[None, None, :, None]
    valid = col < kv_lens[:, None, None, None]
    denom = jnp.maximum(kv_lens.astype(jnp.float32), 1.0)[:, None, None, None]
    k_mean = jnp.sum(jnp.where(valid, key.astype(jnp.float32), 0.0), axis=2, keepdims=True) / denom
    key = (key.astype(jnp.float32) - k_mean).astype(jnp.float32)

    q_i8, q_scales = _quantize_per_token(query)
    k_i8, k_scales = _quantize_per_token(key)

    block_q = min(block_q, max(q_len, 8))
    block_kv = min(block_kv, max(kv_len, 8))
    q_pad = _cdiv(q_len, block_q) * block_q
    kv_pad = _cdiv(kv_len, block_kv) * block_kv
    q_i8 = _pad_to(q_i8, q_pad, 2)
    k_i8 = _pad_to(k_i8, kv_pad, 2)
    v = _pad_to(value, kv_pad, 2)
    qs = jnp.broadcast_to(_pad_to(q_scales, q_pad, 2)[..., None], (batch, num_heads, q_pad, 8))
    ks = jnp.broadcast_to(
        _pad_to(k_scales, kv_pad, 2)[..., None, :], (batch, num_heads, 8, kv_pad)
    )

    grid = (batch, num_heads, q_pad // block_q, kv_pad // block_kv)
    out = pl.pallas_call(
        functools.partial(_sage_fwd_kernel, scale=scale_static, block_q=block_q, block_kv=block_kv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, i, j, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, i, j, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_q, 8), lambda b, n, i, j, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, 8, block_kv), lambda b, n, i, j, *_: (b, n, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((batch, num_heads, q_pad, head_dim), value.dtype)],
        interpret=_interpret(),
    )(kv_lens, q_i8, k_i8, v, qs, ks)[0]
    return out[:, :, :q_len]


def sage_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    kv_lens: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
) -> jax.Array:
    """INT8 QK^T attention on BTNH tensors (inference-oriented, forward-only)."""
    batch, q_len, num_heads, head_dim = query.shape
    kv_len = key.shape[1]
    num_kv_heads = key.shape[2]
    if scale is None:
        scale = head_dim ** -0.5
    if kv_lens is None:
        kv_lens = jnp.full((batch,), kv_len, jnp.int32)
    else:
        kv_lens = kv_lens.astype(jnp.int32)
    q = jnp.swapaxes(query, 1, 2)
    k = jnp.swapaxes(key, 1, 2)
    v = jnp.swapaxes(value, 1, 2)
    if num_kv_heads != num_heads:
        rep = num_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    out = _sage_impl(q, k, v, kv_lens, False, float(scale), int(block_q), int(block_kv))
    return jnp.swapaxes(out, 1, 2)
