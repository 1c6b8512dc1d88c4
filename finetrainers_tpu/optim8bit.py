"""8-bit optimizer states (bitsandbytes parity, reference `optimizer.py:92-188`
`adam-bnb-8bit`/`adamw-bnb-8bit` variants).

TPU-native design: instead of bnb's CUDA blockwise-quantization kernels, the Adam
moments are stored as int8 codes with per-row fp32 absmax scales, and
(de)quantization is fused into the update step by XLA — the moments live in HBM
at 1 byte/param (+1/row), cutting optimizer-state memory ~4x vs fp32 Adam.

Quantization scheme (mirrors bnb's behavior at equivalent granularity):
  - first moment m: signed absmax int8 over the last axis (one fp32 scale per
    row; bnb uses 256-element flat blocks — a row of a DiT kernel is 64-4096
    elements, the same granularity class).
  - second moment v: non-negative; sqrt-compressed before absmax quantization
    (codes store sqrt(v)) so the quantization error is relative in sqrt-space,
    matching bnb's dynamic-exponent code precision for small values.
  - small tensors (< MIN_8BIT_SIZE elements) keep fp32 moments, exactly like
    bnb's `min_8bit_size=4096` default.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


import os

# bnb Adam8bit(min_8bit_size=4096) parity; env-overridable for tiny-model tests.
MIN_8BIT_SIZE = int(os.environ.get("FINETRAINERS_8BIT_MIN_SIZE", "4096"))


class _Quantized(NamedTuple):
    """One quantized moment tensor: int8 codes + per-row fp32 scales."""

    codes: chex.Array  # int8, same shape as the param
    scales: chex.Array  # fp32, param.shape[:-1] + (1,)


def _quantize(x: jax.Array) -> _Quantized:
    scales = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    safe = jnp.where(scales > 0, scales, 1.0)
    codes = jnp.clip(jnp.round(x / safe * 127.0), -127, 127).astype(jnp.int8)
    return _Quantized(codes, scales.astype(jnp.float32))


def _dequantize(q: _Quantized) -> jax.Array:
    return q.codes.astype(jnp.float32) * (q.scales / 127.0)


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, _Quantized)


class ScaleByAdam8bitState(NamedTuple):
    count: chex.Array
    mu: Any  # pytree: _Quantized or fp32 array per leaf
    nu: Any  # pytree: _Quantized (codes hold sqrt(nu)) or fp32 array per leaf


def scale_by_adam_8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_8bit_size: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam moment tracking with int8-quantized state storage."""
    if min_8bit_size is None:  # env read at call time so tests can lower it
        min_8bit_size = int(os.environ.get("FINETRAINERS_8BIT_MIN_SIZE", MIN_8BIT_SIZE))

    def _big(p) -> bool:
        return p.size >= min_8bit_size and p.ndim >= 1 and p.shape[-1] >= 2

    def init_fn(params):
        def _init_mu(p):
            z = jnp.zeros(p.shape, jnp.float32)
            return _quantize(z) if _big(p) else z

        mu = jax.tree_util.tree_map(_init_mu, params)
        nu = jax.tree_util.tree_map(_init_mu, params)
        return ScaleByAdam8bitState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        def _moments(g, mu_q, nu_q):
            g = g.astype(jnp.float32)
            mu = _dequantize(mu_q) if _is_quantized_leaf(mu_q) else mu_q
            nu = _dequantize(nu_q) ** 2 if _is_quantized_leaf(nu_q) else nu_q
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * (g * g)
            mu_hat = mu / (1.0 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1.0 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            new_mu = _quantize(mu) if _is_quantized_leaf(mu_q) else mu
            new_nu = _quantize(jnp.sqrt(nu)) if _is_quantized_leaf(nu_q) else nu
            return step, new_mu, new_nu

        out = jax.tree_util.tree_map(
            _moments, updates, state.mu, state.nu, is_leaf=_is_quantized_leaf
        )
        # out is a tree of (step, mu, nu) tuples; transpose to three trees.
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3 and not _is_quantized_leaf(x)
        steps = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_triple)
        mu = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_triple)
        nu = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_triple)
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adam_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def adamw_8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
