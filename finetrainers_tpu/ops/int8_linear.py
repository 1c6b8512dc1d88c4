"""int8 frozen-weight linear: W stored int8 (per-output-channel scales), both
the forward and the input-gradient matmul run on the MXU's int8 path.

v5e rates int8 MXU throughput at 2x bf16 peak (394 vs 197 T/s); the microbench
(`tools/int8_bench.py`, docs/perf.md round 5) measured 214 vs 139 TFLOP/s
against the fp8-stored path at the CogView4 ff1 shape INCLUDING the dynamic
per-row activation quantization sweep. This module is the training-path
counterpart: a custom-VJP linear

    y  = (x_q @ W_q) * s_x * s_w          (forward)
    dx = ((dy * s_w)_q @ W_q^T) * s_dy    (backward; W is frozen -> no wgrad)

with symmetric per-row dynamic quantization of activations/cotangents and
symmetric per-output-channel weight scales. Rounding is non-differentiable;
the custom VJP routes the cotangent through the quantized weight directly
(the straight-through estimate is exact here because W is frozen — only dx
flows, and dx's own quantization is an inference-style approximation chosen
for speed, opt-in via `--quantized_matmul int8`).

Beyond-reference feature: the torch reference's layerwise-upcasting
(trainer/sft_trainer/trainer.py:96-136) is a storage-only trick (fp8 in VRAM,
bf16 compute); this path changes the COMPUTE to the 2x-rate int8 MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array, eps: float = 1e-8):
    """Symmetric per-row (last-axis) int8 quantization: x ~= x_q * s[..., None].

    f32 math for the absmax/divide (bf16 absmax loses 3 mantissa bits of
    scale resolution for no speed win — the sweep is bandwidth-bound)."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(absmax, eps) / 127.0
    xq = jnp.clip(jnp.round(x32 / s), -127.0, 127.0).astype(jnp.int8)
    return xq, s


def quantize_weight(w: jax.Array, eps: float = 1e-8):
    """Symmetric per-output-channel (axis 0 = in_features contracted) scales:
    w (K, F) ~= w_q * s_w[None, :]. Returns (w_q int8 (K, F), s_w f32 (F,))."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    s = jnp.maximum(absmax, eps) / 127.0
    wq = jnp.clip(jnp.round(w32 / s[None, :]), -127.0, 127.0).astype(jnp.int8)
    return wq, s


@jax.custom_vjp
def int8_linear(x: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """y = dequant((quant(x) @ wq)) in x.dtype. x: (..., K); wq: int8 (K, F);
    sw: f32 (F,) per-output-channel weight scales."""
    return _int8_linear_fwd_math(x, wq, sw)


def _int8_linear_fwd_math(x, wq, sw):
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # Dequant epilogue in the OUTPUT dtype: an f32 epilogue materializes a
    # 2x-size temp per matmul site (283 MB at the CogView4 ff1 shape) which
    # OOMed the 6B single-chip config; bf16 rounding here is ~0.4% — well
    # under the ~1% int8 quantization noise itself.
    out = acc.astype(x.dtype) * sx.astype(x.dtype)
    return out * sw.astype(x.dtype)


def _fwd(x, wq, sw):
    # x itself is NOT a residual: W is frozen (no wgrad), dx needs only wq/sw.
    return _int8_linear_fwd_math(x, wq, sw), (wq, sw)


def _bwd(res, dy):
    wq, sw = res
    x_dtype = dy.dtype  # y was emitted in x.dtype, so the cotangent carries it
    # dx = dy @ (wq * sw)^T = (dy * sw) @ wq^T — fold the per-column weight
    # scale into the cotangent (one VPU sweep), then ride the int8 MXU again.
    dys = dy * sw.astype(dy.dtype)  # keep the cotangent in bf16 (temp size)
    dq, sdy = quantize_rows(dys)
    acc = jax.lax.dot_general(
        dq, wq, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dx = acc.astype(x_dtype) * sdy.astype(x_dtype)
    return dx, None, None


int8_linear.defvjp(_fwd, _bwd)
