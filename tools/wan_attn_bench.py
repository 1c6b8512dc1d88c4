"""Micro-benchmark: Wan2.1-1.3B attention paths on the real chip (round 5).

The Wan step profile (docs/perf.md round-5 breakdown) shows the self-attention
FORWARD kernel is the laggard (91 TFLOP/s vs ~159 for both backward kernels)
and cross-attention (19968 q x 512 text kv) costs ~227 ms/step through XLA's
f32 score-materializing fusions. This bench times the candidate fixes at the
exact Wan shapes: S=19968, N=12, H=128, 3D-RoPE self-attention and no-rope
cross-attention, fwd-only and fwd+bwd.

Variants:
  self_base         straight kernel, rope-cache cap at the old 1 MB (disabled)
  self_ropecache    straight kernel + cached rotated tiles (cap 6 MB default)
  self_twolevel     block-local-max softmax (FINETRAINERS_FLASH_TWOLEVEL=1)
  self_both         rope cache + two-level
  self_twopass      recurrence-free max-then-accumulate fwd (TWOPASS=1)
  cross_xla         XLA fused cross-attention (the pre-round-5 auto fallback)
  cross_own         Pallas kernel, rectangular blocks (768 q x 512 kv)
  i2v_cross_xla/own I2V image-KV cross (19968 q x 257 kv) — XLA wins here,
                    validating the auto provider's >=384 kv cutoff from below
  check             numerics: kernel paths vs math reference on-chip

Usage: python tools/wan_attn_bench.py [variant[:fwd] ...]  (:fwd = fwd-only)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, N, H = 1, 19968, 12, 128
S_KV = 512
REPS = 10


def make_self_inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, S, N, H), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, N, H), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, N, H), jnp.bfloat16)
    cos = jax.random.normal(ks[3], (S, N * H), jnp.float32) * 0.1
    sin = jax.random.normal(ks[4], (S, N * H), jnp.float32) * 0.1
    return q, k, v, cos, sin


def make_cross_inputs():
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (B, S, N, H), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S_KV, N, H), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S_KV, N, H), jnp.bfloat16)
    kv_lens = jnp.asarray([497], jnp.int32)  # realistic ragged caption length
    return q, k, v, kv_lens


def _env(cache_mb=None, twolevel=None, twopass=None):
    os.environ["FINETRAINERS_ROPE_CACHE_MB"] = str(cache_mb if cache_mb is not None else 6)
    os.environ["FINETRAINERS_FLASH_TWOLEVEL"] = "1" if twolevel else "0"
    os.environ["FINETRAINERS_FLASH_TWOPASS"] = "1" if twopass else "0"
    os.environ["FINETRAINERS_FLASH_SKEW"] = "0"


def self_attn(q, k, v, cos, sin):
    from finetrainers_tpu.ops.flash_attention import flash_attention

    blk = int(os.environ.get("WAN_BLOCK", "768"))
    return flash_attention(q, k, v, block_q=blk, block_kv=blk,
                           rope_cos=cos, rope_sin=sin)


def cross_own(q, k, v, kv_lens):
    from finetrainers_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, kv_lens=kv_lens, block_q=768, block_kv=512)


def cross_xla(q, k, v, kv_lens):
    from finetrainers_tpu.ops.attention import _xla_attention

    return _xla_attention(q, k, v, None, 0.0, False, None, kv_lens)


VARIANTS = {}


def variant(name):
    def deco(fn):
        VARIANTS[name] = fn
        return fn
    return deco


@variant("self_base")
def _v0():
    _env(cache_mb=1)
    return make_self_inputs(), self_attn


@variant("self_ropecache")
def _v1():
    _env(cache_mb=6)
    return make_self_inputs(), self_attn


@variant("self_twolevel")
def _v2():
    _env(cache_mb=1, twolevel=True)
    return make_self_inputs(), self_attn


@variant("self_both")
def _v3():
    _env(cache_mb=6, twolevel=True)
    return make_self_inputs(), self_attn


@variant("self_twopass")  # recurrence-free max-then-accumulate fwd + rope cache
def _v3b():
    _env(cache_mb=6, twopass=True)
    return make_self_inputs(), self_attn


@variant("self_twopass_nocache")
def _v3c():
    _env(cache_mb=1, twopass=True)
    return make_self_inputs(), self_attn


@variant("cross_xla")
def _v4():
    _env()
    return make_cross_inputs(), cross_xla


@variant("cross_own")
def _v5():
    _env()
    return make_cross_inputs(), cross_own


def run(name, make, fwd_only=False):
    inputs, fn = make()

    def loss(q, rest):
        out = fn(q, *rest)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if fwd_only:
        def step(q, rest):
            out = fn(q, *rest)
            return (out * 1e-6 + q).astype(q.dtype), jnp.sum(out.astype(jnp.float32) ** 2)
    else:
        def step(q, rest):
            l, dq = jax.value_and_grad(loss)(q, rest)
            return dq.astype(q.dtype) * 1e-6 + q, l

    g = jax.jit(step, donate_argnums=(0,))
    q, *rest = inputs
    rest = tuple(rest)
    t0 = time.perf_counter()
    q, l = g(q, rest)
    _ = np.asarray(l)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        q, l = g(q, rest)
    _ = np.asarray(l)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    kind = "fwd-only" if fwd_only else "fwd+bwd "
    # fwd matmul TFLOPs for the self shape (qk + pv), x2.5 more for fwd+bwd
    print(f"{name:18s} {ms:8.2f} ms {kind}  (compile {compile_s:.1f}s)", flush=True)


def check():
    """On-chip numerics: kernel vs math at both Wan shapes (the auto-provider
    cross routing is TPU-only, so CPU-mesh tests never cover it)."""
    from finetrainers_tpu.ops.attention import attention_dispatch

    _env()
    q, k, v, kv_lens = make_cross_inputs()
    a = attention_dispatch(q, k, v, kv_lens=kv_lens)  # auto -> kernel on TPU
    b = attention_dispatch(q, k, v, kv_lens=kv_lens, provider="_native_math")
    err = float(jnp.abs(a - b).max())
    print(f"cross auto-vs-math max err: {err:.2e}  ({'OK' if err < 2e-2 else 'FAIL'})")

    qs, ks_, vs, cos, sin = make_self_inputs()
    qs, ks_, vs = qs[:, :2304], ks_[:, :2304], vs[:, :2304]
    cos, sin = cos[:2304], sin[:2304]
    for tl in ("0", "1"):
        os.environ["FINETRAINERS_FLASH_TWOLEVEL"] = tl
        a = attention_dispatch(qs, ks_, vs, rope_freqs=(cos, sin))
        b = attention_dispatch(qs, ks_, vs, rope_freqs=(cos, sin), provider="_native_math")
        err = float(jnp.abs(a - b).max())
        print(f"self(rope,cache) twolevel={tl} auto-vs-math max err: {err:.2e}  "
              f"({'OK' if err < 2e-2 else 'FAIL'})")


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        if name == "check":
            check()
            continue
        if name.endswith(":fwd"):
            base, fwd = name[:-4], True
        else:
            base, fwd = name, False
        if base not in VARIANTS:
            print(f"skip unknown {name}")
            continue
        try:
            run(name, VARIANTS[base], fwd_only=fwd)
        except Exception as e:
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def make_i2v_cross_inputs():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, S, N, H), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, 257, N, H), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, 257, N, H), jnp.bfloat16)
    return q, k, v, None


def i2v_own(q, k, v, kv_lens):
    from finetrainers_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, block_q=768, block_kv=128)


def i2v_xla(q, k, v, kv_lens):
    from finetrainers_tpu.ops.attention import _xla_attention

    return _xla_attention(q, k, v, None, 0.0, False, None, None)


@variant("i2v_cross_xla")  # Wan I2V image-KV: 19968 q x 257 kv (pre-round-5 route)
def _v6():
    _env()
    return make_i2v_cross_inputs(), i2v_xla


@variant("i2v_cross_own")
def _v7():
    _env()
    return make_i2v_cross_inputs(), i2v_own


if __name__ == "__main__":
    main()
