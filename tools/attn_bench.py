"""Micro-benchmark: LTX attention-path variants on the real chip.

Times fwd+bwd of the q/k preprocessing + flash attention subgraph at the
flagship shape (B=1, S=2688, N=32, H=64) so kernel/layout experiments iterate
in ~1 min instead of the ~8 min full-step compile.

Usage: python tools/attn_bench.py [variant ...]
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

B, S, N, H = 1, 2688, 32, 64
D = N * H
REPS = 20


def rms_norm(x, scale):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + 1e-6) * scale).astype(x.dtype)


def rope_interleaved(x, cos, sin):
    x32 = x.astype(jnp.float32)
    pairs = x32.reshape(*x.shape[:-1], -1, 2)
    rotated = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(x32.shape)
    return (x32 * cos[None] + rotated * sin[None]).astype(x.dtype)


def make_inputs():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, S, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, N, H), jnp.bfloat16)
    cos = jax.random.normal(ks[3], (S, D), jnp.float32)
    sin = jax.random.normal(ks[4], (S, D), jnp.float32)
    sq = jnp.ones((D,), jnp.float32)
    sk = jnp.ones((D,), jnp.float32)
    return q, k, v, cos, sin, sq, sk


def intree_flash(q, k, v):  # BTNH in
    from finetrainers_tpu.ops.attention import _tpu_flash_attention

    return _tpu_flash_attention(q, k, v, None, 0.0, False, None, None)


def own_flash(q, k, v, block=896):
    from finetrainers_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, block_q=block, block_kv=block)


def full_path(q, k, v, cos, sin, sq, sk, attn):
    qn = rms_norm(q, sq)
    kn = rms_norm(k, sk)
    qr = rope_interleaved(qn, cos, sin).reshape(B, S, N, H)
    kr = rope_interleaved(kn, cos, sin).reshape(B, S, N, H)
    return attn(qr, kr, v)


VARIANTS = {}
FWD_ONLY = set()  # variants timed without a backward (inference providers)


def variant(name, fwd_only=False):
    def deco(fn):
        VARIANTS[name] = fn
        if fwd_only:
            FWD_ONLY.add(name)
        return fn
    return deco


@variant("intree_full")  # norm+rope+in-tree flash (current model path)
def _v0(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    return full_path(q, k, v, cos, sin, sq, sk, intree_flash)


@variant("own_full")  # norm+rope+own kernel 896
def _v1(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    return full_path(q, k, v, cos, sin, sq, sk, own_flash)


@variant("own_fwd_only", fwd_only=True)  # inference fwd: own bf16 flash kernel
def _vf0(inputs):
    q, k, v, *_ = inputs
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("sage_fwd_only", fwd_only=True)  # inference fwd: int8 QK^T SageAttention
def _vf1(inputs):
    q, k, v, *_ = inputs
    from finetrainers_tpu.ops.sage_attention import sage_attention

    blk = int(os.environ.get("SAGE_BLOCK", "896"))
    return sage_attention(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v,
                          block_q=blk, block_kv=blk)


@variant("intree_attn_only")
def _v2(inputs):
    q, k, v, *_ = inputs
    return intree_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_attn_only")
def _v3(inputs):
    q, k, v, *_ = inputs
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_attn_only_512")
def _v3b(inputs):
    q, k, v, *_ = inputs
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v, block=512)


@variant("own_attn_only_1344")
def _v3c(inputs):
    q, k, v, *_ = inputs
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v, block=1344)


@variant("own_attn_only_2688")
def _v3d(inputs):
    q, k, v, *_ = inputs
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v, block=2688)


@variant("own_fused_rope_1344")
def _v5b(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    from finetrainers_tpu.ops.flash_attention import flash_attention

    qn = rms_norm(q, sq).reshape(B, S, N, H)
    kn = rms_norm(k, sk).reshape(B, S, N, H)
    return flash_attention(qn, kn, v, block_q=1344, block_kv=1344,
                           rope_cos=cos, rope_sin=sin)


def _set_fwd_experiments(skew="0", twolevel="0", twopass="0"):
    os.environ["FINETRAINERS_FLASH_SKEW"] = skew
    os.environ["FINETRAINERS_FLASH_TWOLEVEL"] = twolevel
    os.environ["FINETRAINERS_FLASH_TWOPASS"] = twopass


@variant("own_skew_attn_only")  # skewed fwd (VPU/MXU overlap), straight bwd
def _vs0(inputs):
    q, k, v, *_ = inputs
    _set_fwd_experiments(skew="1")
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_skew_fused_rope")  # skewed fwd with in-kernel RoPE
def _vs1(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    from finetrainers_tpu.ops.flash_attention import flash_attention

    _set_fwd_experiments(skew="1")
    qn = rms_norm(q, sq).reshape(B, S, N, H)
    kn = rms_norm(k, sk).reshape(B, S, N, H)
    return flash_attention(qn, kn, v, block_q=896, block_kv=896,
                           rope_cos=cos, rope_sin=sin)


@variant("own_skew_fwd_only", fwd_only=True)
def _vs2(inputs):
    q, k, v, *_ = inputs
    _set_fwd_experiments(skew="1")
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_twolevel_fwd_only", fwd_only=True)  # block-local max softmax
def _vt0(inputs):
    q, k, v, *_ = inputs
    _set_fwd_experiments(twolevel="1")
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_twolevel_fused_rope")
def _vt1(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    from finetrainers_tpu.ops.flash_attention import flash_attention

    _set_fwd_experiments(twolevel="1")
    qn = rms_norm(q, sq).reshape(B, S, N, H)
    kn = rms_norm(k, sk).reshape(B, S, N, H)
    return flash_attention(qn, kn, v, block_q=896, block_kv=896,
                           rope_cos=cos, rope_sin=sin)


@variant("own_baseline_fwd_only", fwd_only=True)  # straight kernel, env reset
def _vb0(inputs):
    q, k, v, *_ = inputs
    _set_fwd_experiments()
    return own_flash(q.reshape(B, S, N, H), k.reshape(B, S, N, H), v)


@variant("own_baseline_fused_rope")  # straight kernel, env reset
def _vb1(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    from finetrainers_tpu.ops.flash_attention import flash_attention

    _set_fwd_experiments()
    qn = rms_norm(q, sq).reshape(B, S, N, H)
    kn = rms_norm(k, sk).reshape(B, S, N, H)
    return flash_attention(qn, kn, v, block_q=896, block_kv=896,
                           rope_cos=cos, rope_sin=sin)


@variant("prep_only")  # norm+rope, no attention
def _v4(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    qr = rope_interleaved(rms_norm(q, sq), cos, sin).reshape(B, S, N, H)
    kr = rope_interleaved(rms_norm(k, sk), cos, sin).reshape(B, S, N, H)
    return qr + kr + v


@variant("own_fused_rope")  # our kernel with in-kernel RoPE (raw q/k in)
def _v5(inputs):
    q, k, v, cos, sin, sq, sk = inputs
    from finetrainers_tpu.ops.flash_attention import flash_attention

    qn = rms_norm(q, sq).reshape(B, S, N, H)
    kn = rms_norm(k, sk).reshape(B, S, N, H)
    return flash_attention(qn, kn, v, block_q=896, block_kv=896,
                           rope_cos=cos, rope_sin=sin)


def run(name, fn, inputs):
    """Chained timing: feed dq back in as q so steps are data-dependent, sync
    once with a scalar np.asarray (block_until_ready does NOT sync on the axon
    tunnel; see .claude/skills/verify/SKILL.md)."""
    # Experiment variants mutate process env; reset so a non-experiment
    # variant run AFTER one never silently times the wrong kernel. Variants
    # that want a flag re-set it inside their own body (which runs at trace
    # time, after this reset).
    _set_fwd_experiments()

    def loss(q, rest):
        out = fn((q, *rest))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if name in FWD_ONLY:
        def step(q, rest):
            out = fn((q, *rest))
            l = jnp.sum(out.astype(jnp.float32) ** 2)
            return out.reshape(q.shape).astype(q.dtype) * 1e-6 + q, l
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
    kind = "fwd-only" if name in FWD_ONLY else "fwd+bwd "
    print(f"{name:24s} {ms:8.2f} ms {kind}  (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        if name not in VARIANTS:
            print(f"skip unknown {name}")
            continue
        try:
            run(name, VARIANTS[name], make_inputs())  # fresh: q gets donated
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
