"""Micro-benchmark: the block-body elementwise ops standalone on the real chip.

The train-step profile (tools/profile_step.py) shows the non-matmul fusions in
the scan body (layernorm fwd+stats, adaLN modulate, gate+residual, gelu,
activation-stack DUS writes) at 10-20x the HBM-bandwidth floor (~0.5 ms for an
11 MB read). This times each in isolation with chained data dependence so we
can tell genuine inefficiency from profile-overlap artifacts before investing
in hand-fused Pallas replacements.

Usage: python tools/elementwise_bench.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, S, D = 1, 2688, 2048
FF = 8192
REPS = int(os.environ.get("BENCH_REPS", "50"))

VARIANTS = {}


def variant(name):
    def deco(fn):
        VARIANTS[name] = fn
        return fn
    return deco


@variant("layernorm_stats")  # fusion.1170/1208 analog: LN fwd, f32 stats out
def _ln(x, aux):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1)
    var = jnp.mean(x32 * x32, axis=-1) - mean * mean
    y = (x32 - mean[..., None]) * jax.lax.rsqrt(var[..., None] + 1e-6)
    # fold stats into the output so they materialize (the model saves them)
    y = y + (mean + var)[..., None] * 1e-6
    return y.astype(x.dtype), None


@variant("modulate_slicewise")  # adaLN: x*(1+scale)+shift, slice-wise vectors
def _mod(x, aux):
    scale, shift = aux
    x32 = x.astype(jnp.float32)
    return (x32 * (1.0 + scale[:, None]) + shift[:, None]).astype(x.dtype), None


@variant("gate_residual")  # res + gate*attn_out (fusion.1265 analog)
def _gate(x, aux):
    gate, res = aux
    return (res.astype(jnp.float32) + gate[:, None] * x.astype(jnp.float32)).astype(x.dtype), None


@variant("ln_mod_gate_chain")  # the full per-block elementwise chain, fused as XLA sees it
def _chain(x, aux):
    scale, shift = aux
    y, _ = _ln(x, None)
    y32 = y.astype(jnp.float32) * (1.0 + scale[:, None]) + shift[:, None]
    out = (x.astype(jnp.float32) + scale[:, None] * y32).astype(x.dtype)
    return out, None


@variant("gelu_ff")  # gelu over the (S, FF) hidden (tanh approx, as the models use)
def _gelu(x, aux):
    # h must depend on the chained x, else XLA hoists the gelu out of the
    # 28-application loop and the measurement reads below the bandwidth floor.
    h = aux[0] + x[:, :1] * 1e-6  # (S,1) broadcast keeps h inside the chain
    g = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    return x + g[:, : D] * 1e-6, None


@variant("stack_write")  # activation-stack DUS write analog (28, S, D)
def _stack(x, aux):
    # the stack is THREADED through the chain (returned as new aux) so each
    # DUS's input buffer is dead afterwards and XLA can write in place — the
    # model's scan carry has exactly this aliasing. A non-threaded stack
    # forces a full 118 MB copy per write and measures ~1 ms/op.
    stack = jax.lax.dynamic_update_slice(aux[0], x[None], (7, 0, 0))
    return x + stack[7] * 1e-6, (stack,)


def make_aux(name):
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 4)
    if name == "layernorm_stats":
        return ()
    if name == "modulate_slicewise" or name == "ln_mod_gate_chain":
        return (jax.random.normal(ks[0], (S,), jnp.float32),
                jax.random.normal(ks[1], (S,), jnp.float32))
    if name == "gate_residual":
        return (jax.random.normal(ks[0], (S,), jnp.float32),
                jax.random.normal(ks[1], (S, D), jnp.bfloat16))
    if name == "gelu_ff":
        return (jax.random.normal(ks[0], (S, FF), jnp.bfloat16),)
    if name == "stack_write":
        return (jnp.zeros((28, S, D), jnp.bfloat16),)
    return ()


def run(name, fn):
    x = jax.random.normal(jax.random.PRNGKey(0), (S, D), jnp.bfloat16)
    aux = make_aux(name)

    def step(x, aux):
        # 28 chained applications (one per transformer block) inside ONE jit:
        # the tunnel's ~0.7 ms per-dispatch overhead amortizes to ~25 us/op,
        # giving real per-op device time. aux threads through so stateful
        # variants (stack_write) keep in-place aliasing.
        for _ in range(28):
            out, new_aux = fn(x, aux)
            if new_aux is not None:
                aux = new_aux
            x = out * (1.0 - 1e-6)
        return x, jnp.sum(out[:8, :8].astype(jnp.float32))

    g = jax.jit(step, donate_argnums=(0,))
    t0 = time.perf_counter()
    x, l = g(x, aux)
    _ = np.asarray(l)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        x, l = g(x, aux)
    _ = np.asarray(l)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:22s} {ms:8.3f} ms /28 ops = {ms/28*1e3:7.1f} us/op  (compile {compile_s:.1f}s)", flush=True)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            run(name, VARIANTS[name])
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
