"""Go/no-go microbench for int8 frozen-weight matmuls (round-4 verdict item 9).

CogView4-6B is matmul-bound at ~55% MFU with fp8-STORED weights computed in
bf16. v5e's MXU rates int8 at 2x bf16 peak (394 vs 197 T/s), so a quantized
path (int8 W with per-channel scales x dynamically-quantized activations)
could raise the ceiling — IF XLA actually emits int8 MXU ops at these shapes
and the per-row activation-quantization VPU sweeps don't eat the win.

Times the CogView4 hot shapes: (S=4320, D=4096) x (D, 4D) ff1-style and
(D, D) projection-style, fwd only (the dgrad story is the same matmul
transposed). Chained-dependency timing like tools/attn_bench.py.

Usage: python tools/int8_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S, D = 4320, 4096
REPS = 30


def quant_rows(x):
    """Per-row symmetric int8 quantization: x ~= x_q * sx[:, None]."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = (absmax / 127.0).astype(jnp.float32) + 1e-12
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def variants(fout):
    w_bf16 = jax.random.normal(jax.random.PRNGKey(1), (D, fout), jnp.bfloat16)
    w_fp8 = w_bf16.astype(jnp.float8_e4m3fn)
    wq = jnp.clip(jnp.round(w_bf16.astype(jnp.float32) * 4.0), -127, 127).astype(jnp.int8)
    sw = jnp.full((fout,), 0.25, jnp.float32)

    def bf16(x):
        return jnp.dot(x, w_bf16)

    def fp8_stored(x):  # current production path: upcast fused into the matmul
        return jnp.dot(x, w_fp8.astype(jnp.bfloat16))

    def int8_static(x):  # ceiling: activations magically already int8
        xq = x.astype(jnp.int8)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sw).astype(jnp.bfloat16)

    def int8_dynamic(x):  # real path: per-row quantize + dequant epilogue
        xq, sx = quant_rows(x)
        acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    return {"bf16": bf16, "fp8_stored": fp8_stored,
            "int8_static": int8_static, "int8_dynamic": int8_dynamic}


def run(name, fn, fout):
    x = jax.random.normal(jax.random.PRNGKey(0), (S, D), jnp.bfloat16)

    def step(x):
        y = fn(x)
        # feed back to chain dependencies; reduce fout -> D via slicing
        return (y[:, :D]).astype(jnp.bfloat16) * 1e-3 + x, jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(step, donate_argnums=(0,))
    t0 = time.perf_counter()
    x, l = g(x)
    _ = np.asarray(l)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        x, l = g(x)
    _ = np.asarray(l)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    tflops = 2 * S * D * fout / (ms / 1e3) / 1e12
    print(f"{name:16s} fout={fout:6d} {ms:8.3f} ms  {tflops:7.1f} T/s  (compile {compile_s:.1f}s)",
          flush=True)


def main():
    names = sys.argv[1:] or None
    for fout in (4 * D, D):
        for name, fn in variants(fout).items():
            if names and name not in names:
                continue
            try:
                run(name, fn, fout)
            except Exception as e:
                print(f"{name:16s} fout={fout} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
