"""Per-shard attention kernel cost of each CP strategy at Wan scale.

Single-chip measurement of the PER-DEVICE attention compute each context-parallel
strategy executes (the ICI hops themselves can't run on one chip; ring's KV
rotation overlaps compute, so kernel time is the dominant term):

  - ring:      cp sequential hops of flash(Sq=S/cp, Skv=S/cp) (+ bwd per hop)
  - ulysses:   one flash(Sq=S, Skv=S) over N/cp heads (all-to-all resharding)
  - allgather: one flash(Sq=S/cp, Skv=S) against the gathered full KV

Shapes: Wan 2.1 class — S=16384 tokens, N=12 heads, H=128.
Usage: python tools/cp_bench.py [cp ...]   (default 2 4)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

S, N, H = 16384, 12, 128
REPS = 10


def _measure(fn, *args):
    def loss(q, rest):
        return jnp.sum(fn(q, *rest).astype(jnp.float32) ** 2)

    def step(q, rest):
        l, dq = jax.value_and_grad(loss)(q, rest)
        return q + dq.astype(q.dtype) * 1e-6, l

    g = jax.jit(step, donate_argnums=(0,))
    q, rest = args[0], tuple(args[1:])
    q, l = g(q, rest)
    _ = np.asarray(l)
    t0 = time.perf_counter()
    for _ in range(REPS):
        q, l = g(q, rest)
    _ = np.asarray(l)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    from finetrainers_tpu.ops.attention import _pick_flash_block
    from finetrainers_tpu.ops.flash_attention import flash_attention

    cps = [int(a) for a in sys.argv[1:]] or [2, 4]
    rng = jax.random.PRNGKey(0)

    def qkv(sq, skv, n):
        q = jax.random.normal(jax.random.fold_in(rng, 1), (1, sq, n, H), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 2), (1, skv, n, H), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 3), (1, skv, n, H), jnp.bfloat16)
        return q, k, v

    def attn(q, k, v):
        bq = _pick_flash_block(q.shape[1])
        bkv = _pick_flash_block(k.shape[1])
        return flash_attention(q, k, v, block_q=bq, block_kv=bkv)

    print(f"Wan-scale attention: S={S}, N={N}, H={H} (fwd+bwd ms per device per layer)", flush=True)
    base = _measure(attn, *qkv(S, S, N))
    print(f"  no-CP full sequence:            {base:8.2f} ms", flush=True)
    for cp in cps:
        hop = _measure(attn, *qkv(S // cp, S // cp, N))
        ring = hop * cp
        uly = _measure(attn, *qkv(S, S, N // cp))
        ag = _measure(attn, *qkv(S // cp, S, N))
        print(
            f"  cp={cp}: ring {ring:8.2f} ms ({cp}x{hop:.2f}/hop)   "
            f"ulysses {uly:8.2f} ms   allgather-KV {ag:8.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
