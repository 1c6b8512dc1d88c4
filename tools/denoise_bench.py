"""Inference (serving) throughput: the LTX-Video denoise step on one chip.

Times the jitted classifier-free-guidance denoise step (transformer forward at
batch 2 + Euler update) at the flagship generation shape — the serving-side
counterpart of bench.py's training metric. Random weights (zero-egress
environment); TPU matmul timing is data-independent.

Usage: python tools/denoise_bench.py [--steps N]
Env:   BENCH_CFG=0 (disable the x2 CFG batch), BENCH_SEQ/BENCH_FRAMES/... via code.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from finetrainers_tpu.models.ltx_video.transformer import LTXVideoTransformer3DModel
    from finetrainers_tpu.models.ltx_video.base_specification import LTX_TRANSFORMER_CONFIG

    cfg = dict(LTX_TRANSFORMER_CONFIG)
    do_cfg = os.environ.get("BENCH_CFG", "1") == "1"
    B = 2 if do_cfg else 1  # uncond + cond through one forward (diffusers CFG)
    F, H, W, L = 7, 16, 24, 226  # 49f x 512 x 768 through the LTX VAE -> 2688 tokens
    S = F * H * W
    module = LTXVideoTransformer3DModel(**cfg, dtype=jnp.bfloat16, use_scan=True)

    shapes = jax.eval_shape(
        lambda r: module.init(
            r, jnp.zeros((B, S, cfg["in_channels"])), jnp.zeros((B, L, cfg["caption_channels"])),
            jnp.zeros((B,)), num_frames=F, height=H, width=W,
        )["params"],
        jax.random.PRNGKey(0),
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.ndim >= 2 else s.dtype), shapes
    )
    ehs = jnp.zeros((B, L, cfg["caption_channels"]), jnp.bfloat16)

    def denoise_step(params, latents, t, sigma, sigma_next, gs):
        v = module.apply(
            {"params": params}, latents.astype(jnp.bfloat16), ehs,
            jnp.full((B,), t, jnp.float32), num_frames=F, height=H, width=W,
        )
        if do_cfg:
            uncond, cond = jnp.split(v, 2)
            v = uncond + gs * (cond - uncond)
            v = jnp.concatenate([v, v])
        return latents + (sigma_next - sigma) * v

    step = jax.jit(denoise_step, donate_argnums=(1,))
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg["in_channels"]), jnp.float32)

    # warm up (compile) + warm the fold-free scalar path
    latents = step(params, latents, 999.0, 1.0, 0.98, 5.0)
    _ = np.asarray(latents[0, 0, 0])

    t0 = time.perf_counter()
    for i in range(args.steps):
        latents = step(params, latents, 999.0 - i, 1.0 - i * 0.01, 1.0 - (i + 1) * 0.01, 5.0)
    _ = np.asarray(latents[0, 0, 0])
    ms = (time.perf_counter() - t0) / args.steps * 1e3

    import json

    print(json.dumps({
        "metric": "denoise_step_ltx_video_49x512x768" + ("_cfg" if do_cfg else ""),
        "value": round(ms, 2),
        "unit": "ms/denoise-step",
        "seconds_for_50_steps": round(ms * 50 / 1e3, 2),
        "tokens": S,
        "batch": B,
    }))


if __name__ == "__main__":
    main()
