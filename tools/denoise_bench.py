"""Inference (serving) throughput: the denoise step on one chip.

Times the jitted classifier-free-guidance denoise step (transformer forward at
batch 2 + Euler update) at the flagship generation shape — the serving-side
counterpart of bench.py's training metric. Random weights (zero-egress
environment); TPU matmul timing is data-independent.

Usage: python tools/denoise_bench.py [--steps N]
Env:   BENCH_CFG=0 (disable the x2 CFG batch);
       BENCH_FAMILY=ltx_video (default) | cogview4_6b (1024x1024 T2I);
       BENCH_INT8=1 (int8 weights + int8 MXU matmuls — serving-side
       quantization, docs/perf.md round 5).
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

    family = os.environ.get("BENCH_FAMILY", "ltx_video")
    do_cfg = os.environ.get("BENCH_CFG", "1") == "1"
    B = 2 if do_cfg else 1  # uncond + cond through one forward (diffusers CFG)

    if family == "wan_1_3b":
        from finetrainers_tpu.models.wan.base_specification import WAN_T2V_1_3B_CONFIG
        from finetrainers_tpu.models.wan.transformer import WanTransformer3DModel

        cfg = dict(WAN_T2V_1_3B_CONFIG)
        f_lat, h_lat, w_lat, L = 13, 64, 96, 512  # 49x512x768 -> 19968 tokens
        S = f_lat * (h_lat // 2) * (w_lat // 2)
        module = WanTransformer3DModel(**cfg, dtype=jnp.bfloat16, use_scan=True)
        lat_shape = (B, cfg["in_channels"], f_lat, h_lat, w_lat)
        ehs = jnp.zeros((B, L, cfg["text_dim"]), jnp.bfloat16)

        def forward(params, latents, t):
            return module.apply(
                {"params": params}, latents.astype(jnp.bfloat16), ehs,
                jnp.full((B,), t, jnp.float32),
            )

        def init_fn(r):
            return module.init(
                r, jnp.zeros(lat_shape), ehs.astype(jnp.float32), jnp.zeros((B,)),
            )["params"]
    elif family == "cogview4_6b":
        from finetrainers_tpu.models.cogview4.base_specification import COGVIEW4_TRANSFORMER_CONFIG
        from finetrainers_tpu.models.cogview4.transformer import CogView4Transformer2DModel

        cfg = dict(COGVIEW4_TRANSFORMER_CONFIG)
        h_lat, w_lat, L = 128, 128, 224  # 1024x1024 through the 8x KL VAE
        S = (h_lat // cfg["patch_size"]) * (w_lat // cfg["patch_size"]) + L
        module = CogView4Transformer2DModel(**cfg, dtype=jnp.bfloat16, use_scan=True)
        lat_shape = (B, cfg["in_channels"], h_lat, w_lat)
        ehs = jnp.zeros((B, L, cfg["text_embed_dim"]), jnp.bfloat16)
        sizes = dict(
            original_size=jnp.full((B, 2), 1024.0),
            target_size=jnp.full((B, 2), 1024.0),
            crop_coords=jnp.zeros((B, 2)),
        )

        def forward(params, latents, t):
            return module.apply(
                {"params": params}, latents.astype(jnp.bfloat16), ehs,
                jnp.full((B,), t, jnp.float32), **sizes,
            )

        def init_fn(r):
            return module.init(
                r, jnp.zeros(lat_shape), ehs.astype(jnp.float32),
                jnp.zeros((B,)), **sizes,
            )["params"]
    else:
        from finetrainers_tpu.models.ltx_video.base_specification import LTX_TRANSFORMER_CONFIG
        from finetrainers_tpu.models.ltx_video.transformer import LTXVideoTransformer3DModel

        cfg = dict(LTX_TRANSFORMER_CONFIG)
        F, H, W, L = 7, 16, 24, 226  # 49f x 512 x 768 through the LTX VAE -> 2688 tokens
        S = F * H * W
        module = LTXVideoTransformer3DModel(**cfg, dtype=jnp.bfloat16, use_scan=True)
        lat_shape = (B, S, cfg["in_channels"])
        ehs = jnp.zeros((B, L, cfg["caption_channels"]), jnp.bfloat16)

        def forward(params, latents, t):
            return module.apply(
                {"params": params}, latents.astype(jnp.bfloat16), ehs,
                jnp.full((B,), t, jnp.float32), num_frames=F, height=H, width=W,
            )

        def init_fn(r):
            return module.init(
                r, jnp.zeros(lat_shape), ehs.astype(jnp.float32),
                jnp.zeros((B,)), num_frames=F, height=H, width=W,
            )["params"]

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    quant = os.environ.get("BENCH_INT8") == "1"
    if quant:
        # Serving-side int8 (random-weight timing): materialize the quantized
        # tree DIRECTLY from a tiny shape template — quantizing a live 12 GB
        # bf16 tree on a 16 GB chip OOMs on the f32 absmax temporaries.
        from finetrainers_tpu.utils.int8 import apply_int8_storage, materialize_zeros_like

        template = jax.tree_util.tree_map(
            lambda s: jnp.zeros((1,) * s.ndim, jnp.bfloat16 if s.ndim >= 2 else s.dtype),
            shapes,
        )
        params = materialize_zeros_like(shapes, apply_int8_storage(template))
    else:
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.ndim >= 2 else s.dtype), shapes
        )

    def denoise_step(params, latents, t, sigma, sigma_next, gs):
        v = forward(params, latents, t)
        if do_cfg:
            uncond, cond = jnp.split(v, 2)
            v = uncond + gs * (cond - uncond)
            v = jnp.concatenate([v, v])
        return latents + (sigma_next - sigma) * v

    step = jax.jit(denoise_step, donate_argnums=(1,))
    latents = jax.random.normal(jax.random.PRNGKey(1), lat_shape, jnp.float32)

    # warm up (compile) + warm the fold-free scalar path
    latents = step(params, latents, 999.0, 1.0, 0.98, 5.0)
    _ = np.asarray(latents[0, 0, 0])

    t0 = time.perf_counter()
    for i in range(args.steps):
        latents = step(params, latents, 999.0 - i, 1.0 - i * 0.01, 1.0 - (i + 1) * 0.01, 5.0)
    _ = np.asarray(latents[0, 0, 0])
    ms = (time.perf_counter() - t0) / args.steps * 1e3

    import json

    shape_tag = "1024x1024" if family == "cogview4_6b" else "49x512x768"
    print(json.dumps({
        "metric": f"denoise_step_{family}_{shape_tag}" + ("_cfg" if do_cfg else "")
                  + ("_int8" if quant else ""),
        "value": round(ms, 2),
        "unit": "ms/denoise-step",
        "seconds_for_50_steps": round(ms * 50 / 1e3, 2),
        "tokens": S,
        "batch": B,
    }))


if __name__ == "__main__":
    main()
