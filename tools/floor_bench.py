"""Memory-floor + throughput benchmark: CogVideoX-5B T2V LoRA on ONE v5e chip.

The reference's headline numbers are min-VRAM floors (reference README:95-109):
CogVideoX-5B LoRA needs **18 GB** on a single GPU at 49x512x768, rank 128, FP8
weight storage, gradient checkpointing, precomputation. This script runs the
same conditions through the REAL `models/cogvideox` spec forward (posterior
sampling, DDIM v-pred objective, per-batch timesteps) on a single 16 GB v5e
chip and reports XLA's static peak-HBM assignment plus steps/sec — the
counterpart of bench.py for the second-largest family in the reference's table.

Conditions (mirroring the reference footnotes, README:108-109):
  49f x 512 x 768 -> CogVideoX VAE (8x spatial, 4x temporal): latents
  (B, 13, 16, 64, 96), patch 2 -> 13*32*48 = 19968 video tokens + 226 text.
  LoRA rank 128 (fp32 factors), frozen weights stored float8_e4m3fn
  (--layerwise_upcasting_modules transformer), full per-block remat, bf16
  compute, AdamW.

Prints ONE JSON line like bench.py. Not wired into the driver contract —
bench.py stays the flagship metric; this records the BASELINE.md memory rows.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIMED_STEPS = int(os.environ.get("BENCH_TIMED_STEPS", "3"))
V5E_PEAK_FLOPS = 197e12
B = 1
F_LAT, H_LAT, W_LAT = 13, 64, 96  # 49x512x768 through the CogVideoX VAE
L_CTX = 226
LORA_RANK = 128


def cogvideox_train_step_flops(cfg: dict, lora_rank: int, remat_factor: float) -> float:
    """Analytic matmul FLOPs (joint text+video attention, 4x GELU FF)."""
    d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    nl = cfg["num_layers"]
    p = cfg["patch_size"]
    s_vid = F_LAT * (H_LAT // p) * (W_LAT // p)
    s = s_vid + L_CTX

    per_layer = 0.0
    per_layer += 4 * 2 * s * d * d            # q,k,v,out projections (joint seq)
    per_layer += 2 * 2 * s * s * d            # scores + weighted sum
    per_layer += 2 * 2 * s * d * 4 * d        # ff in + out
    per_layer += 6 * 2 * s * (d * lora_rank + lora_rank * d)
    fwd = nl * per_layer
    fwd += B * s_vid * 2 * (cfg["in_channels"] * p * p * d)   # patch embed
    fwd += B * L_CTX * 2 * (cfg["text_embed_dim"] * d)        # text proj
    fwd += B * s_vid * 2 * (d * cfg["out_channels"] * p * p)  # proj_out
    return fwd * B * (2.0 + remat_factor)


def main() -> None:
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from finetrainers_tpu.lora import lora_mask, merge_params, split_params
    from finetrainers_tpu.models.cogvideox.base_specification import (
        COGVIDEOX_5B_CONFIG,
        CogVideoXModelSpecification,
    )
    from finetrainers_tpu.models.cogvideox.transformer import CogVideoXTransformer3DModel
    from finetrainers_tpu.models.modeling_utils import ModelHandle
    from finetrainers_tpu.utils.fp8 import apply_layerwise_storage_dtype

    checkpoint = os.environ.get("BENCH_REMAT", "full")
    checkpoint = None if checkpoint == "none" else checkpoint

    cfg = dict(COGVIDEOX_5B_CONFIG)
    global F_LAT, H_LAT, W_LAT, L_CTX
    if os.environ.get("BENCH_TINY") == "1":  # plumbing smoke test (CPU)
        cfg.update(num_layers=2, num_attention_heads=4, attention_head_dim=16)
        F_LAT, H_LAT, W_LAT, L_CTX = 2, 8, 8, 16
    spec = CogVideoXModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )
    module = CogVideoXTransformer3DModel(
        **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
        use_scan=True, gradient_checkpointing=checkpoint,
    )

    shapes = jax.eval_shape(
        lambda r: module.init(
            r,
            jnp.zeros((B, F_LAT, cfg["in_channels"], H_LAT, W_LAT)),
            jnp.zeros((B, L_CTX, cfg["text_embed_dim"])),
            jnp.zeros((B,)),
        )["params"],
        jax.random.PRNGKey(0),
    )
    # Split on the SHAPE tree and materialize every frozen leaf directly in its
    # final storage dtype: creating 10 GB of bf16 zeros and THEN fp8-casting
    # keeps both copies live and OOMs a 16 GB chip before the step even runs.
    # (The trainer avoids this differently: it casts host-side safetensors
    # shards as they stream in.)
    mask = lora_mask(shapes)
    trainable_shapes, frozen_shapes = split_params(shapes, mask)
    trainable = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32) if s is not None else None,
        trainable_shapes, is_leaf=lambda x: x is None,
    )
    # Tiny same-structure template (rank preserved, 1-element leaves) run
    # through the PRODUCTION fp8 cast — paths and the ndim>=2 rule see exactly
    # what the trainer's frozen tree sees — then zeros materialize once, in the
    # final storage dtype.
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros((1,) * s.ndim, jnp.bfloat16 if s.ndim >= 2 else s.dtype)
        if s is not None else None,
        frozen_shapes, is_leaf=lambda x: x is None,
    )
    if os.environ.get("BENCH_FP8", "1") == "1":
        template = apply_layerwise_storage_dtype(template)
    frozen = jax.tree_util.tree_map(
        lambda s, t: jnp.zeros(s.shape, t.dtype) if s is not None else None,
        frozen_shapes, template, is_leaf=lambda x: x is None,
    )
    del template

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = jax.jit(optimizer.init)(trainable)
    handle_cfg = dict(cfg)

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, L_CTX, cfg["text_embed_dim"]), jnp.bfloat16),
        "encoder_attention_mask": jnp.ones((B, L_CTX), jnp.int32),
    }
    latent_conditions = {
        # frames-first VAE moments (B, F, 2C, H, W), as prepare_latents emits
        "latents": jnp.zeros((B, F_LAT, 2 * cfg["in_channels"], H_LAT, W_LAT), jnp.float32),
    }

    def train_step(trainable, frozen, opt_state, rng):
        sigmas = jax.random.uniform(rng, (B,))

        def loss_fn(trainable):
            p = merge_params(trainable, frozen)
            handle = ModelHandle(module, p, handle_cfg)
            pred, target, _ = spec.forward(
                handle, conditions, latent_conditions, sigmas, jax.random.fold_in(rng, 1)
            )
            return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    rng = jax.random.PRNGKey(0)
    step = jax.jit(train_step, donate_argnums=(0, 2)).lower(
        trainable, frozen, opt_state, rng
    ).compile()
    mem_gb = None
    try:
        ma = step.memory_analysis()
        mem_gb = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes) / 2**30, 2)
        print(f"static peak HBM: {mem_gb} GB  (args {ma.argument_size_in_bytes/2**30:.2f}, "
              f"out {ma.output_size_in_bytes/2**30:.2f}, alias {ma.alias_size_in_bytes/2**30:.2f}, "
              f"temp {ma.temp_size_in_bytes/2**30:.2f}, code {ma.generated_code_size_in_bytes/2**30:.2f})",
              flush=True)
    except Exception as e:
        print(f"static peak HBM unavailable: {e}", flush=True)
    if os.environ.get("BENCH_MEM_ONLY") == "1":
        return

    trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, 0))
    _ = np.asarray(loss)
    jax.block_until_ready(jax.random.fold_in(rng, 1))
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, i + 1))
    _ = np.asarray(loss)
    elapsed = (time.perf_counter() - t0) / TIMED_STEPS

    steps_per_sec = 1.0 / elapsed
    remat_factor = {"full": 1.0, "block_skip": 1.0, "ops": 0.0, "ops_narrow": 0.15, None: 0.0}[checkpoint]
    flops = cogvideox_train_step_flops(cfg, LORA_RANK, remat_factor)
    tflops = flops * steps_per_sec / 1e12
    print(json.dumps({
        "metric": "train_step_cogvideox_5b_lora_49x512x768_fp8",
        "value": round(steps_per_sec, 5),
        "unit": "steps/sec/chip",
        "seconds_per_step": round(elapsed, 3),
        "model_tflops_per_sec": round(tflops, 2),
        "mfu_vs_v5e_peak": round(tflops * 1e12 / V5E_PEAK_FLOPS, 4),
        "peak_hbm_gb": mem_gb,
        "reference_floor_gb": 18,
        "remat": checkpoint or "none",
    }))


if __name__ == "__main__":
    main()
