"""Memory-floor + throughput benchmarks for the reference's headline table.

The reference's headline numbers are min-VRAM floors (reference README:95-109)
at 49x512x768, LoRA rank 128, FP8 weight storage, gradient checkpointing,
precomputation:

  LTX-Video LoRA        5 GB   (bench.py covers LTX throughput + peak HBM)
  CogVideoX-5B LoRA    18 GB   -> BENCH_FAMILY=cogvideox_5b (default), 1 chip
  HunyuanVideo LoRA    32 GB   -> BENCH_FAMILY=hunyuan_video; ~12.6 GB of fp8
                                  weights cannot fit one 16 GB v5e, so run with
                                  BENCH_SHARDS=N (FSDP param/opt sharding) and
                                  report the per-chip static assignment.

Each family runs the REAL spec forward (posterior sampling, family objective,
LoRA rank 128 fp32 factors, fp8 frozen storage, full per-block remat, bf16
compute, AdamW) and prints ONE JSON line with XLA's static peak-HBM
(per device) and steps/sec. Not wired into the driver contract — bench.py
stays the flagship metric; this records the BASELINE.md memory rows.

Env: BENCH_FAMILY, BENCH_SHARDS (dp_shard FSDP degree; static memory is
per-device and valid on a forced-CPU mesh), BENCH_MEM_ONLY=1 (stop after the
memory analysis), BENCH_FP8=0 (bf16 frozen weights), BENCH_REMAT, BENCH_TINY=1
(plumbing smoke test), BENCH_TIMED_STEPS.
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
LORA_RANK = 128
TINY = os.environ.get("BENCH_TINY") == "1"


def _attn_ff_flops(s: int, d: int, lora_rank: int) -> float:
    """Per-layer matmul FLOPs: q,k,v,out + joint scores + 4x GELU FF + LoRA."""
    fl = 4 * 2 * s * d * d
    fl += 2 * 2 * s * s * d
    fl += 2 * 2 * s * d * 4 * d
    fl += 6 * 2 * s * (d * lora_rank + lora_rank * d)
    return fl


def setup_cogvideox(jnp):
    from finetrainers_tpu.models.cogvideox.base_specification import (
        COGVIDEOX_5B_CONFIG,
        CogVideoXModelSpecification,
    )
    from finetrainers_tpu.models.cogvideox.transformer import CogVideoXTransformer3DModel

    cfg = dict(COGVIDEOX_5B_CONFIG)
    f_lat, h_lat, w_lat, l_ctx = 13, 64, 96, 226  # 49x512x768 through the VAE
    # BENCH_FRAMES=N (pixel frames): the headline 49f config exceeds one 16 GB
    # chip (memory-floor table); 17f fits and gives the family an on-chip
    # throughput row (S = 5*32*48 + 226 = 7906 joint tokens).
    frames = int(os.environ.get("BENCH_FRAMES", "49"))
    f_lat = (frames - 1) // 4 + 1
    if TINY:
        cfg.update(num_layers=2, num_attention_heads=4, attention_head_dim=16)
        f_lat, h_lat, w_lat, l_ctx = 2, 8, 8, 16
    spec = CogVideoXModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )

    def make_module(checkpoint):
        return CogVideoXTransformer3DModel(
            **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
            use_scan=True, gradient_checkpointing=checkpoint,
        )

    def init_args():
        return (
            jnp.zeros((B, f_lat, cfg["in_channels"], h_lat, w_lat)),
            jnp.zeros((B, l_ctx, cfg["text_embed_dim"])),
            jnp.zeros((B,)),
        )

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, l_ctx, cfg["text_embed_dim"]), jnp.bfloat16),
        "encoder_attention_mask": jnp.ones((B, l_ctx), jnp.int32),
    }
    latent_conditions = {
        # frames-first VAE moments (B, F, 2C, H, W), as prepare_latents emits
        "latents": jnp.zeros((B, f_lat, 2 * cfg["in_channels"], h_lat, w_lat), jnp.float32),
    }

    def flops(remat_factor: float) -> float:
        d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
        p = cfg["patch_size"]
        s = f_lat * (h_lat // p) * (w_lat // p) + l_ctx
        fwd = cfg["num_layers"] * _attn_ff_flops(s, d, LORA_RANK)
        return fwd * B * (2.0 + remat_factor)

    return (spec, make_module, init_args, conditions, latent_conditions, flops,
            18 if frames == 49 else None, f"{frames}x512x768")


def setup_hunyuan(jnp):
    from finetrainers_tpu.models.hunyuan_video.base_specification import (
        HUNYUAN_VIDEO_CONFIG,
        HunyuanVideoModelSpecification,
    )
    from finetrainers_tpu.models.hunyuan_video.transformer import HunyuanVideoTransformer3DModel

    cfg = dict(HUNYUAN_VIDEO_CONFIG)
    f_lat, h_lat, w_lat, l_ctx = 13, 64, 96, 256  # 49x512x768 through the VAE
    frames = int(os.environ.get("BENCH_FRAMES", "49"))  # see cogvideox note
    f_lat = (frames - 1) // 4 + 1
    if TINY:
        # head_dim stays 128: the axial RoPE split (16/56/56) is tied to it
        cfg.update(num_layers=1, num_single_layers=2, num_refiner_layers=1,
                   num_attention_heads=2)
        f_lat, h_lat, w_lat, l_ctx = 2, 8, 8, 16
    spec = HunyuanVideoModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )

    def make_module(checkpoint):
        return HunyuanVideoTransformer3DModel(
            **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
            use_scan=True, gradient_checkpointing=checkpoint,
        )

    def init_args():
        return (
            jnp.zeros((B, cfg["in_channels"], 1, 2 * cfg["patch_size"], 2 * cfg["patch_size"])),
            jnp.zeros((B, 8, cfg["text_embed_dim"])),
            jnp.zeros((B,)),
            jnp.zeros((B, cfg["pooled_projection_dim"])),
        )

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, l_ctx, cfg["text_embed_dim"]), jnp.bfloat16),
        "encoder_attention_mask": jnp.ones((B, l_ctx), jnp.int32),
        "pooled_projections": jnp.zeros((B, cfg["pooled_projection_dim"]), jnp.bfloat16),
    }
    latent_conditions = {
        # channels-first VAE moments (B, 2C, F, H, W)
        "latents": jnp.zeros((B, 2 * cfg["in_channels"], f_lat, h_lat, w_lat), jnp.float32),
    }

    def flops(remat_factor: float) -> float:
        # Approximate: dual blocks run attn+ff on the joint stream (video+text
        # params counted once at joint length), single blocks likewise; the
        # 2 text-refiner layers (256 tokens) are negligible.
        d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
        p = cfg["patch_size"]
        s = f_lat * (h_lat // p) * (w_lat // p) + l_ctx
        per_dual = 2 * _attn_ff_flops(s, d, LORA_RANK)  # separate stream params
        per_single = _attn_ff_flops(s, d, LORA_RANK)
        fwd = cfg["num_layers"] * per_dual + cfg["num_single_layers"] * per_single
        return fwd * B * (2.0 + remat_factor)

    return (spec, make_module, init_args, conditions, latent_conditions, flops,
            32 if frames == 49 else None, f"{frames}x512x768")


def setup_wan(jnp):
    """Wan2.1-T2V-1.3B at the reference headline conditions (49x512x768, rank
    128): the second real family with a full steps/s + MFU measurement on ONE
    chip (CogVideoX-5B/Hunyuan at the same conditions exceed 16 GB single-chip,
    see docs/perf.md memory floors — their rows here are memory-only)."""
    from finetrainers_tpu.models.wan.base_specification import (
        WAN_T2V_1_3B_CONFIG,
        WanModelSpecification,
    )
    from finetrainers_tpu.models.wan.transformer import WanTransformer3DModel

    cfg = dict(WAN_T2V_1_3B_CONFIG)
    f_lat, h_lat, w_lat, l_ctx = 13, 64, 96, 512  # 49x512x768 through the Wan VAE
    if TINY:
        cfg.update(num_layers=2, num_attention_heads=2, ffn_dim=64)
        f_lat, h_lat, w_lat, l_ctx = 2, 8, 8, 16
    spec = WanModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )

    def make_module(checkpoint):
        return WanTransformer3DModel(
            **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
            use_scan=True, gradient_checkpointing=checkpoint,
        )

    def init_args():
        return (
            jnp.zeros((B, cfg["in_channels"], 1, 2, 2)),
            jnp.zeros((B, 8, cfg["text_dim"])),
            jnp.zeros((B,)),
        )

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, l_ctx, cfg["text_dim"]), jnp.bfloat16),
        "encoder_attention_mask": jnp.ones((B, l_ctx), jnp.int32),
    }
    latent_conditions = {
        "latents": jnp.zeros((B, 2 * cfg["in_channels"], f_lat, h_lat, w_lat), jnp.float32),
        "latents_mean": jnp.zeros((cfg["in_channels"],), jnp.float32),
        "latents_std": jnp.ones((cfg["in_channels"],), jnp.float32),
    }

    def flops(remat_factor: float) -> float:
        d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
        pt, ph, pw = cfg["patch_size"]
        s = (f_lat // pt) * (h_lat // ph) * (w_lat // pw)
        # per layer: qkv/out + self-attn scores at s, cross-attn kv at l_ctx,
        # ffn at ffn_dim (not 4d), LoRA
        fl = 4 * 2 * s * d * d
        fl += 2 * 2 * s * s * d  # self-attention scores+values
        fl += 2 * 2 * s * l_ctx * d  # cross-attention scores+values
        fl += 2 * 2 * l_ctx * d * d  # cross k/v projections
        fl += 2 * 2 * s * d * cfg["ffn_dim"]
        fl += 8 * 2 * s * (d * LORA_RANK + LORA_RANK * d)
        fwd = cfg["num_layers"] * fl
        return fwd * B * (2.0 + remat_factor)

    return spec, make_module, init_args, conditions, latent_conditions, flops, None, "49x512x768"


def setup_cogview4(jnp):
    """CogView4-6B T2I at 1024x1024 (the reference README's CogView4 row is
    "TODO"; these are its validation-default conditions): 16-ch latents at
    128x128, patch 2 -> 4096 image tokens + 224 GLM text tokens, LoRA r128."""
    from finetrainers_tpu.models.cogview4.base_specification import (
        COGVIEW4_TRANSFORMER_CONFIG,
        CogView4ModelSpecification,
    )
    from finetrainers_tpu.models.cogview4.transformer import CogView4Transformer2DModel

    cfg = dict(COGVIEW4_TRANSFORMER_CONFIG)
    h_lat, w_lat, l_ctx = 128, 128, 224  # 1024x1024 through the 8x KL VAE
    if TINY:
        cfg.update(num_layers=2, num_attention_heads=2, attention_head_dim=16)
        h_lat, w_lat, l_ctx = 8, 8, 16
    spec = CogView4ModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )

    def make_module(checkpoint):
        return CogView4Transformer2DModel(
            **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
            use_scan=True, gradient_checkpointing=checkpoint,
        )

    def init_args():
        return (
            jnp.zeros((B, cfg["in_channels"], 4, 4)),
            jnp.zeros((B, 8, cfg["text_embed_dim"])),
            jnp.zeros((B,)),
        )

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, l_ctx, cfg["text_embed_dim"]), jnp.bfloat16),
    }
    latent_conditions = {
        "latents": jnp.zeros((B, 2 * cfg["in_channels"], h_lat, w_lat), jnp.float32),
        "original_size": jnp.full((B, 2), 1024.0),
        "target_size": jnp.full((B, 2), 1024.0),
        "crop_coords": jnp.zeros((B, 2)),
    }

    def flops(remat_factor: float) -> float:
        d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
        p = cfg["patch_size"]
        s = (h_lat // p) * (w_lat // p) + l_ctx  # joint stream
        fwd = cfg["num_layers"] * _attn_ff_flops(s, d, LORA_RANK)
        return fwd * B * (2.0 + remat_factor)

    return spec, make_module, init_args, conditions, latent_conditions, flops, None, "1024x1024"


def setup_flux(jnp):
    """Flux.1-dev T2I at 1024x1024 (reference README row "TODO"): packed 2x2
    latents -> 4096 image tokens + 512 T5 tokens, 19 dual + 38 single blocks,
    LoRA r128. ~11.9 GB of fp8 weights: single-chip fit is memory-bound."""
    from finetrainers_tpu.models.flux.base_specification import (
        FLUX_TRANSFORMER_CONFIG,
        FluxModelSpecification,
    )
    from finetrainers_tpu.models.flux.transformer import FluxTransformer2DModel

    cfg = dict(FLUX_TRANSFORMER_CONFIG)
    h_lat, w_lat, l_ctx = 128, 128, 512  # 1024x1024 through the 8x KL VAE
    # BENCH_RES=512: 1024 image tokens — the only Flux shape with a chance of
    # fitting one 16 GB chip next to ~11.9 GB of fp8 weights.
    res = int(os.environ.get("BENCH_RES", "1024"))
    h_lat = w_lat = res // 8
    if TINY:
        cfg.update(num_layers=1, num_single_layers=1, num_attention_heads=2)
        h_lat, w_lat, l_ctx = 8, 8, 16
    spec = FluxModelSpecification(
        pretrained_model_name_or_path="floor-bench-random-init",
        transformer_config=cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK,
    )

    def make_module(checkpoint):
        return FluxTransformer2DModel(
            **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
            use_scan=True, gradient_checkpointing=checkpoint,
        )

    def init_args():
        return (
            jnp.zeros((B, 4, cfg["in_channels"])),
            jnp.zeros((B, 8, cfg["joint_attention_dim"])),
            jnp.zeros((B, cfg["pooled_projection_dim"])),
            jnp.zeros((B,)),
            jnp.zeros((4, 3)),
            jnp.zeros((8, 3)),
        )

    s_img = (h_lat // 2) * (w_lat // 2)
    conditions = {
        "encoder_hidden_states": jnp.zeros((B, l_ctx, cfg["joint_attention_dim"]), jnp.bfloat16),
        "pooled_projections": jnp.zeros((B, cfg["pooled_projection_dim"]), jnp.bfloat16),
    }
    latent_conditions = {
        # 2D KL moments (B, 2C, H, W); the spec packs 2x2 internally
        "latents": jnp.zeros((B, 2 * (cfg["in_channels"] // 4), h_lat, w_lat), jnp.float32),
    }

    def flops(remat_factor: float) -> float:
        d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
        s = s_img + l_ctx
        per_dual = 2 * _attn_ff_flops(s, d, LORA_RANK)
        per_single = _attn_ff_flops(s, d, LORA_RANK)
        fwd = cfg["num_layers"] * per_dual + cfg["num_single_layers"] * per_single
        return fwd * B * (2.0 + remat_factor)

    return (spec, make_module, init_args, conditions, latent_conditions, flops,
            None, f"{res}x{res}")


FAMILIES = {"cogvideox_5b": setup_cogvideox, "hunyuan_video": setup_hunyuan,
            "wan_1_3b": setup_wan, "cogview4_6b": setup_cogview4,
            "flux_dev": setup_flux}


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
    from finetrainers_tpu.models.modeling_utils import ModelHandle
    from finetrainers_tpu.utils.fp8 import apply_layerwise_storage_dtype

    family = os.environ.get("BENCH_FAMILY", "cogvideox_5b")
    shards = int(os.environ.get("BENCH_SHARDS", "1"))
    checkpoint = os.environ.get("BENCH_REMAT", "full")
    checkpoint = None if checkpoint == "none" else checkpoint

    (spec, make_module, init_args, conditions, latent_conditions, flops_fn, ref_floor,
     bench_conditions) = FAMILIES[family](jnp)
    module = make_module(checkpoint)

    shapes = jax.eval_shape(
        lambda r: module.init(r, *init_args())["params"], jax.random.PRNGKey(0)
    )
    # Split on the SHAPE tree and materialize every frozen leaf directly in its
    # final storage dtype: creating 10+ GB of bf16 zeros and THEN fp8-casting
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
    if os.environ.get("BENCH_INT8", "0") == "1":
        # int8 frozen-weight MXU path (round-5 experiment): the transform adds
        # kernel_qscale sidecar leaves, so materialize by walking the template
        # dict (shapes tree lacks the sidecars; qscale shape = features).
        from finetrainers_tpu.utils.int8 import apply_int8_storage, materialize_zeros_like

        frozen = materialize_zeros_like(frozen_shapes, apply_int8_storage(template))
    else:
        if os.environ.get("BENCH_FP8", "1") == "1":
            template = apply_layerwise_storage_dtype(template)
        frozen = jax.tree_util.tree_map(
            lambda s, t: jnp.zeros(s.shape, t.dtype) if s is not None else None,
            frozen_shapes, template, is_leaf=lambda x: x is None,
        )
    del template

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    handle_cfg = dict(spec.transformer_config)

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

    if shards > 1:
        # FSDP: params + opt state sharded over dp_shard (same inference rules
        # the trainer uses); static memory below is PER DEVICE.
        from finetrainers_tpu.parallel import (
            MeshEnv,
            ParallelDims,
            derive_opt_state_shardings,
            make_param_shardings,
            shard_pytree,
        )

        env = MeshEnv(ParallelDims(dp_replicate=1, dp_shard=shards, cp=1, tp=1),
                      devices=jax.devices()[:shards])
        params_tree = merge_params(trainable, frozen)
        shardings = make_param_shardings(params_tree, env.mesh, tp_rules=spec.tp_rules())
        t_shard = jax.tree_util.tree_map(
            lambda m, s: s if m else None, mask, shardings)
        f_shard = jax.tree_util.tree_map(
            lambda m, s: None if m else s, mask, shardings)
        trainable = shard_pytree(trainable, t_shard)
        frozen = shard_pytree(frozen, f_shard)
        abstract_opt = jax.eval_shape(optimizer.init, trainable)
        opt_shardings = derive_opt_state_shardings(abstract_opt, t_shard, env.mesh)
        opt_state = jax.jit(optimizer.init, out_shardings=opt_shardings)(trainable)
    else:
        opt_state = jax.jit(optimizer.init)(trainable)

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
        print(f"static peak HBM/device: {mem_gb} GB  (args {ma.argument_size_in_bytes/2**30:.2f}, "
              f"out {ma.output_size_in_bytes/2**30:.2f}, alias {ma.alias_size_in_bytes/2**30:.2f}, "
              f"temp {ma.temp_size_in_bytes/2**30:.2f}, code {ma.generated_code_size_in_bytes/2**30:.2f})",
              flush=True)
    except Exception as e:
        print(f"static peak HBM unavailable: {e}", flush=True)
    if os.environ.get("BENCH_MEM_ONLY") == "1":
        _emit(family, shards, checkpoint, None, None, mem_gb, ref_floor, bench_conditions)
        return

    trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, 0))
    _ = np.asarray(loss)
    jax.block_until_ready(jax.random.fold_in(rng, 1))
    # BENCH_PROFILE=<dir>: capture an xplane trace of the timed steps; analyze
    # with `python tools/profile_step.py --analyze-only --out <dir>`.
    profile_dir = os.environ.get("BENCH_PROFILE")
    import contextlib
    prof_ctx = jax.profiler.trace(profile_dir) if profile_dir else contextlib.nullcontext()
    with prof_ctx:
        t0 = time.perf_counter()
        for i in range(TIMED_STEPS):
            trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, i + 1))
        _ = np.asarray(loss)
        elapsed = (time.perf_counter() - t0) / TIMED_STEPS

    remat_factor = {"full": 1.0, "block_skip": 1.0, "ops": 0.0, "ops_attn": 0.4, "ops_narrow": 0.15, None: 0.0}[checkpoint]
    tflops = flops_fn(remat_factor) / elapsed / 1e12
    _emit(family, shards, checkpoint, 1.0 / elapsed, tflops, mem_gb, ref_floor, bench_conditions)


def _emit(family, shards, checkpoint, steps_per_sec, tflops, mem_gb, ref_floor, conditions="49x512x768"):
    print(json.dumps({
        "metric": f"train_step_{family}_lora_{conditions}_fp8"
                  + (f"_fsdp{shards}" if shards > 1 else ""),
        "value": round(steps_per_sec, 5) if steps_per_sec else None,
        "unit": "steps/sec",
        "seconds_per_step": round(1.0 / steps_per_sec, 3) if steps_per_sec else None,
        "model_tflops_per_sec": round(tflops, 2) if tflops else None,
        "mfu_vs_v5e_peak": round(tflops * 1e12 / V5E_PEAK_FLOPS, 4) if tflops else None,
        "peak_hbm_gb_per_device": mem_gb,
        "reference_floor_gb": ref_floor,
        "dp_shards": shards,
        "remat": checkpoint or "none",
    }))


if __name__ == "__main__":
    main()
