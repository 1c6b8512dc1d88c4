"""Benchmark: LoRA training-step throughput on the flagship LTX-Video model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (+ extra keys:
model TFLOP/s and MFU vs v5e peak).

Conditions mirror BASELINE.md's north-star: 49f x 512 x 768 video -> LTX latents
(128ch, 7x16x24 = 2688 tokens), LoRA rank 128, bf16 compute, gradient
checkpointing (per-block remat via scan), full train step through the REAL
`models/ltx_video` spec forward: VAE-moment posterior sampling, latent stats
normalization, stochastic first-frame conditioning, per-token timesteps, packed
tokens, flow-match loss, AdamW update on LoRA params.

vs_baseline divides our steps/sec by an assumed H100 reference of 0.35 s/step
for the same workload (the reference repo publishes no throughput numbers —
BASELINE.md documents only memory floors). NOTE: the benchmark chip in this
environment sustains a fraction of v5e peak (see .claude/skills/verify/SKILL.md),
so treat vs_baseline as environment-bound.
"""

from __future__ import annotations

import json
import os
import time


H100_BASELINE_STEP_SECONDS = 0.35
TIMED_STEPS = int(os.environ.get("BENCH_TIMED_STEPS", "10"))
V5E_PEAK_FLOPS = 197e12  # bf16 per chip

# Flagship latent shape: 49f x 512 x 768 through the LTX VAE (32x spatial, 8x
# temporal): (B, 128, 7, 16, 24) -> 2688 packed tokens. Moments carry 2*C.
B, C, F, H, W = 1, 128, 7, 16, 24
S = F * H * W
L_CTX = 128
LORA_RANK = 128


def ltx_train_step_flops(cfg: dict, lora_rank: int, remat_factor: float) -> float:
    """Analytic matmul FLOPs for one LoRA train step on the LTX transformer.

    fwd counted exactly (matmul terms only; elementwise/norms excluded); bwd for
    LoRA training needs dL/dx through every base matmul (~1x fwd) plus LoRA
    factor grads (counted); remat recomputes `remat_factor` of the fwd."""
    d = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    nl = cfg["num_layers"]
    cap = cfg["caption_channels"]
    cin = cfg["in_channels"]

    per_layer = 0.0
    per_layer += 4 * 2 * S * d * d            # attn1 q,k,v,out projections
    per_layer += 2 * 2 * S * S * d            # attn1 scores + weighted sum
    per_layer += 2 * 2 * S * d * d            # attn2 q,out
    per_layer += 2 * 2 * L_CTX * d * d        # attn2 k,v
    per_layer += 2 * 2 * S * L_CTX * d        # attn2 scores + out
    per_layer += 2 * 2 * S * d * 4 * d        # ff in + out
    # LoRA branches: 6 adapted matmuls/layer, two skinny factors each
    per_layer += 6 * 2 * S * (d * lora_rank + lora_rank * d)

    fwd = nl * per_layer
    # per-token timestep embedder: S tokens through 256->d, d->d, d->6d
    fwd += B * S * 2 * (256 * d + d * d + d * 6 * d)
    fwd += B * L_CTX * 2 * (cap * d + d * d)   # caption projection
    fwd += B * S * 2 * (cin * d + d * cin)     # proj_in + proj_out

    fwd *= B
    # bwd: dL/dx through all matmuls ~= 1x fwd; base dL/dW skipped (frozen);
    # LoRA dL/dW is tiny and folded into the 1x.
    return fwd * (2.0 + remat_factor)


_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_last_good.json")


def _record_last_good(payload: dict) -> None:
    try:
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump(payload, f)
    except OSError:  # pragma: no cover - read-only fs
        pass


def _load_last_good() -> dict | None:
    try:
        with open(_LAST_GOOD_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _probe_devices(probe_timeout_s: float = 120.0, total_budget_s: float = 1500.0):
    """Patient backend probe. A dead remote-TPU tunnel makes jax.devices() hang
    forever (not raise). Round 4 lost its gate number to a transient tunnel
    flap because the probe gave up after 60s x 2; MULTICHIP succeeded 7 minutes
    later. So: probe in a fresh SUBPROCESS (jax caches a failed backend init
    in-process, so retries must not share the interpreter) with exponential
    backoff for up to ~25 minutes. On final failure, still print a parseable
    JSON line carrying the last driver-captured good number.
    """
    import subprocess
    import sys
    import time as _time

    deadline = _time.monotonic() + total_budget_s
    sleep_s = 30.0
    attempt = 0
    last_err = "probe never ran"
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=probe_timeout_s,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0 and r.stdout.strip().isdigit():
                return int(r.stdout.strip())
            last_err = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["probe failed"]
            last_err = last_err[0]
        except subprocess.TimeoutExpired:
            last_err = f"probe timed out after {probe_timeout_s:.0f}s"
        remaining = deadline - _time.monotonic()
        if remaining <= 0:
            break
        wait = min(sleep_s, remaining)
        print(
            f"bench.py: device probe attempt {attempt} failed ({last_err}); "
            f"retrying in {wait:.0f}s ({remaining:.0f}s of budget left)",
            file=sys.stderr,
        )
        _time.sleep(wait)
        sleep_s = min(sleep_s * 2.0, 300.0)

    print(
        f"bench.py: device backend unavailable after {attempt} probes over "
        f"{total_budget_s:.0f}s ({last_err}); the TPU tunnel is likely down",
        file=sys.stderr,
    )
    failure = {
        "metric": "train_step_throughput_ltx_video_lora_49x512x768",
        "value": None,
        "unit": "steps/sec/chip",
        "vs_baseline": None,
        "error": "tpu_unreachable",
        "last_good": _load_last_good(),
    }
    print(json.dumps(failure))
    raise SystemExit(3)


def main() -> None:
    import jax

    _probe_devices()
    # Persistent compilation cache: the remote compile server's latency for the
    # full train step varies from ~4 min to >30 min; caching the executable
    # makes reruns (and the driver's bench invocation) start in seconds.
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from finetrainers_tpu.lora import lora_mask, merge_params, split_params
    from finetrainers_tpu.models.ltx_video import LTXVideoModelSpecification
    from finetrainers_tpu.models.modeling_utils import ModelHandle
    from finetrainers_tpu.schedulers import FlowMatchEulerScheduler

    checkpoint = os.environ.get("BENCH_REMAT", "ops")  # full | ops | block_skip | none
    checkpoint = None if checkpoint == "none" else checkpoint

    spec = LTXVideoModelSpecification(lora_rank=LORA_RANK, lora_alpha=LORA_RANK)
    spec.use_scan = True
    spec.gradient_checkpointing = checkpoint
    cfg = spec.transformer_config

    from finetrainers_tpu.models.ltx_video.transformer import LTXVideoTransformer3DModel

    module = LTXVideoTransformer3DModel(
        **cfg, lora_rank=LORA_RANK, lora_alpha=LORA_RANK, dtype=jnp.bfloat16,
        use_scan=True, gradient_checkpointing=checkpoint,
    )

    # eval_shape + device-side zeros: no flax-init compile, no host RNG, no 6GB
    # host->device transfer. TPU matmul timing is data-independent, so zeros
    # measure identical throughput. Frozen weights stored bf16 (training config).
    tokens_dim = cfg["in_channels"]
    shapes = jax.eval_shape(
        lambda r: module.init(
            r,
            jnp.zeros((B, S, tokens_dim)),
            jnp.zeros((B, L_CTX, cfg["caption_channels"])),
            jnp.zeros((B, S)),
            num_frames=F, height=H, width=W,
        )["params"],
        jax.random.PRNGKey(0),
    )
    # Split on the SHAPE tree and materialize every leaf directly in its final
    # storage dtype (a bf16-zeros-then-cast keeps both 3.8 GB copies live via
    # the pre-split tree and OOMs the chip before the step runs).
    mask = lora_mask(shapes)
    trainable_shapes, frozen_shapes = split_params(shapes, mask)
    # LoRA factors train in fp32 (reference keeps LoRA fp32 under FSDP).
    trainable = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32) if s is not None else None,
        trainable_shapes, is_leaf=lambda x: x is None,
    )
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros((1,) * s.ndim, jnp.bfloat16 if s.ndim >= 2 else s.dtype)
        if s is not None else None,
        frozen_shapes, is_leaf=lambda x: x is None,
    )
    if os.environ.get("BENCH_INT8") == "1":
        # int8 frozen-weight MXU compute path (opt-in, docs/perf.md round 5).
        # The transform adds kernel_qscale sidecar leaves, so materialize by
        # walking the template dict (qscale shape = features).
        from finetrainers_tpu.utils.int8 import apply_int8_storage, materialize_zeros_like

        frozen = materialize_zeros_like(frozen_shapes, apply_int8_storage(template))
    else:
        if os.environ.get("BENCH_FP8") == "1":
            # fp8 frozen-weight storage — the reference's own LoRA headline
            # conditions (README footnotes: FP8 weights + grad ckpt + precompute).
            # Halves frozen-weight HBM AND per-step weight DMA (read in fwd + dgrad)
            # when XLA fuses the upcast into the consuming matmuls.
            from finetrainers_tpu.utils.fp8 import apply_layerwise_storage_dtype

            template = apply_layerwise_storage_dtype(template)
        frozen = jax.tree_util.tree_map(
            lambda s, t: jnp.zeros(s.shape, t.dtype) if s is not None else None,
            frozen_shapes, template, is_leaf=lambda x: x is None,
        )
    del template

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = jax.jit(optimizer.init)(trainable)
    scheduler = FlowMatchEulerScheduler()
    handle_cfg = dict(cfg)

    conditions = {
        "encoder_hidden_states": jnp.zeros((B, L_CTX, cfg["caption_channels"]), jnp.bfloat16),
        "encoder_attention_mask": jnp.ones((B, L_CTX), jnp.int32),
    }
    latent_conditions = {
        "latents": jnp.zeros((B, 2 * C, F, H, W), jnp.float32),  # VAE moments
        "latents_mean": jnp.zeros((C,), jnp.float32),
        "latents_std": jnp.ones((C,), jnp.float32),
    }

    def one_step(trainable, opt_state, frozen, rng):
        sigmas = scheduler.training_sigmas(rng, B)

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

    # The axon tunnel pays a large fixed dispatch cost per execute call (the
    # call ships ~1k buffer handles); fusing FUSE_STEPS optimizer steps into one
    # dispatch amortizes it without changing semantics (each fused step folds
    # its index into the rng exactly like the host loop). Two modes:
    #   fori   — lax.fori_loop carry (one while loop; cheap compile, but the
    #            loop carry double-buffers and measured slower than unfused)
    #   unroll — straight-line trace of FUSE steps (params flow through SSA,
    #            XLA aliases freely; compile time scales with FUSE)
    FUSE = int(os.environ.get("BENCH_FUSE_STEPS", "1"))
    FUSE_MODE = os.environ.get("BENCH_FUSE_MODE", "unroll")

    def train_step(trainable, frozen, opt_state, rng):
        if FUSE == 1:
            return one_step(trainable, opt_state, frozen, rng)

        if FUSE_MODE == "unroll":
            loss = jnp.zeros((), jnp.float32)
            for i in range(FUSE):
                trainable, opt_state, loss = one_step(
                    trainable, opt_state, frozen, jax.random.fold_in(rng, i))
            return trainable, opt_state, loss

        def body(i, carry):
            trainable, opt_state, _ = carry
            return one_step(trainable, opt_state, frozen, jax.random.fold_in(rng, i))

        loss0 = jnp.zeros((), jnp.float32)
        return jax.lax.fori_loop(0, FUSE, body, (trainable, opt_state, loss0))

    rng = jax.random.PRNGKey(0)
    # Compile once explicitly (the compiled object is reused for the timed loop)
    # so XLA's memory assignment is available: the axon backend returns no
    # runtime memory_stats, so peak HBM is reported from the static analysis —
    # arguments + outputs - donated aliases + temps + code.
    step = jax.jit(train_step, donate_argnums=(0, 2)).lower(
        trainable, frozen, opt_state, rng
    ).compile()
    mem_gb = None
    try:
        ma = step.memory_analysis()
        mem_gb = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes) / 2**30, 2)
    except Exception:
        pass

    # Warm up, then time TIMED_STEPS sequential steps. Dispatch is async and
    # costs ~1ms/step (measured: a donated 100-buffer jit dispatches in 1.3ms
    # through the tunnel), so the loop runs back-to-back on device; only the
    # final np.asarray forces completion. The rng fold_in helper MUST be warmed
    # too: its first compile goes through the remote compile server (~0.9s) and
    # previously landed inside the timed region, reading as a phantom ~90ms/step
    # "dispatch overhead" at TIMED_STEPS=10 (xplane shows steps back-to-back).
    trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, 0))
    _ = np.asarray(loss)
    jax.block_until_ready(jax.random.fold_in(rng, 1))
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        trainable, opt_state, loss = step(trainable, frozen, opt_state, jax.random.fold_in(rng, i + 1))
    _ = np.asarray(loss)
    elapsed = (time.perf_counter() - t0) / (TIMED_STEPS * FUSE)

    steps_per_sec = 1.0 / elapsed
    vs_baseline = steps_per_sec * H100_BASELINE_STEP_SECONDS
    # Matmul-FLOP replay per policy: "ops" saves every dot, the attention
    # residuals (tagged attn_out), and norm statistics — the backward replays
    # only elementwise ops, which the analytic count excludes (~0 matmul
    # replay). ops_narrow additionally re-runs the ff1 matmul (~0.15x fwd).
    remat_factor = {"full": 1.0, "block_skip": 1.0, "ops": 0.0, "ops_attn": 0.4, "ops_narrow": 0.15, None: 0.0}[checkpoint]
    flops = ltx_train_step_flops(cfg, LORA_RANK, remat_factor)
    tflops = flops * steps_per_sec / 1e12
    # Peak HBM (BASELINE.md's memory-floor counterpart; reference README:95-109
    # publishes min-VRAM floors for the same LoRA conditions). Runtime stats
    # when the backend provides them, else XLA's static memory assignment.
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2) or mem_gb
    except Exception:
        peak_hbm_gb = mem_gb
    payload = {
        "metric": "train_step_throughput_ltx_video_lora_49x512x768",
        "value": round(steps_per_sec, 5),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs_baseline, 5),
        "model_tflops_per_sec": round(tflops, 2),
        "mfu_vs_v5e_peak": round(tflops * 1e12 / V5E_PEAK_FLOPS, 4),
        "peak_hbm_gb": peak_hbm_gb,
        "remat": checkpoint or "none",
    }
    # Only default-config runs refresh the tunnel-flap fallback cache:
    # experiment knobs measure variant configs whose numbers must not
    # masquerade as the flagship gate figure. Explicitly-disabled values
    # (BENCH_FP8=0, BENCH_REMAT=ops — the defaults) still count as default.
    def _knob_active(name, default_values=("", "0")):
        return os.environ.get(name, "") not in default_values

    non_default = (
        _knob_active("BENCH_INT8")
        or _knob_active("BENCH_FP8")
        or _knob_active("BENCH_NO_RECORD")
        or _knob_active("BENCH_FUSE_STEPS", ("", "0", "1"))
        or _knob_active("BENCH_FUSE_MODE", ("", "none"))
        or _knob_active("BENCH_REMAT", ("", "ops"))
    )
    if not non_default:
        _record_last_good(payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
