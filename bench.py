"""Benchmark: LoRA training-step throughput on the flagship (LTX-Video-class) config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Conditions mirror BASELINE.md's north-star: 49f x 512 x 768 video -> LTX-class
latents (128ch, 7x16x24 = 2688 tokens), LoRA rank 128, bf16 compute, gradient
checkpointing, full train step (fwd + bwd + AdamW update on LoRA params).

vs_baseline divides our steps/sec by an assumed H100 reference of 0.35 s/step for
the same workload (the reference repo publishes no throughput numbers —
BASELINE.md documents only memory floors). NOTE: the benchmark chip in this
environment sustains a small fraction of v5e peak (see
.claude/skills/verify/SKILL.md), so treat vs_baseline as environment-bound.
"""

from __future__ import annotations

import json
import time


H100_BASELINE_STEP_SECONDS = 0.35
TIMED_STEPS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from finetrainers_tpu.functional.diffusion import flow_match_target, flow_match_xt
    from finetrainers_tpu.lora import lora_mask, merge_params, split_params
    from finetrainers_tpu.models.dummy import DummyTransformer
    from finetrainers_tpu.schedulers import FlowMatchEulerScheduler

    module = DummyTransformer(
        in_channels=128, dim=2048, num_heads=32, num_layers=28, caption_dim=4096,
        patch_size=(1, 1, 1), lora_rank=128, lora_alpha=128, dtype=jnp.bfloat16,
        use_scan=True, remat=True,  # grad checkpointing per bench conditions
    )
    latents = jnp.zeros((1, 128, 7, 16, 24), jnp.bfloat16)  # 49f x 512 x 768 thru VAE
    context = jnp.zeros((1, 128, 4096), jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    # eval_shape + device-side zeros: no flax-init compile, no host RNG, no 6GB
    # host->device transfer. TPU matmul timing is data-independent, so zeros
    # measure identical throughput. Frozen weights stored bf16 (training config).
    shapes = jax.eval_shape(
        lambda r: module.init(r, latents, context, jnp.zeros((1,)))["params"], rng
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.ndim >= 2 else s.dtype), shapes
    )
    mask = lora_mask(params)
    trainable, frozen = split_params(params, mask)

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    opt_state = jax.jit(optimizer.init)(trainable)
    scheduler = FlowMatchEulerScheduler()

    def forward(p, noisy, sigmas):
        return module.apply({"params": p}, noisy, context, sigmas * 1000.0)

    def train_step(trainable, opt_state, rng):
        sigmas = scheduler.training_sigmas(rng, latents.shape[0])

        def loss_fn(trainable):
            p = merge_params(trainable, frozen)
            noise = jax.random.normal(jax.random.fold_in(rng, 1), latents.shape, jnp.float32)
            s = sigmas.reshape(sigmas.shape + (1,) * (latents.ndim - 1))
            noisy = flow_match_xt(latents.astype(jnp.float32), noise, s).astype(jnp.bfloat16)
            pred = forward(p, noisy, sigmas)
            target = flow_match_target(noise, latents.astype(jnp.float32))
            return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    # Warm up (compile), then time TIMED_STEPS sequential steps. Per-call dispatch
    # overhead (~40ms on the tunnel) is negligible against full-model step time.
    trainable, opt_state, loss = step(trainable, opt_state, rng)
    _ = np.asarray(loss)
    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        trainable, opt_state, loss = step(trainable, opt_state, jax.random.fold_in(rng, i + 1))
    _ = np.asarray(loss)
    elapsed = (time.perf_counter() - t0) / TIMED_STEPS

    steps_per_sec = 1.0 / elapsed
    vs_baseline = steps_per_sec * H100_BASELINE_STEP_SECONDS
    print(json.dumps({
        "metric": "train_step_throughput_ltx_class_lora_49x512x768",
        "value": round(steps_per_sec, 5),
        "unit": "steps/sec/chip",
        "vs_baseline": round(vs_baseline, 5),
    }))


if __name__ == "__main__":
    main()
