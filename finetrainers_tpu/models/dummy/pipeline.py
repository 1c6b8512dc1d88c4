"""Dummy inference pipeline: Euler flow-match denoise loop + VAE decode.

The template for the real per-model validation pipelines (reference uses diffusers
pipelines at `trainer/sft_trainer/trainer.py:631-634`)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..modeling_utils import ModelHandle, instance_jit


@dataclasses.dataclass
class DummyPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    scheduler: FlowMatchEulerScheduler

    def __call__(
        self,
        prompt: str,
        height: int = 32,
        width: int = 32,
        num_frames: int = 1,
        num_inference_steps: int = 4,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        r = self.vae.config.get("spatial_compression_ratio", 8)
        latent_ch = self.vae.config.get("latent_channels", 4)
        shape = (1, latent_ch, num_frames, height // r, width // r)
        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, shape, dtype=jnp.float32)

        conds = self.spec.prepare_conditions(caption=prompt)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        kv_lens = jnp.asarray(conds.get("encoder_kv_lens")) if conds.get("encoder_kv_lens") is not None else None

        sigmas = self.scheduler.inference_sigmas(num_inference_steps)

        def make_step(module=self.transformer.module):
            def denoise_step(params, latents, ehs, kv_lens, sigma):
                timestep = jnp.full((1,), sigma * 1000.0, jnp.float32)
                return module.apply({"params": params}, latents, ehs, timestep, encoder_kv_lens=kv_lens)
            return denoise_step

        denoise_step = instance_jit(self, ("denoise", kv_lens is None), make_step)
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred = denoise_step(
                self.transformer.params, latents, ehs, kv_lens, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, latents)

        video = self.vae.apply(latents, method=type(self.vae.module).decode)
        video = np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))
        # (1, 3, F, H, W) -> (F, H, W, 3) uint8
        return (video[0].transpose(1, 2, 3, 0) * 255).astype(np.uint8)
