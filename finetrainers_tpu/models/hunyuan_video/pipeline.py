"""HunyuanVideo T2V inference pipeline (flow-match Euler, shift=7,
guidance-distilled: guidance embedding instead of CFG)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..modeling_utils import ModelHandle, instance_jit


@dataclasses.dataclass
class HunyuanVideoPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: FlowMatchEulerScheduler

    def __call__(
        self,
        prompt: str,
        height: int = 512,
        width: int = 512,
        num_frames: int = 61,
        num_inference_steps: int = 30,
        guidance_scale: float = 6.0,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        spec = self.spec
        sr = self.vae.config["spatial_compression_ratio"]
        tr = self.vae.config["temporal_compression_ratio"]
        latent_f = (num_frames - 1) // tr + 1
        latent_h, latent_w = height // sr, width // sr
        latent_ch = self.vae.config["latent_channels"]

        conds = spec.prepare_conditions(caption=prompt, text_encoder=self.text_encoder)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        mask = jnp.asarray(conds["encoder_attention_mask"])
        pooled = jnp.asarray(conds["pooled_projections"])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_ch, latent_f, latent_h, latent_w), jnp.float32)
        sigmas = self.scheduler.inference_sigmas(num_inference_steps)

        def make_step(module=self.transformer.module,
                      dtype=spec.transformer_dtype):
            def denoise_step(params, latents, ehs, mask, pooled,
                             guidance_scale, sigma):
                timestep = jnp.full((1,), sigma * 1000.0, jnp.float32)
                pred = module.apply(
                    {"params": params},
                    latents.astype(dtype), ehs, timestep, pooled,
                    encoder_attention_mask=mask,
                    guidance=jnp.full((1,), guidance_scale * 1000.0, jnp.float32),
                )
                return pred
            return denoise_step

        denoise_step = instance_jit(self, ("denoise",), make_step)
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred = denoise_step(
                self.transformer.params, latents, ehs, mask, pooled,
                guidance_scale, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, latents)

        latents = latents / self.vae.config.get("scaling_factor", 1.0)
        video = self.vae.apply(latents, method=type(self.vae.module).decode)
        video = np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))
        return (video[0].transpose(1, 2, 3, 0) * 255).astype(np.uint8)
