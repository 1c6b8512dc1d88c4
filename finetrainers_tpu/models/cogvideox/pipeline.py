"""CogVideoX T2V inference pipeline (DDIM)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import CogVideoXDDIMScheduler
from ..modeling_utils import ModelHandle, instance_jit


@dataclasses.dataclass
class CogVideoXPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: CogVideoXDDIMScheduler

    def __call__(
        self,
        prompt: str,
        negative_prompt: Optional[str] = None,
        height: int = 480,
        width: int = 720,
        num_frames: int = 49,
        num_inference_steps: int = 50,
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
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = spec.prepare_conditions(caption=negative_prompt or "", text_encoder=self.text_encoder)
            ehs = jnp.concatenate([jnp.asarray(neg["encoder_hidden_states"]), ehs])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_f, latent_ch, latent_h, latent_w), jnp.float32)

        N = self.scheduler.num_train_timesteps
        timesteps = np.linspace(N - 1, 0, num_inference_steps).round().astype(np.int64)
        alphas = np.asarray(self.scheduler.alphas_cumprod)

        def make_step(module=self.transformer.module, dtype=spec.transformer_dtype,
                      do_cfg=do_cfg):
            def denoise_step(params, latents, ehs, guidance_scale, t, a_t, a_prev):
                model_in = jnp.concatenate([latents] * 2) if do_cfg else latents
                tt = jnp.full((model_in.shape[0],), t, jnp.float32)
                v = module.apply(
                    {"params": params}, model_in.astype(dtype), ehs, tt,
                )
                if do_cfg:
                    uncond, cond = jnp.split(v, 2)
                    v = uncond + guidance_scale * (cond - uncond)
                # x0 = sqrt(a)x_t - sqrt(1-a)v ; eps = sqrt(a)v + sqrt(1-a)x_t
                x0 = jnp.sqrt(a_t) * latents - jnp.sqrt(1 - a_t) * v
                eps = jnp.sqrt(a_t) * v + jnp.sqrt(1 - a_t) * latents
                return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps
            return denoise_step

        denoise_step = instance_jit(self, ("denoise", do_cfg), make_step)
        for i, t in enumerate(timesteps):
            a_t = float(alphas[t])
            a_prev = float(alphas[timesteps[i + 1]]) if i + 1 < len(timesteps) else 1.0
            latents = denoise_step(
                self.transformer.params, latents, ehs, guidance_scale,
                float(t), a_t, a_prev,
            )

        latents = latents / spec.vae_scaling_factor
        # frames-first -> channels-first for the VAE
        latents = jnp.swapaxes(latents, 1, 2)
        video = self.vae.apply(latents, method=type(self.vae.module).decode)
        video = np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))
        return (video[0].transpose(1, 2, 3, 0) * 255).astype(np.uint8)
