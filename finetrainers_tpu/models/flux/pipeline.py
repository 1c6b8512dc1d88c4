"""Flux text-to-image inference pipeline (flow-match Euler with resolution-
dependent dynamic shifting)."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..modeling_utils import ModelHandle, instance_jit
from .transformer import pack_flux_latents, prepare_latent_image_ids, unpack_flux_latents


@dataclasses.dataclass
class FluxPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: FlowMatchEulerScheduler

    def __call__(
        self,
        prompt: str,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        spec = self.spec
        sr = self.vae.config["spatial_compression_ratio"]
        latent_h, latent_w = height // sr, width // sr
        latent_ch = self.vae.config["latent_channels"]

        conds = spec.prepare_conditions(caption=prompt, text_encoder=self.text_encoder)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        pooled = jnp.asarray(conds["pooled_projections"])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_ch, latent_h, latent_w), jnp.float32)
        img_ids = prepare_latent_image_ids(latent_h, latent_w)
        txt_ids = jnp.zeros((ehs.shape[1], 3))

        seq_len = (latent_h // 2) * (latent_w // 2)
        mu = _flux_shift_mu(seq_len)
        sigmas = self.scheduler.inference_sigmas(num_inference_steps, mu=mu)

        def make_step(module=self.transformer.module,
                      dtype=spec.transformer_dtype,
                      guided=spec.transformer_config["guidance_embeds"],
                      latent_h=latent_h, latent_w=latent_w):
            def denoise_step(params, latents, ehs, pooled, img_ids, txt_ids,
                             guidance_scale, sigma):
                packed = pack_flux_latents(latents)
                timestep = jnp.full((1,), sigma * 1000.0, jnp.float32)
                pred = module.apply(
                    {"params": params},
                    packed.astype(dtype), ehs, pooled, timestep, img_ids, txt_ids,
                    guidance=jnp.full((1,), guidance_scale * 1000.0, jnp.float32)
                    if guided else None,
                )
                return unpack_flux_latents(pred, latent_h, latent_w)
            return denoise_step

        denoise_step = instance_jit(
            self,
            ("denoise", spec.transformer_config["guidance_embeds"], latent_h, latent_w),
            make_step,
        )
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred = denoise_step(
                self.transformer.params, latents, ehs, pooled, img_ids, txt_ids,
                guidance_scale, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, latents)

        latents = latents / 0.3611 + 0.1159
        from ..autoencoders import decode_image_vae

        image = decode_image_vae(self.vae, latents)
        image = np.asarray(jnp.clip((image + 1.0) / 2.0, 0.0, 1.0))
        return (image[0].transpose(1, 2, 0) * 255).astype(np.uint8)  # (H, W, 3)


def _flux_shift_mu(seq_len: int, base_len: int = 256, max_len: int = 4096,
                   base_shift: float = 0.5, max_shift: float = 1.15) -> float:
    m = (max_shift - base_shift) / (max_len - base_len)
    b = base_shift - m * base_len
    return m * seq_len + b
