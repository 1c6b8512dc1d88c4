"""LTX-Video T2V/I2V inference pipeline (flow-match Euler), the validation-path
analog of diffusers' LTXPipeline / LTXImageToVideoPipeline used by the reference
(`trainer/sft_trainer/trainer.py:631-634`)."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..autoencoders import sample_from_moments
from ..modeling_utils import ModelHandle, instance_jit
from .transformer import pack_latents, unpack_latents


@dataclasses.dataclass
class LTXPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: FlowMatchEulerScheduler

    def __call__(
        self,
        prompt: str,
        negative_prompt: Optional[str] = None,
        image: Optional[np.ndarray] = None,
        height: int = 512,
        width: int = 704,
        num_frames: int = 49,
        frame_rate: int = 25,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.0,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        spec = self.spec
        sr = self.vae.config.get("spatial_compression_ratio", spec.vae_spatial_compression_ratio)
        tr = self.vae.config.get("temporal_compression_ratio", spec.vae_temporal_compression_ratio)
        latent_f = (num_frames - 1) // tr + 1
        latent_h, latent_w = height // sr, width // sr
        latent_ch = self.vae.config["latent_channels"]

        conds = spec.prepare_conditions(caption=prompt, text_encoder=self.text_encoder)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        mask = jnp.asarray(conds["encoder_attention_mask"])
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = spec.prepare_conditions(caption=negative_prompt or "", text_encoder=self.text_encoder)
            ehs = jnp.concatenate([jnp.asarray(neg["encoder_hidden_states"]), ehs])
            mask = jnp.concatenate([jnp.asarray(neg["encoder_attention_mask"]), mask])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_ch, latent_f, latent_h, latent_w), jnp.float32)

        # Image conditioning: encode first frame, paste into latents at sigma-scaled noise.
        cond_latent = None
        if image is not None:
            img = np.asarray(image, np.float32)
            if img.ndim == 3 and img.shape[-1] == 3:  # HWC uint8-style
                img = np.moveaxis(img / 127.5 - 1.0, -1, 0)
            x = img[None, :, None]  # (1, C, 1, H, W)
            moments = self.vae.apply(jnp.asarray(x), method=type(self.vae.module).encode)
            cond_latent = sample_from_moments(moments, jax.random.fold_in(rng, 7))
            mean = self.vae.config["latents_mean"].reshape(1, -1, 1, 1, 1)
            std = self.vae.config["latents_std"].reshape(1, -1, 1, 1, 1)
            cond_latent = (np.asarray(cond_latent) - mean) / std

        sigmas = self.scheduler.inference_sigmas(num_inference_steps)
        latent_frame_rate = frame_rate / tr
        rope_scale = (1.0 / latent_frame_rate, float(sr), float(sr))
        cfg = spec.transformer_config
        p, pt = cfg["patch_size"], cfg["patch_size_t"]

        def make_step(module=self.transformer.module,
                      dtype=spec.transformer_dtype, do_cfg=do_cfg,
                      has_cond=cond_latent is not None,
                      p=p, pt=pt, latent_f=latent_f, latent_h=latent_h,
                      latent_w=latent_w, rope_scale=rope_scale):
            def denoise_step(params, latents, ehs, mask, cond_latent,
                             guidance_scale, sigma):
                lat_in = latents
                if has_cond:
                    first = cond_latent * (1.0 - sigma) + lat_in[:, :, :1] * sigma
                    lat_in = jnp.concatenate([first, lat_in[:, :, 1:]], axis=2)
                packed = pack_latents(lat_in, p, pt)
                model_in = jnp.concatenate([packed] * 2) if do_cfg else packed
                timesteps = jnp.full((model_in.shape[0], model_in.shape[1]), sigma * 1000.0, jnp.float32)
                pred = module.apply(
                    {"params": params},
                    model_in.astype(dtype),
                    ehs, timesteps, encoder_attention_mask=mask,
                    num_frames=latent_f, height=latent_h, width=latent_w,
                    rope_interpolation_scale=rope_scale,
                )
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2)
                    pred = uncond + guidance_scale * (cond - uncond)
                pred = unpack_latents(pred, latent_f, latent_h, latent_w, p, pt)
                # The sampler steps the *conditioned* latents (first-frame
                # pasted at sigma-scaled noise), mirroring the training target.
                return pred, lat_in
            return denoise_step

        denoise_step = instance_jit(
            self,
            ("denoise", do_cfg, cond_latent is not None,
             latent_f, latent_h, latent_w, rope_scale),
            make_step,
        )
        cond_latent_in = jnp.asarray(cond_latent) if cond_latent is not None else None
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred, lat_in = denoise_step(
                self.transformer.params, latents, ehs, mask, cond_latent_in,
                guidance_scale, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, lat_in)

        mean = jnp.asarray(self.vae.config["latents_mean"]).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(self.vae.config["latents_std"]).reshape(1, -1, 1, 1, 1)
        latents = latents * std + mean
        video = self.vae.apply(latents, method=type(self.vae.module).decode)
        video = np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))
        return (video[0].transpose(1, 2, 3, 0) * 255).astype(np.uint8)  # (F, H, W, 3)
