"""Wan T2V/I2V inference pipeline (checkpoint scheduler; Wan 2.1 ships UniPC,
falls back to flow-match Euler shift=3)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..modeling_utils import ModelHandle, instance_jit


@dataclasses.dataclass
class WanPipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: FlowMatchEulerScheduler
    image_encoder: Any = None

    def __call__(
        self,
        prompt: str,
        negative_prompt: Optional[str] = None,
        image: Optional[np.ndarray] = None,
        control_image: Optional[np.ndarray] = None,
        control_video: Optional[np.ndarray] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        spec = self.spec
        sr = self.vae.config["spatial_compression_ratio"]
        tr = self.vae.config["temporal_compression_ratio"]
        latent_f = (num_frames - 1) // tr + 1
        latent_h, latent_w = height // sr, width // sr
        latent_ch = self.vae.config["latent_channels"]

        conds = spec.prepare_conditions(caption=prompt, text_encoder=self.text_encoder,
                                        image=image, image_encoder=self.image_encoder)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        mask = jnp.asarray(conds["encoder_attention_mask"])
        img_embeds = conds.get("encoder_hidden_states_image")
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = spec.prepare_conditions(caption=negative_prompt or "", text_encoder=self.text_encoder)
            ehs = jnp.concatenate([jnp.asarray(neg["encoder_hidden_states"]), ehs])
            mask = jnp.concatenate([jnp.asarray(neg["encoder_attention_mask"]), mask])
            if img_embeds is not None:
                img_embeds = np.concatenate([img_embeds, img_embeds])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_ch, latent_f, latent_h, latent_w), jnp.float32)

        cond_channels = None
        if spec.is_i2v and image is not None:
            img = np.asarray(image, np.float32)
            if img.ndim == 3 and img.shape[-1] == 3:
                img = np.moveaxis(img / 127.5 - 1.0, -1, 0)
            frames = np.zeros((1, 3, num_frames, height, width), np.float32)
            frames[:, :, 0] = img
            moments = np.asarray(self.vae.apply(jnp.asarray(frames), method=type(self.vae.module).encode))
            cond_latents = np.split(moments, 2, axis=1)[0]
            m = np.zeros((1, tr, latent_f, latent_h, latent_w), np.float32)
            m[:, :, 0] = 1.0
            cond_channels = jnp.asarray(np.concatenate([m, cond_latents], axis=1))

        # Channel-concat control conditioning (control-trained checkpoints: the
        # patch embed was widened to 2x/3x channels). Mirrors the training path:
        # normalized VAE posterior mode + frame conditioning
        # (control_specification.py forward).
        control_channels = None
        if control_video is None and control_image is not None:
            control_video = np.asarray(control_image)[None]
        if control_video is not None:
            from ...functional.video import resize_crop_video
            from ...trainer.control_trainer.data import apply_frame_conditioning_on_latents_jax
            from ..autoencoders import encode_media

            vid = np.asarray(control_video)
            if vid.dtype == np.uint8:
                vid = np.moveaxis(vid.astype(np.float32) / 127.5 - 1.0, -1, 1)
            vid = resize_crop_video(vid, (height, width))
            frames = np.zeros((3, num_frames, height, width), np.float32)
            n = min(num_frames, vid.shape[0])
            frames[:, :n] = vid[:n].transpose(1, 0, 2, 3)
            moments = encode_media(self.vae, jnp.asarray(frames)[None])
            moments = spec._normalize_moments(
                moments,
                jnp.asarray(self.vae.config["latents_mean"], jnp.float32),
                jnp.asarray(self.vae.config["latents_std"], jnp.float32),
            )
            ctrl = jnp.split(moments, 2, axis=1)[0]
            control_channels = apply_frame_conditioning_on_latents_jax(
                ctrl, jax.random.PRNGKey(seed), frame_dim=2, channel_dim=1,
                frame_conditioning_type=getattr(spec, "frame_conditioning_type", "full"),
                frame_conditioning_index=getattr(spec, "frame_conditioning_index", 0),
                concatenate_mask=getattr(spec, "frame_conditioning_concatenate_mask", False),
            )

        sigmas = self.scheduler.inference_sigmas(num_inference_steps)
        img_embeds = jnp.asarray(img_embeds) if img_embeds is not None else None

        def make_step(module=self.transformer.module,
                      dtype=spec.transformer_dtype, do_cfg=do_cfg,
                      has_cond=cond_channels is not None,
                      has_control=control_channels is not None,
                      has_img=img_embeds is not None):
            def denoise_step(params, latents, ehs, mask, img_embeds, cond_channels,
                             control_channels, guidance_scale, sigma):
                model_in = latents
                if has_cond:
                    model_in = jnp.concatenate([latents, cond_channels], axis=1)
                if has_control:
                    model_in = jnp.concatenate([model_in, control_channels], axis=1)
                model_in = jnp.concatenate([model_in] * 2) if do_cfg else model_in
                timestep = jnp.full((model_in.shape[0],), sigma * 1000.0, jnp.float32)
                pred = module.apply(
                    {"params": params},
                    model_in.astype(dtype), ehs, timestep,
                    encoder_hidden_states_image=img_embeds if has_img else None,
                    encoder_attention_mask=mask,
                )
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2)
                    pred = uncond + guidance_scale * (cond - uncond)
                return pred
            return denoise_step

        denoise_step = instance_jit(
            self,
            ("denoise", do_cfg, cond_channels is not None,
             control_channels is not None, img_embeds is not None),
            make_step,
        )
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred = denoise_step(
                self.transformer.params, latents, ehs, mask, img_embeds,
                cond_channels, control_channels, guidance_scale, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, latents)

        mean = jnp.asarray(self.vae.config["latents_mean"]).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(self.vae.config["latents_std"]).reshape(1, -1, 1, 1, 1)
        latents = latents * std + mean
        video = self.vae.apply(latents, method=type(self.vae.module).decode)
        video = np.asarray(jnp.clip((video + 1.0) / 2.0, 0.0, 1.0))
        return (video[0].transpose(1, 2, 3, 0) * 255).astype(np.uint8)
