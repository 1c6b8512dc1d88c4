"""CogView4 text-to-image inference pipeline (flow-match Euler)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers import FlowMatchEulerScheduler
from ..modeling_utils import ModelHandle, instance_jit


@dataclasses.dataclass
class CogView4Pipeline:
    spec: Any
    transformer: ModelHandle
    vae: ModelHandle
    text_encoder: Any
    scheduler: FlowMatchEulerScheduler

    def __call__(
        self,
        prompt: str,
        negative_prompt: Optional[str] = None,
        control_image: Optional[np.ndarray] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        spec = self.spec
        sr = self.vae.config["spatial_compression_ratio"]
        latent_h, latent_w = height // sr, width // sr
        latent_ch = self.vae.config["latent_channels"]

        # Channel-concat control conditioning (control-trained checkpoints only:
        # the transformer's patch embed must have been widened to 2x channels).
        # Mirrors the training path: VAE posterior mode of the control image
        # (control_specification.py forward).
        control_latents = None
        if control_image is not None:
            from ...functional.image import resize_crop_image
            from ..autoencoders import encode_media

            img = np.asarray(control_image)
            if img.dtype == np.uint8:
                img = np.moveaxis(img.astype(np.float32) / 127.5 - 1.0, -1, 0)
            img = resize_crop_image(img, (height, width))
            moments = encode_media(self.vae, jnp.asarray(img)[None, :, None])[:, :, 0]
            control_latents = jnp.split(moments, 2, axis=1)[0].astype(jnp.float32)

        conds = spec.prepare_conditions(caption=prompt, text_encoder=self.text_encoder)
        ehs = jnp.asarray(conds["encoder_hidden_states"])
        do_cfg = guidance_scale > 1.0
        if do_cfg:
            neg = spec.prepare_conditions(caption=negative_prompt or "", text_encoder=self.text_encoder)
            ehs = jnp.concatenate([jnp.asarray(neg["encoder_hidden_states"]), ehs])

        rng = jax.random.PRNGKey(seed)
        latents = jax.random.normal(rng, (1, latent_ch, latent_h, latent_w), jnp.float32)
        sizes = jnp.asarray([[height, width]], jnp.float32)
        crops = jnp.zeros((1, 2), jnp.float32)
        if do_cfg:
            sizes_in = jnp.concatenate([sizes, sizes])
            crops_in = jnp.concatenate([crops, crops])
        else:
            sizes_in, crops_in = sizes, crops

        sigmas = self.scheduler.inference_sigmas(num_inference_steps)

        def make_step(module=self.transformer.module,
                      dtype=spec.transformer_dtype, do_cfg=do_cfg,
                      has_control=control_latents is not None):
            def denoise_step(params, latents, ehs, sizes_in, crops_in,
                             control_latents, guidance_scale, sigma):
                model_in = jnp.concatenate([latents] * 2) if do_cfg else latents
                if has_control:
                    ctrl = jnp.concatenate([control_latents] * 2) if do_cfg else control_latents
                    model_in = jnp.concatenate([model_in, ctrl], axis=1)
                timestep = jnp.full((model_in.shape[0],), sigma * 1000.0, jnp.float32)
                pred = module.apply(
                    {"params": params},
                    model_in.astype(dtype), ehs, timestep,
                    original_size=sizes_in, target_size=sizes_in, crop_coords=crops_in,
                )
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2)
                    pred = uncond + guidance_scale * (cond - uncond)
                return pred
            return denoise_step

        denoise_step = instance_jit(
            self, ("denoise", do_cfg, control_latents is not None), make_step
        )
        sampler = self.scheduler.make_sampler(sigmas)
        for i in range(num_inference_steps):
            pred = denoise_step(
                self.transformer.params, latents, ehs, sizes_in, crops_in,
                control_latents, guidance_scale, float(sigmas[i]),
            )
            latents = sampler.update(pred, i, latents)

        from ..autoencoders import decode_image_vae

        image = decode_image_vae(self.vae, latents)
        image = np.asarray(jnp.clip((image + 1.0) / 2.0, 0.0, 1.0))
        return (image[0].transpose(1, 2, 0) * 255).astype(np.uint8)
