"""Wan control specification: channel-concat control conditioning.

Capability parity with reference `finetrainers/models/wan/control_specification.py`:
control video VAE-encoded, frame-conditioned, concatenated along channels before
the transformer (fwd :243-309); injection layer = the patch embedding
(`control_injection_layer_name` :79); qk-norm identifiers (:436).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...functional.diffusion import flow_match_target, flow_match_xt
from ...schedulers import FlowMatchEulerScheduler
from ...trainer.control_trainer.data import apply_frame_conditioning_on_latents_jax
from ..autoencoders import encode_media, sample_from_moments
from ..modeling_utils import ControlModelSpecification, ModelHandle
from .base_specification import WanModelSpecification
from .transformer import WanTransformer3DModel


class WanControlModelSpecification(ControlModelSpecification, WanModelSpecification):
    def __init__(self, *args, frame_conditioning_type: str = "full",
                 frame_conditioning_index: int = 0,
                 frame_conditioning_concatenate_mask: bool = False, **kwargs) -> None:
        WanModelSpecification.__init__(self, *args, **kwargs)
        self.frame_conditioning_type = frame_conditioning_type
        self.frame_conditioning_index = frame_conditioning_index
        self.frame_conditioning_concatenate_mask = frame_conditioning_concatenate_mask

    @property
    def control_injection_layer_name(self) -> str:
        return "patch_embedding"

    @property
    def _original_control_layer_in_features(self) -> int:
        cfg = self.transformer_config
        pt, ph, pw = cfg["patch_size"]
        return cfg["in_channels"] * pt * ph * pw

    @property
    def _original_control_layer_out_features(self) -> int:
        return self.transformer_config["num_attention_heads"] * self.transformer_config["attention_head_dim"]

    @property
    def _qk_norm_identifiers(self) -> List[str]:
        return [r"attn1\.norm_q", r"attn1\.norm_k", r"attn2\.norm_q", r"attn2\.norm_k"]

    def load_diffusion_models(self, new_in_features: Optional[int] = None) -> Dict[str, Any]:
        cfg = dict(self.transformer_config)
        if new_in_features is not None:
            cfg["in_channels"] = new_in_features
            self.transformer_config = cfg
        module = WanTransformer3DModel(
            **cfg, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.transformer_dtype,
            **self._transformer_runtime_kwargs(),
        )
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["in_channels"], 1, 4, 4)),
            jnp.zeros((1, 8, cfg["text_dim"])),
            jnp.zeros((1,)),
        )["params"]
        return {
            "transformer": ModelHandle(module, params, cfg),
            "scheduler": FlowMatchEulerScheduler(shift=3.0),
        }

    # ------------------------------------------------------------- data prep
    def prepare_latents(self, vae: ModelHandle, image=None, video=None,
                        control_image=None, control_video=None,
                        compute_posterior: bool = False, **kwargs) -> Dict[str, Any]:
        out = WanModelSpecification.prepare_latents(
            self, vae, image=image, video=video, compute_posterior=compute_posterior, **kwargs
        )
        if control_video is None and control_image is not None:
            control_video = np.asarray(control_image)[None]
        if control_video is not None:
            x = np.asarray(control_video, np.float32)[None].transpose(0, 2, 1, 3, 4)
            out["control_latents"] = np.asarray(
                encode_media(vae, x)
            )
        return out

    # ---------------------------------------------------------------- training
    def forward(
        self,
        transformer: ModelHandle,
        condition_model_conditions: Dict[str, jax.Array],
        latent_model_conditions: Dict[str, jax.Array],
        sigmas: jax.Array,
        rng: jax.Array,
        compute_posterior: bool = False,
        **kwargs,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        rng_post, rng_noise, rng_ctrl, rng_fc = jax.random.split(rng, 4)
        mean = latent_model_conditions["latents_mean"]
        std = latent_model_conditions["latents_std"]
        moments = self._normalize_moments(latent_model_conditions["latents"], mean, std)
        latents = sample_from_moments(moments, rng_post)

        control_moments = self._normalize_moments(latent_model_conditions["control_latents"], mean, std)
        control_latents, _ = jnp.split(control_moments, 2, axis=1)  # posterior mode
        control_latents = apply_frame_conditioning_on_latents_jax(
            control_latents, rng_fc, frame_dim=2, channel_dim=1,
            frame_conditioning_type=self.frame_conditioning_type,
            frame_conditioning_index=self.frame_conditioning_index,
            concatenate_mask=self.frame_conditioning_concatenate_mask,
        )

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)
        model_in = jnp.concatenate([noisy, control_latents], axis=1)

        pred = transformer.module.apply(
            {"params": transformer.params},
            model_in.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            sigmas * 1000.0,
            encoder_attention_mask=condition_model_conditions.get("encoder_attention_mask"),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # ------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, control_image=None, control_video=None,
                   height: int = 480, width: int = 832, num_frames: int = 81,
                   num_inference_steps: int = 50, **kwargs) -> list:
        """Control-conditioned sampling: the pipeline channel-concats the VAE
        posterior mode of the (frame-conditioned) control video each denoise
        step (reference control inference via control_channel_concat hook,
        patches/dependencies/diffusers/control.py:12-36)."""
        from ...data._artifact import VideoArtifact

        video = pipeline(prompt=prompt, control_image=control_image,
                         control_video=control_video, height=height, width=width,
                         num_frames=num_frames, num_inference_steps=num_inference_steps)
        return [VideoArtifact(value=video)]
