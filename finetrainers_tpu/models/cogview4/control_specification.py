"""CogView4 control specification: channel-concat control conditioning for images.

Capability parity with reference `finetrainers/models/cogview4/control_specification.py`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...functional.diffusion import flow_match_target, flow_match_xt
from ...schedulers import FlowMatchEulerScheduler
from ..autoencoders import encode_media, sample_from_moments
from ..modeling_utils import ControlModelSpecification, ModelHandle
from .base_specification import CogView4ModelSpecification
from .transformer import CogView4Transformer2DModel


class CogView4ControlModelSpecification(ControlModelSpecification, CogView4ModelSpecification):
    def __init__(self, *args, **kwargs) -> None:
        CogView4ModelSpecification.__init__(self, *args, **kwargs)

    @property
    def control_injection_layer_name(self) -> str:
        return "patch_embed_proj"

    @property
    def _original_control_layer_in_features(self) -> int:
        cfg = self.transformer_config
        return cfg["in_channels"] * cfg["patch_size"] ** 2

    @property
    def _original_control_layer_out_features(self) -> int:
        return self.transformer_config["num_attention_heads"] * self.transformer_config["attention_head_dim"]

    @property
    def _qk_norm_identifiers(self) -> List[str]:
        return [r"attn1_norm_q", r"attn1_norm_k"]

    def load_diffusion_models(self, new_in_features: Optional[int] = None) -> Dict[str, Any]:
        cfg = dict(self.transformer_config)
        if new_in_features is not None:
            cfg["in_channels"] = new_in_features
            self.transformer_config = cfg
        module = CogView4Transformer2DModel(
            **cfg, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.transformer_dtype,
            **self._transformer_runtime_kwargs(),
        )
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["in_channels"], 2 * cfg["patch_size"], 2 * cfg["patch_size"])),
            jnp.zeros((1, 8, cfg["text_embed_dim"])),
            jnp.zeros((1,)),
        )["params"]
        return {
            "transformer": ModelHandle(module, params, cfg),
            "scheduler": FlowMatchEulerScheduler(),
        }

    # ------------------------------------------------------------- data prep
    def prepare_latents(self, vae: ModelHandle, image=None, video=None,
                        control_image=None, control_video=None,
                        compute_posterior: bool = False, **kwargs) -> Dict[str, Any]:
        out = CogView4ModelSpecification.prepare_latents(
            self, vae, image=image, video=video, compute_posterior=compute_posterior, **kwargs
        )
        if control_image is None and control_video is not None:
            control_image = np.asarray(control_video)[0]
        if control_image is not None:
            x = np.asarray(control_image, np.float32)[None, :, None]
            out["control_latents"] = np.asarray(
                encode_media(vae, x)
            )[:, :, 0]
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
        rng_post, rng_noise, rng_ctrl = jax.random.split(rng, 3)
        moments = latent_model_conditions["latents"][:, :, None]
        latents = sample_from_moments(moments, rng_post)[:, :, 0]
        # Control conditioning uses the posterior mode (mean), not a sample.
        control_latents = jnp.split(latent_model_conditions["control_latents"], 2, axis=1)[0]

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)
        model_in = jnp.concatenate([noisy, control_latents], axis=1)

        pred = transformer.module.apply(
            {"params": transformer.params},
            model_in.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            sigmas * 1000.0,
            original_size=latent_model_conditions.get("original_size"),
            target_size=latent_model_conditions.get("target_size"),
            crop_coords=latent_model_conditions.get("crop_coords"),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # ------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, control_image=None, control_video=None,
                   height: int = 1024, width: int = 1024,
                   num_inference_steps: int = 50, **kwargs) -> list:
        """Control-conditioned sampling: the pipeline channel-concats the VAE
        posterior mode of the control image each denoise step (reference control
        inference via control_channel_concat hook,
        patches/dependencies/diffusers/control.py:12-36)."""
        import numpy as np

        from ...data._artifact import ImageArtifact

        if control_image is None and control_video is not None:
            control_image = np.asarray(control_video)[0]
        image = pipeline(prompt=prompt, control_image=control_image, height=height,
                         width=width, num_inference_steps=num_inference_steps)
        return [ImageArtifact(value=image)]
