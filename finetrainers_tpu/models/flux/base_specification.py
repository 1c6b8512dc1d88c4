"""Flux model specification (text-to-image).

Capability parity with reference `finetrainers/models/flux/base_specification.py`:
CLIP pooled + T5 dual text conditioning, flow matching over packed 2x2 latent
tokens with latent image ids (:315-342), guidance embedding for the distilled
checkpoint family.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from ...functional.diffusion import flow_match_target, flow_match_xt
from ...logging import get_logger
from ...schedulers import FlowMatchEulerScheduler, load_scheduler
from ..autoencoders import SD_VAE_CONFIG, AutoencoderConfig, AutoencoderKL3D, sample_from_moments
from ..modeling_utils import ModelHandle, ModelSpecification
from ...processors import CaptionTextDropoutProcessor, CLIPPooledProcessor, HashEncoder, T5Processor
from .transformer import (
    FluxTransformer2DModel,
    pack_flux_latents,
    prepare_latent_image_ids,
    unpack_flux_latents,
)


logger = get_logger(__name__)

FLUX_TRANSFORMER_CONFIG = dict(
    in_channels=64, num_layers=19, num_single_layers=38, num_attention_heads=24,
    attention_head_dim=128, pooled_projection_dim=768, joint_attention_dim=4096,
    guidance_embeds=True,
)


class FluxModelSpecification(ModelSpecification):
    transformer_class_name = "FluxTransformer2DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import flux_key_map

        return flux_key_map(flax_key)

    def __init__(
        self,
        pretrained_model_name_or_path: str = "black-forest-labs/FLUX.1-dev",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**FLUX_TRANSFORMER_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or SD_VAE_CONFIG
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            CLIPPooledProcessor(["pooled_projections"]),
            T5Processor(["encoder_hidden_states", "encoder_attention_mask"],
                        input_names={"text_encoder_2": "text_encoder"}),
        ]

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        # Real path: CLIP-L pooled (text_encoder) + T5-XXL (text_encoder_2);
        # offline: hash encoder with both heads.
        from ..text_encoders import FlaxCLIPTextHandle

        def _fallback():
            return HashEncoder(
                hidden_size=self.transformer_config["joint_attention_dim"], max_length=512,
                pooled_dim=self.transformer_config["pooled_projection_dim"],
            )

        text_encoder = self._load_text_tower(
            FlaxCLIPTextHandle, self.text_encoder_id, "text_encoder", _fallback,
            tokenizer_id=self.tokenizer_id,
        )
        text_encoder_2 = _fallback()
        t5_dir = self._component_dir(self.text_encoder_2_id, "text_encoder_2")
        if t5_dir is not None:
            try:
                from ...processors.text_encoders import FlaxT5Handle

                text_encoder_2 = FlaxT5Handle(t5_dir, tokenizer_id=self.tokenizer_2_id)
            except Exception as e:
                logger.warning(f"Could not load T5 from {t5_dir} ({e}); using offline hash encoder")
        return {
            "tokenizer": getattr(text_encoder, "tokenizer", None),
            "tokenizer_2": getattr(text_encoder_2, "tokenizer", None),
            "text_encoder": text_encoder,
            "text_encoder_2": text_encoder_2,
        }

    def load_latent_models(self) -> Dict[str, Any]:
        handle = self._load_image_vae(default_scaling=0.3611, default_shift=0.1159)
        if handle is not None:
            return {"vae": handle}
        module = AutoencoderKL3D(self.vae_autoencoder_config, dtype=self.vae_dtype)
        ratio = self.vae_autoencoder_config.spatial_compression_ratio
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32))["params"]
        config = {
            "latent_channels": self.vae_autoencoder_config.latent_channels,
            "spatial_compression_ratio": ratio,
            "scaling_factor": 0.3611,
            "shift_factor": 0.1159,
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = FluxTransformer2DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, cfg["in_channels"])),
            jnp.zeros((1, 8, cfg["joint_attention_dim"])),
            jnp.zeros((1, cfg["pooled_projection_dim"])),
            jnp.zeros((1,)),
            jnp.zeros((4, 3)),
            jnp.zeros((8, 3)),
        )["params"]
        from .weights import load_flux_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_flux_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(use_dynamic_shifting=True),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import FluxPipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        return FluxPipeline(spec=self, transformer=transformer, vae=vae, text_encoder=text_encoder,
                            scheduler=load_scheduler(self.pretrained_model_name_or_path,
                                                     default=FlowMatchEulerScheduler()))

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, text_encoder_2=None,
                           max_sequence_length: int = 512, **kwargs) -> Dict[str, Any]:
        data = {"caption": caption, "text_encoder": text_encoder,
                "text_encoder_2": text_encoder_2 or text_encoder,
                "max_sequence_length": max_sequence_length}
        for processor in self.condition_model_processors:
            data.update(processor(**data))
        return {
            "encoder_hidden_states": data["encoder_hidden_states"],
            "encoder_attention_mask": data["encoder_attention_mask"],
            "pooled_projections": data["pooled_projections"],
        }

    def prepare_latents(self, vae: ModelHandle, image: Optional[np.ndarray] = None,
                        video: Optional[np.ndarray] = None, compute_posterior: bool = False,
                        **kwargs) -> Dict[str, Any]:
        if image is None:
            image = np.asarray(video)[0]
        from ..autoencoders import encode_image_vae

        x = np.asarray(image, np.float32)[None]  # (1, C, H, W)
        moments = np.asarray(encode_image_vae(vae, x))
        return {"latents": moments}  # (1, 2C, H', W')

    # ---------------------------------------------------------------- training
    def forward(
        self,
        transformer: ModelHandle,
        condition_model_conditions: Dict[str, jax.Array],
        latent_model_conditions: Dict[str, jax.Array],
        sigmas: jax.Array,
        rng: jax.Array,
        compute_posterior: bool = False,
        guidance: float = 1.0,
        **kwargs,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        rng_post, rng_noise = jax.random.split(rng)
        moments = latent_model_conditions["latents"][:, :, None]  # (B, 2C, 1, H, W)
        latents = sample_from_moments(moments, rng_post)[:, :, 0]  # (B, C, H, W)
        # Flux latent scaling: z = (z - shift) * scale
        latents = (latents - 0.1159) * 0.3611

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)

        b, c, h, w = latents.shape
        packed_noisy = pack_flux_latents(noisy)
        img_ids = prepare_latent_image_ids(h, w)
        txt_ids = jnp.zeros((condition_model_conditions["encoder_hidden_states"].shape[1], 3))

        pred = transformer.module.apply(
            {"params": transformer.params},
            packed_noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            condition_model_conditions["pooled_projections"],
            sigmas * 1000.0,
            img_ids, txt_ids,
            guidance=jnp.full((b,), guidance * 1000.0, jnp.float32)
            if self.transformer_config["guidance_embeds"] else None,
        )
        pred = unpack_flux_latents(pred, h, w)
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, height: int = 1024, width: int = 1024,
                   num_inference_steps: int = 28, **kwargs) -> List[Any]:
        from ...data._artifact import ImageArtifact

        image = pipeline(prompt=prompt, height=height, width=width,
                         num_inference_steps=num_inference_steps)
        return [ImageArtifact(value=image)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        return [
            (r"(attn_to_q|attn_to_k|attn_to_v|attn_add_q_proj|attn_add_k_proj|attn_add_v_proj)\.kernel",
             PartitionSpec(None, "tp")),
            (r"(attn_to_out|attn_to_add_out)\.kernel", PartitionSpec("tp", None)),
            (r"(ff_net_0_proj|ff_context_net_0_proj|proj_mlp)\.kernel", PartitionSpec(None, "tp")),
            (r"(ff_net_2|ff_context_net_2)\.kernel", PartitionSpec("tp", None)),
        ]

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3)}
