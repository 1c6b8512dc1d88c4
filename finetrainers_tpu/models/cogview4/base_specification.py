"""CogView4 model specification (text-to-image, flow matching).

Capability parity with reference `finetrainers/models/cogview4/base_specification.py`:
GLM text conditioning, flow matching, latent processor returning original/target
size + crop coords microconditioning (:126-130).
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
from ...processors import CaptionTextDropoutProcessor, CogView4GLMProcessor, HashEncoder
from .transformer import CogView4Transformer2DModel


logger = get_logger(__name__)

COGVIEW4_TRANSFORMER_CONFIG = dict(
    in_channels=16, out_channels=16, patch_size=2, num_attention_heads=32,
    attention_head_dim=128, num_layers=28, text_embed_dim=4096, time_embed_dim=512,
)


class CogView4ModelSpecification(ModelSpecification):
    transformer_class_name = "CogView4Transformer2DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import cogview4_key_map

        return cogview4_key_map(flax_key)

    def __init__(
        self,
        pretrained_model_name_or_path: str = "THUDM/CogView4-6B",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**COGVIEW4_TRANSFORMER_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or SD_VAE_CONFIG
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            CogView4GLMProcessor(["encoder_hidden_states"]),
        ]

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        from ..text_encoders import FlaxGlmHandle

        encoder = self._load_text_tower(
            FlaxGlmHandle, self.text_encoder_id, "text_encoder",
            lambda: HashEncoder(hidden_size=self.transformer_config["text_embed_dim"], max_length=128),
            tokenizer_id=self.tokenizer_id,
        )
        return {"tokenizer": getattr(encoder, "tokenizer", None), "text_encoder": encoder}

    def load_latent_models(self) -> Dict[str, Any]:
        handle = self._load_image_vae(default_scaling=1.0)
        if handle is not None:
            return {"vae": handle}
        module = AutoencoderKL3D(self.vae_autoencoder_config, dtype=self.vae_dtype)
        ratio = self.vae_autoencoder_config.spatial_compression_ratio
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32))["params"]
        config = {
            "latent_channels": self.vae_autoencoder_config.latent_channels,
            "spatial_compression_ratio": ratio,
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = CogView4Transformer2DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["in_channels"], 2 * cfg["patch_size"], 2 * cfg["patch_size"])),
            jnp.zeros((1, 8, cfg["text_embed_dim"])),
            jnp.zeros((1,)),
        )["params"]
        from .weights import load_cogview4_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_cogview4_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import CogView4Pipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        return CogView4Pipeline(spec=self, transformer=transformer, vae=vae,
                                text_encoder=text_encoder,
                                scheduler=load_scheduler(self.pretrained_model_name_or_path,
                                                         default=FlowMatchEulerScheduler()))

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, max_sequence_length: int = 1024,
                           **kwargs) -> Dict[str, Any]:
        data = {"caption": caption, "text_encoder": text_encoder, "max_sequence_length": max_sequence_length}
        for processor in self.condition_model_processors:
            data.update(processor(**data))
        return {"encoder_hidden_states": data["encoder_hidden_states"]}

    def prepare_latents(self, vae: ModelHandle, image: Optional[np.ndarray] = None,
                        video: Optional[np.ndarray] = None, compute_posterior: bool = False,
                        **kwargs) -> Dict[str, Any]:
        if image is None:
            image = np.asarray(video)[0]
        c, h, w = np.asarray(image).shape
        from ..autoencoders import encode_image_vae

        x = np.asarray(image, np.float32)[None]
        moments = np.asarray(encode_image_vae(vae, x))
        return {
            "latents": moments,
            "original_size": np.asarray([[h, w]], np.float32),
            "target_size": np.asarray([[h, w]], np.float32),
            "crop_coords": np.asarray([[0, 0]], np.float32),
        }

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
        rng_post, rng_noise = jax.random.split(rng)
        moments = latent_model_conditions["latents"][:, :, None]
        latents = sample_from_moments(moments, rng_post)[:, :, 0]

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)

        pred = transformer.module.apply(
            {"params": transformer.params},
            noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            sigmas * 1000.0,
            original_size=latent_model_conditions.get("original_size"),
            target_size=latent_model_conditions.get("target_size"),
            crop_coords=latent_model_conditions.get("crop_coords"),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, height: int = 1024, width: int = 1024,
                   num_inference_steps: int = 50, **kwargs) -> List[Any]:
        from ...data._artifact import ImageArtifact

        image = pipeline(prompt=prompt, height=height, width=width,
                         num_inference_steps=num_inference_steps)
        return [ImageArtifact(value=image)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        return [
            (r"attn1_to_(q|k|v)\.kernel", PartitionSpec(None, "tp")),
            (r"attn1_to_out\.kernel", PartitionSpec("tp", None)),
            (r"ff_net_0_proj\.kernel", PartitionSpec(None, "tp")),
            (r"ff_net_2\.kernel", PartitionSpec("tp", None)),
        ]

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3)}
