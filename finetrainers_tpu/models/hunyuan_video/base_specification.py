"""HunyuanVideo model specification.

Capability parity with reference `finetrainers/models/hunyuan_video/
base_specification.py`: Llama (templated prompt) + CLIP pooled conditioning,
flow matching, guidance-distilled (passes `guidance`, reference fwd :294).
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
from ..autoencoders import HUNYUAN_VAE_CONFIG, AutoencoderConfig, AutoencoderKL3D, encode_media, sample_from_moments
from ..modeling_utils import ModelHandle, ModelSpecification
from ...processors import CaptionTextDropoutProcessor, CLIPPooledProcessor, HashEncoder, LlamaProcessor
from .transformer import HunyuanVideoTransformer3DModel


logger = get_logger(__name__)

HUNYUAN_VIDEO_CONFIG = dict(
    in_channels=16, out_channels=16, patch_size=2, patch_size_t=1,
    num_attention_heads=24, attention_head_dim=128, num_layers=20, num_single_layers=40,
    num_refiner_layers=2, text_embed_dim=4096, pooled_projection_dim=768, guidance_embeds=True,
)


class HunyuanVideoModelSpecification(ModelSpecification):
    transformer_class_name = "HunyuanVideoTransformer3DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import hunyuan_key_map

        return hunyuan_key_map(flax_key)

    def __init__(
        self,
        pretrained_model_name_or_path: str = "hunyuanvideo-community/HunyuanVideo",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**HUNYUAN_VIDEO_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or HUNYUAN_VAE_CONFIG
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            LlamaProcessor(["encoder_hidden_states", "encoder_attention_mask"]),
            CLIPPooledProcessor(["pooled_projections"], input_names={"text_encoder_2": "text_encoder"}),
        ]

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        from ..text_encoders import FlaxCLIPTextHandle, FlaxLlamaHandle

        def _fallback():
            encoder = HashEncoder(
                hidden_size=self.transformer_config["text_embed_dim"], max_length=256,
                pooled_dim=self.transformer_config["pooled_projection_dim"],
            )
            encoder.supports_template_crop = False
            return encoder

        text_encoder = self._load_text_tower(
            FlaxLlamaHandle, self.text_encoder_id, "text_encoder", _fallback,
            tokenizer_id=self.tokenizer_id,
        )
        text_encoder_2 = self._load_text_tower(
            FlaxCLIPTextHandle, self.text_encoder_2_id, "text_encoder_2", _fallback,
            tokenizer_id=self.tokenizer_2_id,
        )
        return {
            "tokenizer": getattr(text_encoder, "tokenizer", None),
            "tokenizer_2": getattr(text_encoder_2, "tokenizer", None),
            "text_encoder": text_encoder,
            "text_encoder_2": text_encoder_2,
        }

    def load_latent_models(self) -> Dict[str, Any]:
        # Faithful AutoencoderKLHunyuanVideo with real weights (reference
        # hunyuan_video/base_specification.py prepare_latents).
        from .vae import AutoencoderKLHunyuanVideo, HunyuanVAEConfig, load_hunyuan_vae_params

        handle = self._load_video_vae(
            AutoencoderKLHunyuanVideo, HunyuanVAEConfig, load_hunyuan_vae_params,
            default_scaling=0.476986,
        )
        if handle is not None:
            return {"vae": handle}
        module = AutoencoderKL3D(self.vae_autoencoder_config, dtype=self.vae_dtype)
        ratio = self.vae_autoencoder_config.spatial_compression_ratio
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32))["params"]
        config = {
            "latent_channels": self.vae_autoencoder_config.latent_channels,
            "spatial_compression_ratio": ratio,
            "temporal_compression_ratio": self.vae_autoencoder_config.temporal_compression_ratio,
            "scaling_factor": 0.476986,
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = HunyuanVideoTransformer3DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["in_channels"], 1, 2 * cfg["patch_size"], 2 * cfg["patch_size"])),
            jnp.zeros((1, 8, cfg["text_embed_dim"])),
            jnp.zeros((1,)),
            jnp.zeros((1, cfg["pooled_projection_dim"])),
        )["params"]
        from .weights import load_hunyuan_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_hunyuan_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(shift=7.0),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import HunyuanVideoPipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        return HunyuanVideoPipeline(spec=self, transformer=transformer, vae=vae,
                                    text_encoder=text_encoder,
                                    scheduler=load_scheduler(self.pretrained_model_name_or_path,
                                                             default=FlowMatchEulerScheduler(shift=7.0)))

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, text_encoder_2=None,
                           max_sequence_length: int = 256, guidance: float = 1.0,
                           **kwargs) -> Dict[str, Any]:
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
        if video is None:
            video = np.asarray(image)[None]
        x = np.asarray(video, np.float32)[None].transpose(0, 2, 1, 3, 4)
        moments = np.asarray(encode_media(vae, x))
        return {"latents": moments}

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
        latents = sample_from_moments(latent_model_conditions["latents"], rng_post)
        latents = latents * 0.476986  # VAE scaling factor

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)

        pred = transformer.module.apply(
            {"params": transformer.params},
            noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            sigmas * 1000.0,
            condition_model_conditions["pooled_projections"],
            encoder_attention_mask=condition_model_conditions.get("encoder_attention_mask"),
            guidance=jnp.full((latents.shape[0],), guidance * 1000.0, jnp.float32),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, height: int = 512, width: int = 512,
                   num_frames: int = 61, num_inference_steps: int = 30, **kwargs) -> List[Any]:
        from ...data._artifact import VideoArtifact

        video = pipeline(prompt=prompt, height=height, width=width, num_frames=num_frames,
                         num_inference_steps=num_inference_steps)
        return [VideoArtifact(value=video)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        return [
            (r"(attn_to_q|attn_to_k|attn_to_v|attn_add_q_proj|attn_add_k_proj|attn_add_v_proj)\.kernel",
             PartitionSpec(None, "tp")),
            (r"(attn_to_out|attn_to_add_out)\.kernel", PartitionSpec("tp", None)),
            (r"(ff_net_0_proj|ff_context_net_0_proj|proj_mlp)\.kernel", PartitionSpec(None, "tp")),
            (r"(ff_net_2|ff_context_net_2)\.kernel", PartitionSpec("tp", None)),
        ]

    def cp_plan(self) -> Dict[str, int]:
        return {"latents": 2}

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3, 4)}
