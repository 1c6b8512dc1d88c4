"""LTX-Video model specification.

Capability parity with reference `finetrainers/models/ltx_video/base_specification.py`:
T5-conditioned flow matching over packed latent tokens with per-token timesteps and
stochastic first-frame conditioning (p=0.1, min sigma 0.25 — reference :282-311),
channel-stat latent normalization (:427-437), `_pack_latents` patchification
(:438-459), TP plan (:415-504 — declarative rules here), and the T2V validation
pipeline.
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
from ..autoencoders import LTX_VAE_CONFIG, AutoencoderConfig, AutoencoderKL3D, encode_media, sample_from_moments
from ..modeling_utils import ModelHandle, ModelSpecification
from ...processors import CaptionTextDropoutProcessor, HashEncoder, T5Processor
from .transformer import LTXVideoTransformer3DModel, pack_latents, unpack_latents


logger = get_logger(__name__)

LTX_TRANSFORMER_CONFIG = dict(
    in_channels=128, out_channels=128, patch_size=1, patch_size_t=1,
    num_attention_heads=32, attention_head_dim=64, cross_attention_dim=2048,
    num_layers=28, caption_channels=4096,
)


class LTXVideoModelSpecification(ModelSpecification):
    transformer_class_name = "LTXVideoTransformer3DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import ltx_key_map

        return ltx_key_map(flax_key)

    first_frame_conditioning_p = 0.1
    min_first_frame_sigma = 0.25
    frame_rate = 25
    vae_temporal_compression_ratio = 8
    vae_spatial_compression_ratio = 32

    def __init__(
        self,
        pretrained_model_name_or_path: str = "Lightricks/LTX-Video",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**LTX_TRANSFORMER_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or LTX_VAE_CONFIG
        self.vae_spatial_compression_ratio = self.vae_autoencoder_config.spatial_compression_ratio
        self.vae_temporal_compression_ratio = self.vae_autoencoder_config.temporal_compression_ratio
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            T5Processor(["encoder_hidden_states", "encoder_attention_mask"]),
        ]

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        from ...processors.text_encoders import FlaxT5Handle

        try:
            encoder = FlaxT5Handle(
                self.text_encoder_id or self.pretrained_model_name_or_path,
                tokenizer_id=self.tokenizer_id,
            )
        except Exception as e:  # offline / missing checkpoint: degrade loudly
            logger.warning(f"Could not load T5 ({e}); using offline hash encoder")
            encoder = HashEncoder(hidden_size=self.transformer_config["caption_channels"], max_length=128)
        return {"tokenizer": getattr(encoder, "tokenizer", None), "text_encoder": encoder}

    def load_latent_models(self) -> Dict[str, Any]:
        # Faithful AutoencoderKLLTXVideo with real weights + per-channel latent
        # statistics (reference ltx_video/base_specification.py:260-280).
        from .vae import AutoencoderKLLTXVideo, LTXVAEConfig, load_ltx_vae_params

        handle = self._load_video_vae(AutoencoderKLLTXVideo, LTXVAEConfig, load_ltx_vae_params)
        if handle is not None:
            self.vae_spatial_compression_ratio = handle.config["spatial_compression_ratio"]
            self.vae_temporal_compression_ratio = handle.config["temporal_compression_ratio"]
            return {"vae": handle}
        module = AutoencoderKL3D(self.vae_autoencoder_config, dtype=self.vae_dtype)
        ratio = self.vae_autoencoder_config.spatial_compression_ratio
        t_ratio = self.vae_autoencoder_config.temporal_compression_ratio
        params = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32)
        )["params"]
        latent_ch = self.vae_autoencoder_config.latent_channels
        config = {
            "latent_channels": latent_ch,
            "spatial_compression_ratio": ratio,
            "temporal_compression_ratio": t_ratio,
            # Per-channel stats (real values come with the checkpoint; identity here).
            "latents_mean": np.zeros((latent_ch,), np.float32),
            "latents_std": np.ones((latent_ch,), np.float32),
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = LTXVideoTransformer3DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        tokens_dim = cfg["in_channels"] * cfg["patch_size"] ** 2 * cfg["patch_size_t"]
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, tokens_dim)),
            jnp.zeros((1, 16, cfg["caption_channels"])),
            jnp.zeros((1,)),
            num_frames=2, height=2, width=2,
        )["params"]
        from .weights import load_ltx_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_ltx_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import LTXPipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        return LTXPipeline(
            spec=self, transformer=transformer, vae=vae, text_encoder=text_encoder,
            scheduler=load_scheduler(self.pretrained_model_name_or_path,
                                     default=FlowMatchEulerScheduler()),
        )

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, max_sequence_length: int = 128,
                           **kwargs) -> Dict[str, Any]:
        data = {"caption": caption, "text_encoder": text_encoder, "max_sequence_length": max_sequence_length}
        for processor in self.condition_model_processors:
            data.update(processor(**data))
        return {
            "encoder_hidden_states": data["encoder_hidden_states"],
            "encoder_attention_mask": data["encoder_attention_mask"],
        }

    def prepare_latents(
        self,
        vae: ModelHandle,
        image: Optional[np.ndarray] = None,
        video: Optional[np.ndarray] = None,
        compute_posterior: bool = False,
        **kwargs,
    ) -> Dict[str, Any]:
        if video is None:
            video = np.asarray(image)[None]  # (C,H,W) -> (1,C,H,W) frames-first
        x = np.asarray(video, np.float32)[None].transpose(0, 2, 1, 3, 4)  # (1,C,F,H,W)
        moments = encode_media(vae, x)
        if compute_posterior:
            latents = sample_from_moments(moments, jax.random.PRNGKey(0))
        else:
            latents = moments
        return {
            "latents": np.asarray(latents),
            "latents_mean": vae.config["latents_mean"],
            "latents_std": vae.config["latents_std"],
        }

    def collate_latents(self, data: List[Dict[str, Any]]) -> Dict[str, Any]:
        out = super().collate_latents(data)
        # channel stats are identical across samples; keep (C,) not (B*C,)
        out["latents_mean"] = np.asarray(data[0]["latents_mean"]).reshape(-1)
        out["latents_std"] = np.asarray(data[0]["latents_std"]).reshape(-1)
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
        rng_post, rng_noise, rng_ff, rng_ffs = jax.random.split(rng, 4)
        latents = latent_model_conditions["latents"]
        if not compute_posterior:
            latents = sample_from_moments(latents, rng_post)

        mean = latent_model_conditions["latents_mean"].reshape(1, -1, 1, 1, 1)
        std = latent_model_conditions["latents_std"].reshape(1, -1, 1, 1, 1)
        latents = ((latents.astype(jnp.float32) - mean) / std)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1, 1)

        # Stochastic first-frame conditioning (reference :282-311): with p=0.1 the
        # first latent frame gets a small sigma in [0, min(sigma, 0.25)).
        use_ff = jax.random.bernoulli(rng_ff, self.first_frame_conditioning_p)
        ff_sigma = jax.random.uniform(rng_ffs, sigmas.shape) * sigmas
        ff_sigma = jnp.minimum(ff_sigma, self.min_first_frame_sigma)
        first_frame_sigma = jnp.where(use_ff, ff_sigma.reshape(-1, 1, 1, 1, 1), sigmas_e)
        frame_idx = jnp.arange(latents.shape[2]).reshape(1, 1, -1, 1, 1)
        sigma_map = jnp.where(frame_idx == 0, first_frame_sigma, sigmas_e)

        noisy = flow_match_xt(latents, noise, sigma_map)

        cfg = self.transformer_config
        p, pt = cfg["patch_size"], cfg["patch_size_t"]
        num_frames, height, width = latents.shape[2], latents.shape[3], latents.shape[4]
        packed_latents = pack_latents(latents, p, pt)
        packed_noise = pack_latents(noise, p, pt)
        packed_noisy = pack_latents(noisy, p, pt)
        # Per-token timesteps from the per-frame sigma map (B, S)
        token_sigmas = pack_latents(jnp.broadcast_to(sigma_map, latents.shape), p, pt)[..., 0]
        timesteps = token_sigmas * 1000.0

        latent_frame_rate = self.frame_rate / self.vae_temporal_compression_ratio
        rope_interpolation_scale = (
            1.0 / latent_frame_rate,
            float(self.vae_spatial_compression_ratio),
            float(self.vae_spatial_compression_ratio),
        )

        pred = transformer.module.apply(
            {"params": transformer.params},
            packed_noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            timesteps,
            encoder_attention_mask=condition_model_conditions.get("encoder_attention_mask"),
            num_frames=num_frames, height=height, width=width,
            rope_interpolation_scale=rope_interpolation_scale,
        )
        target = flow_match_target(packed_noise, packed_latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, image=None, height: int = 512, width: int = 704,
                   num_frames: int = 49, frame_rate: int = 25, num_inference_steps: int = 50,
                   **kwargs) -> List[Any]:
        from ...data._artifact import VideoArtifact

        video = pipeline(
            prompt=prompt, image=image, height=height, width=width, num_frames=num_frames,
            frame_rate=frame_rate, num_inference_steps=num_inference_steps,
        )
        return [VideoArtifact(value=video)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        """Head-parallel attention + sharded MLP (reference TP plan :415-504)."""
        return [
            (r"(attn1|attn2)\.(to_q|to_k|to_v)\.kernel", PartitionSpec(None, "tp")),
            (r"(attn1|attn2)\.to_out\.kernel", PartitionSpec("tp", None)),
            (r"ff_net_0_proj\.kernel", PartitionSpec(None, "tp")),
            (r"ff_net_2\.kernel", PartitionSpec("tp", None)),
        ]

    def cp_plan(self) -> Dict[str, int]:
        return {"latents": 2}  # shard latent frames; packed tokens inherit it

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3, 4)}
