"""Wan 2.1 model specification (T2V / I2V / FLF2V).

Capability parity with reference `finetrainers/models/wan/base_specification.py`:
UMT5 text conditioning, flow matching, moments normalized per-channel BEFORE
posterior sampling with `compute_posterior` forced False (:420-426,443-474),
I2V masked-latent conditioning + CLIP-vision image embeds (:84-207), mode
auto-detection from the transformer config's `image_dim` (:240-256).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from ...functional.diffusion import flow_match_target, flow_match_xt
from ...logging import get_logger
from ...schedulers import FlowMatchEulerScheduler
from ..autoencoders import WAN_VAE_CONFIG, AutoencoderConfig, AutoencoderKL3D, encode_media, sample_from_moments
from ..modeling_utils import ModelHandle, ModelSpecification
from ...processors import CaptionTextDropoutProcessor, HashEncoder, T5Processor
from .transformer import WanTransformer3DModel


logger = get_logger(__name__)

WAN_T2V_1_3B_CONFIG = dict(
    in_channels=16, out_channels=16, patch_size=(1, 2, 2), num_attention_heads=12,
    attention_head_dim=128, num_layers=30, ffn_dim=8960, text_dim=4096, freq_dim=256,
    image_dim=None,
)
WAN_I2V_14B_CONFIG = dict(
    in_channels=36, out_channels=16, patch_size=(1, 2, 2), num_attention_heads=40,
    attention_head_dim=128, num_layers=40, ffn_dim=13824, text_dim=4096, freq_dim=256,
    image_dim=1280,
)


class WanModelSpecification(ModelSpecification):
    transformer_class_name = "WanTransformer3DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import wan_key_map

        return wan_key_map(flax_key)

    def __init__(
        self,
        pretrained_model_name_or_path: str = "Wan-AI/Wan2.1-T2V-1.3B-Diffusers",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**WAN_T2V_1_3B_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or WAN_VAE_CONFIG
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            T5Processor(["encoder_hidden_states", "encoder_attention_mask"]),
        ]

    @property
    def is_i2v(self) -> bool:
        return self.transformer_config.get("image_dim") is not None

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        from ...processors.text_encoders import FlaxT5Handle

        try:
            encoder = FlaxT5Handle(
                self.text_encoder_id or self.pretrained_model_name_or_path,
                tokenizer_id=self.tokenizer_id, umt5=True,
            )
        except Exception as e:
            logger.warning(f"Could not load UMT5 ({e}); using offline hash encoder")
            encoder = HashEncoder(hidden_size=self.transformer_config["text_dim"], max_length=128,
                                  pooled_dim=self.transformer_config.get("image_dim"))
        out = {"tokenizer": getattr(encoder, "tokenizer", None), "text_encoder": encoder}
        if self.is_i2v:
            # CLIP-vision image encoder (hidden_states[-2], reference wan spec
            # :183-206); offline fallback hashes pixels.
            from ..text_encoders import FlaxCLIPVisionHandle

            out["image_encoder"] = self._load_text_tower(
                FlaxCLIPVisionHandle, None, "image_encoder",
                lambda: _OfflineImageEncoder(self.transformer_config["image_dim"]),
            )
        return out

    def load_latent_models(self) -> Dict[str, Any]:
        # Faithful AutoencoderKLWan with real weights + latent statistics from a
        # local diffusers checkpoint (reference wan/base_specification.py:420-474).
        from .vae import AutoencoderKLWan, WanVAEConfig, load_wan_vae_params

        handle = self._load_video_vae(AutoencoderKLWan, WanVAEConfig, load_wan_vae_params)
        if handle is not None:
            return {"vae": handle}
        module = AutoencoderKL3D(self.vae_autoencoder_config, dtype=self.vae_dtype)
        ratio = self.vae_autoencoder_config.spatial_compression_ratio
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, ratio, ratio), jnp.float32))["params"]
        latent_ch = self.vae_autoencoder_config.latent_channels
        config = {
            "latent_channels": latent_ch,
            "spatial_compression_ratio": ratio,
            "temporal_compression_ratio": self.vae_autoencoder_config.temporal_compression_ratio,
            "latents_mean": np.zeros((latent_ch,), np.float32),
            "latents_std": np.ones((latent_ch,), np.float32),
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = WanTransformer3DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        kwargs = {}
        if self.is_i2v:
            kwargs["encoder_hidden_states_image"] = jnp.zeros((1, 4, cfg["image_dim"]))
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg["in_channels"], 1, 4, 4)),
            jnp.zeros((1, 8, cfg["text_dim"])),
            jnp.zeros((1,)),
            **kwargs,
        )["params"]
        from .weights import load_wan_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_wan_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(shift=3.0),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import WanPipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        from ...schedulers import load_scheduler

        # Checkpoint-faithful sampling: Wan 2.1 checkpoints ship UniPC in their
        # scheduler config (reference validation inherits it via the diffusers
        # pipeline, base_specification.py:338-352); Euler shift=3 is the fallback.
        return WanPipeline(spec=self, transformer=transformer, vae=vae, text_encoder=text_encoder,
                           scheduler=load_scheduler(self.pretrained_model_name_or_path,
                                                    default=FlowMatchEulerScheduler(shift=3.0)))

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, max_sequence_length: int = 512,
                           image=None, image_encoder=None, **kwargs) -> Dict[str, Any]:
        data = {"caption": caption, "text_encoder": text_encoder, "max_sequence_length": max_sequence_length}
        for processor in self.condition_model_processors:
            data.update(processor(**data))
        out = {
            "encoder_hidden_states": data["encoder_hidden_states"],
            "encoder_attention_mask": data["encoder_attention_mask"],
        }
        if self.is_i2v and image is not None and image_encoder is not None:
            out["encoder_hidden_states_image"] = image_encoder.encode_image(np.asarray(image))
        return out

    def prepare_latents(
        self,
        vae: ModelHandle,
        image: Optional[np.ndarray] = None,
        video: Optional[np.ndarray] = None,
        compute_posterior: bool = False,  # forced False (reference :443)
        last_image: Optional[np.ndarray] = None,
        **kwargs,
    ) -> Dict[str, Any]:
        if video is None:
            video = np.asarray(image)[None]
        x = np.asarray(video, np.float32)[None].transpose(0, 2, 1, 3, 4)  # (1,C,F,H,W)
        moments = np.asarray(encode_media(vae, x))
        out = {
            "latents": moments,
            "latents_mean": vae.config["latents_mean"],
            "latents_std": vae.config["latents_std"],
        }
        if self.is_i2v:
            # Conditioning video: first frame (+ optional last frame) kept, rest zeroed
            # (reference :122-126); mask marks conditioned frames (:146-155).
            cond_video = np.array(x)
            cond_video[:, :, 1:] = 0.0
            if last_image is not None:
                cond_video[:, :, -1:] = np.asarray(last_image, np.float32)[None, :, None]
            cond_moments = np.asarray(encode_media(vae, cond_video))
            t_down = vae.config["temporal_compression_ratio"]
            lf, lh, lw = moments.shape[2], moments.shape[3], moments.shape[4]
            mask = np.zeros((1, t_down, lf, lh, lw), np.float32)
            mask[:, :, 0] = 1.0
            if last_image is not None:
                mask[:, 0, -1] = 1.0
            out["latent_condition"] = cond_moments
            out["latent_condition_mask"] = mask
        return out

    def collate_latents(self, data: List[Dict[str, Any]]) -> Dict[str, Any]:
        out = super().collate_latents(data)
        out["latents_mean"] = np.asarray(data[0]["latents_mean"]).reshape(-1)
        out["latents_std"] = np.asarray(data[0]["latents_std"]).reshape(-1)
        return out

    # ---------------------------------------------------------------- training
    def _normalize_moments(self, moments, mean, std):
        mean = mean.reshape(1, -1, 1, 1, 1)
        std = std.reshape(1, -1, 1, 1, 1)
        mu, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=1)
        mu = (mu - mean) / std
        logvar = (logvar - mean) / std  # reference normalizes both chunks (:456-458)
        return jnp.concatenate([mu, logvar], axis=1)

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
        mean = latent_model_conditions["latents_mean"]
        std = latent_model_conditions["latents_std"]
        moments = self._normalize_moments(latent_model_conditions["latents"], mean, std)
        latents = sample_from_moments(moments, rng_post)

        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        sigmas_e = sigmas.reshape(-1, 1, 1, 1, 1)
        noisy = flow_match_xt(latents, noise, sigmas_e)
        timesteps = sigmas * 1000.0

        if self.is_i2v:
            cond_moments = self._normalize_moments(latent_model_conditions["latent_condition"], mean, std)
            cond_latents, _ = jnp.split(cond_moments, 2, axis=1)  # posterior mode
            mask = latent_model_conditions["latent_condition_mask"]
            noisy = jnp.concatenate([noisy, mask, cond_latents], axis=1)

        pred = transformer.module.apply(
            {"params": transformer.params},
            noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            timesteps,
            encoder_hidden_states_image=condition_model_conditions.get("encoder_hidden_states_image"),
            encoder_attention_mask=condition_model_conditions.get("encoder_attention_mask"),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, image=None, height: int = 480, width: int = 832,
                   num_frames: int = 81, num_inference_steps: int = 50, **kwargs) -> List[Any]:
        from ...data._artifact import VideoArtifact

        video = pipeline(prompt=prompt, image=image, height=height, width=width,
                         num_frames=num_frames, num_inference_steps=num_inference_steps)
        return [VideoArtifact(value=video)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        return [
            (r"(attn1|attn2)\.(to_q|to_k|to_v|add_k_proj|add_v_proj)\.kernel", PartitionSpec(None, "tp")),
            (r"(attn1|attn2)\.to_out\.kernel", PartitionSpec("tp", None)),
            (r"ffn_net_0_proj\.kernel", PartitionSpec(None, "tp")),
            (r"ffn_net_2\.kernel", PartitionSpec("tp", None)),
        ]

    def cp_plan(self) -> Dict[str, int]:
        return {"latents": 2}

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3, 4)}


class _OfflineImageEncoder:
    """Deterministic CLIP-vision stand-in for offline environments."""

    def __init__(self, dim: int):
        self.dim = dim

    def encode_image(self, image: np.ndarray) -> np.ndarray:
        import hashlib

        digest = hashlib.sha256(np.ascontiguousarray(image).tobytes()).digest()
        seed = int.from_bytes(digest[:4], "little")
        return np.random.RandomState(seed).randn(1, 257, self.dim).astype(np.float32) * 0.02
