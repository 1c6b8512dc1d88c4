"""CogVideoX model specification — the only non-flow-match objective in the zoo.

Capability parity with reference `finetrainers/models/cogvideox/base_specification.py`:
T5 conditioning, DDIM noising (`scheduler.add_noise`), the model predicts velocity,
pred = get_velocity(v, x_t, t) (x0 estimate), target = latents, loss weights
1/(1-alpha) (reference forward :258-334; utils/diffusion.py:120-135).
Latents are frames-first (B, F, C, H, W).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from ...logging import get_logger
from ...schedulers import CogVideoXDDIMScheduler
from ..autoencoders import COGVIDEOX_VAE_CONFIG, AutoencoderConfig, AutoencoderKL3D, encode_media, sample_from_moments
from ..modeling_utils import ModelHandle, ModelSpecification
from ...processors import CaptionTextDropoutProcessor, HashEncoder, T5Processor
from .transformer import CogVideoXTransformer3DModel


logger = get_logger(__name__)

COGVIDEOX_5B_CONFIG = dict(
    in_channels=16, out_channels=16, patch_size=2, num_attention_heads=48,
    attention_head_dim=64, num_layers=42, text_embed_dim=4096, time_embed_dim=512,
    use_rotary_positional_embeddings=True, use_learned_positional_embeddings=False,
)
COGVIDEOX_2B_CONFIG = dict(
    in_channels=16, out_channels=16, patch_size=2, num_attention_heads=30,
    attention_head_dim=64, num_layers=30, text_embed_dim=4096, time_embed_dim=512,
    use_rotary_positional_embeddings=False, use_learned_positional_embeddings=True,
)


class CogVideoXModelSpecification(ModelSpecification):
    transformer_class_name = "CogVideoXTransformer3DModel"

    @staticmethod
    def transformer_key_map(flax_key: str) -> str:
        from .weights import cogvideox_key_map

        return cogvideox_key_map(flax_key)

    def __init__(
        self,
        pretrained_model_name_or_path: str = "THUDM/CogVideoX-5b",
        transformer_config: Optional[Dict[str, Any]] = None,
        vae_config: Optional[AutoencoderConfig] = None,
        caption_dropout_p: float = 0.0,
        lora_rank: int = 0,
        lora_alpha: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(pretrained_model_name_or_path=pretrained_model_name_or_path, **kwargs)
        self.transformer_config = {**COGVIDEOX_5B_CONFIG, **(transformer_config or {})}
        self.vae_autoencoder_config = vae_config or COGVIDEOX_VAE_CONFIG
        self.caption_dropout_p = caption_dropout_p
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.vae_scaling_factor = 0.7  # CogVideoX VAE scaling_factor (1.15258426 for 1.5)
        self.condition_model_processors = [
            CaptionTextDropoutProcessor(caption_dropout_p),
            T5Processor(["encoder_hidden_states", "encoder_attention_mask"]),
        ]
        self._scheduler = CogVideoXDDIMScheduler()

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        # Real T5 tower when a checkpoint is reachable (reference
        # cogvideox/base_specification.py:121-140 loads T5EncoderModel); the
        # HashEncoder is a loud offline fallback, same shape as LTX/Wan.
        from ...processors.text_encoders import FlaxT5Handle

        try:
            encoder = FlaxT5Handle(
                self.text_encoder_id or self.pretrained_model_name_or_path,
                tokenizer_id=self.tokenizer_id,
            )
        except Exception as e:  # offline / missing checkpoint: degrade loudly
            logger.warning(f"Could not load T5 ({e}); using offline hash encoder")
            encoder = HashEncoder(hidden_size=self.transformer_config["text_embed_dim"], max_length=226)
        return {"tokenizer": getattr(encoder, "tokenizer", None), "text_encoder": encoder}

    def load_latent_models(self) -> Dict[str, Any]:
        # Faithful AutoencoderKLCogVideoX with real weights (reference
        # cogvideox/base_specification.py prepare_latents).
        from .vae import AutoencoderKLCogVideoX, CogVideoXVAEConfig, load_cogvideox_vae_params

        handle = self._load_video_vae(
            AutoencoderKLCogVideoX, CogVideoXVAEConfig, load_cogvideox_vae_params,
            default_scaling=1.15258426,
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
            "scaling_factor": self.vae_scaling_factor,
        }
        return {"vae": ModelHandle(module, params, config)}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = CogVideoXTransformer3DModel(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype, **self._transformer_runtime_kwargs(),
        )
        cfg = self.transformer_config
        init_frames = cfg.get("patch_size_t") or 1
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, init_frames, cfg["in_channels"], 2 * cfg["patch_size"], 2 * cfg["patch_size"])),
            jnp.zeros((1, 8, cfg["text_embed_dim"])),
            jnp.zeros((1,)),
        )["params"]
        from .weights import load_cogvideox_transformer_params

        params = self._maybe_load_pretrained_transformer(params, load_cogvideox_transformer_params, module=module)
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": self._scheduler,
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None,
                      text_encoder=None, **kwargs):
        from .pipeline import CogVideoXPipeline

        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        if vae is None:
            vae = self.load_latent_models()["vae"]
        if text_encoder is None:
            text_encoder = self.load_condition_models()["text_encoder"]
        return CogVideoXPipeline(spec=self, transformer=transformer, vae=vae,
                                 text_encoder=text_encoder, scheduler=self._scheduler)

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, text_encoder=None, max_sequence_length: int = 226,
                           **kwargs) -> Dict[str, Any]:
        data = {"caption": caption, "text_encoder": text_encoder, "max_sequence_length": max_sequence_length}
        for processor in self.condition_model_processors:
            data.update(processor(**data))
        return {
            "encoder_hidden_states": data["encoder_hidden_states"],
            "encoder_attention_mask": data["encoder_attention_mask"],
        }

    def prepare_latents(self, vae: ModelHandle, image: Optional[np.ndarray] = None,
                        video: Optional[np.ndarray] = None, compute_posterior: bool = False,
                        **kwargs) -> Dict[str, Any]:
        if video is None:
            video = np.asarray(image)[None]
        x = np.asarray(video, np.float32)[None].transpose(0, 2, 1, 3, 4)  # (1,C,F,H,W)
        moments = np.asarray(encode_media(vae, x))
        # frames-first: (1, 2C, F, H, W) -> (1, F, 2C, H, W)
        return {"latents": moments.transpose(0, 2, 1, 3, 4)}

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
        scheduler = self._scheduler
        rng_post, rng_noise = jax.random.split(rng)
        moments = latent_model_conditions["latents"]  # (B, F, 2C, H, W)
        # posterior over channel dim 2 (reference: DiagonalGaussianDistribution(_dim=2))
        mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=2)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        latents = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng_post, mean.shape)
        latents = latents * self.vae_scaling_factor

        # CogVideoX 1.5 (patch_size_t=2): pad frames to a multiple of patch_size_t
        # by repeating the last frame (reference _pad_frames :403-408).
        pt = self.transformer_config.get("patch_size_t") or 1
        if pt > 1 and latents.shape[1] % pt != 0:
            extra = pt - latents.shape[1] % pt
            pad = jnp.repeat(latents[:, -1:], extra, axis=1)
            latents = jnp.concatenate([latents, pad], axis=1)

        timesteps = jnp.clip((sigmas * scheduler.num_train_timesteps).astype(jnp.int32),
                             0, scheduler.num_train_timesteps - 1)
        noise = jax.random.normal(rng_noise, latents.shape, jnp.float32)
        # add_noise over frames-first latents: alphas broadcast per batch
        a = scheduler.alphas_cumprod[timesteps].reshape(-1, 1, 1, 1, 1)
        noisy = jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise

        velocity = transformer.module.apply(
            {"params": transformer.params},
            noisy.astype(self.transformer_dtype),
            condition_model_conditions["encoder_hidden_states"],
            timesteps.astype(jnp.float32),
        )
        # get_velocity(v, x_t, t) = sqrt(a)*x_t - sqrt(1-a)*v  (x0 estimate)
        pred = jnp.sqrt(a) * noisy - jnp.sqrt(1.0 - a) * velocity.astype(jnp.float32)
        target = latents
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, height: int = 480, width: int = 720,
                   num_frames: int = 49, num_inference_steps: int = 50, **kwargs) -> List[Any]:
        from ...data._artifact import VideoArtifact

        video = pipeline(prompt=prompt, height=height, width=width, num_frames=num_frames,
                         num_inference_steps=num_inference_steps)
        return [VideoArtifact(value=video)]

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, PartitionSpec]]:
        return [
            (r"attn1_to_(q|k|v)\.kernel", PartitionSpec(None, "tp")),
            (r"attn1_to_out\.kernel", PartitionSpec("tp", None)),
            (r"ff_net_0_proj\.kernel", PartitionSpec(None, "tp")),
            (r"ff_net_2\.kernel", PartitionSpec("tp", None)),
        ]

    def cp_plan(self) -> Dict[str, int]:
        return {"latents": 1}  # frames dim (frames-first layout)

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (1, 3, 4)}
