"""Dummy model family: a tiny but fully-representative video DiT + VAE + text
encoder, exercising every trainer code path on CPU (the analog of the reference's
dummy specs, e.g. `tests/models/ltx_video/base_specification.py:8-63` — but here
it is a first-class model so users can smoke-test configs without checkpoints).

Architecture: 3D latents (B, C, F, H, W) -> patchify (1,2,2) -> token stream ->
N blocks of [adaLN self-attn, cross-attn to text, adaLN MLP] -> unpatchify.
Flow-matching objective.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...functional.diffusion import flow_match_target, flow_match_xt
from ...schedulers import FlowMatchEulerScheduler
from ..layers import Attention, FeedForward, LayerNorm, LoRADense, TimestepEmbedding, modulate
from ..modeling_utils import ModelHandle, ModelSpecification


class DummyTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    ff_mult: int = 4
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context, temb, kv_lens=None):
        head_dim = self.dim // self.num_heads
        # adaLN modulation parameters from the timestep embedding
        mod = LoRADense(6 * self.dim, dtype=self.dtype, name="adaln_proj")(nn.silu(temb))
        shift_sa, scale_sa, gate_sa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = modulate(h, shift_sa, scale_sa)
        h = Attention(
            num_heads=self.num_heads, head_dim=head_dim, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, dtype=self.dtype, name="attn1",
        )(h)
        x = x + gate_sa[:, None] * h

        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Attention(
            num_heads=self.num_heads, head_dim=head_dim, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, dtype=self.dtype, name="attn2",
        )(h, encoder_hidden_states=context, kv_lens=kv_lens)
        x = x + h

        h = LayerNorm(dtype=self.dtype, name="norm3")(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = FeedForward(self.dim * self.ff_mult, lora_rank=self.lora_rank,
                        lora_alpha=self.lora_alpha, dtype=self.dtype, name="ff")(h)
        x = x + gate_mlp[:, None] * h
        return x


class DummyTransformer(nn.Module):
    in_channels: int = 4
    dim: int = 64
    num_heads: int = 2
    num_layers: int = 2
    caption_dim: int = 32
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.float32
    # scan-over-layers: ONE compiled block body + stacked params instead of
    # num_layers HLO copies (compile time ~O(1) in depth, None = auto for deep
    # stacks); gradient_checkpointing: None|"full"|"ops"|"block_skip" per-block
    # remat, like the reference's checkpoint_wrapper policies. `remat=True` is a
    # back-compat alias for gradient_checkpointing="full".
    use_scan: Optional[bool] = None
    remat: bool = False
    gradient_checkpointing: Optional[str] = None

    def _checkpoint(self) -> Optional[str]:
        return self.gradient_checkpointing or ("full" if self.remat else None)

    def scan_stacks(self):
        from ..layers import resolve_use_scan, scan_group_size

        if not resolve_use_scan(self.use_scan, self.num_layers):
            return []
        return [("blocks", self.num_layers, scan_group_size(self._checkpoint()))]

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states, timestep, encoder_kv_lens=None):
        """hidden_states: (B, C, F, H, W); encoder_hidden_states: (B, L, caption_dim);
        timestep: (B,) in [0, 1000)."""
        from ..layers import block_stack

        b, c, f, h, w = hidden_states.shape
        pf, ph, pw = self.patch_size
        # Patchify: (B,C,F,H,W) -> (B, F/pf * H/ph * W/pw, C*pf*ph*pw)
        x = hidden_states.reshape(b, c, f // pf, pf, h // ph, ph, w // pw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, -1, c * pf * ph * pw)
        x = LoRADense(self.dim, dtype=self.dtype, name="proj_in")(x.astype(self.dtype))

        temb = TimestepEmbedding(self.dim, dtype=self.dtype, name="time_embed")(timestep)
        context = LoRADense(self.dim, dtype=self.dtype, name="caption_proj")(
            encoder_hidden_states.astype(self.dtype)
        )

        x = block_stack(
            DummyTransformerBlock,
            dict(dim=self.dim, num_heads=self.num_heads, lora_rank=self.lora_rank,
                 lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            x,
            broadcast_args=(context, temb, encoder_kv_lens),
            broadcast_kinds=("batched", "batched", "batched"),
            use_scan=self.use_scan,
            checkpoint=self._checkpoint(),
            list_name="blocks",
            parent=self,
        )

        x = LayerNorm(dtype=self.dtype, name="norm_out")(x)
        x = LoRADense(c * pf * ph * pw, dtype=self.dtype, name="proj_out")(x)
        # Unpatchify
        x = x.reshape(b, f // pf, h // ph, w // pw, c, pf, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(b, c, f, h, w)
        return x.astype(jnp.float32)


class DummyVAE(nn.Module):
    """Linear patch VAE: space-to-depth (1,8,8) + dense to 2*latent_channels
    moments; decode inverts. Differentiable, deterministic, shape-faithful."""

    latent_channels: int = 4
    spatial_compression_ratio: int = 8
    temporal_compression_ratio: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_proj = nn.Dense(2 * self.latent_channels, dtype=self.dtype, name="encoder_proj")
        self.decoder_proj = nn.Dense(3 * self.spatial_compression_ratio**2, dtype=self.dtype, name="decoder_proj")

    def _s2d(self, x):
        b, c, f, h, w = x.shape
        r = self.spatial_compression_ratio
        x = x.reshape(b, c, f, h // r, r, w // r, r)
        return x.transpose(0, 2, 3, 5, 1, 4, 6).reshape(b, f, h // r, w // r, c * r * r)

    def encode(self, x):
        """(B, 3, F, H, W) -> moments (B, 2*latent, F, H/r, W/r)."""
        feats = self._s2d(x.astype(self.dtype))
        moments = self.encoder_proj(feats)
        return moments.transpose(0, 4, 1, 2, 3).astype(jnp.float32)

    def decode(self, z):
        """(B, latent, F, H/r, W/r) -> (B, 3, F, H, W)."""
        b, c, f, hh, ww = z.shape
        r = self.spatial_compression_ratio
        feats = self.decoder_proj(z.transpose(0, 2, 3, 4, 1).astype(self.dtype))
        x = feats.reshape(b, f, hh, ww, 3, r, r)
        x = x.transpose(0, 4, 1, 2, 5, 3, 6).reshape(b, 3, f, hh * r, ww * r)
        return x.astype(jnp.float32)

    def __call__(self, x):
        moments = self.encode(x)
        mean, _ = jnp.split(moments, 2, axis=1)
        return self.decode(mean)


def sample_posterior(moments: jax.Array, rng: jax.Array) -> jax.Array:
    """DiagonalGaussian sample from concatenated (mean, logvar) moments
    (reference models/utils.py DiagonalGaussianDistribution)."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)


def _hash_embedding(text: str, length: int, dim: int) -> np.ndarray:
    """Deterministic pseudo text-embedding (offline stand-in for a text encoder)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randn(length, dim).astype(np.float32) * 0.02


class DummyModelSpecification(ModelSpecification):
    """Full ModelSpecification over the dummy family. Exercises: moments->posterior
    latents, flow-matching objective, cross-attn text conditioning, LoRA, validation
    denoise loop with VAE decode."""

    caption_dim = 32
    caption_len = 16

    # Explicit test hook: fixtures that need a different dummy architecture
    # (e.g. a deeper scanned stack for pipeline-parallel e2e runs) set this
    # class attribute via monkeypatch instead of ambient environment variables.
    transformer_config_overrides: Dict[str, Any] = {}

    def __init__(self, *args, lora_rank: int = 0, lora_alpha: float = 1.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.transformer_config = {
            "in_channels": 4, "dim": 64, "num_heads": 2, "num_layers": 2,
            "caption_dim": self.caption_dim, "patch_size": (1, 2, 2),
        }
        self.transformer_config.update(self.transformer_config_overrides)
        self.vae_config = {
            "latent_channels": 4, "spatial_compression_ratio": 8, "temporal_compression_ratio": 1,
        }

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        return {"tokenizer": None, "text_encoder": None}  # hash-embedding needs none

    def load_latent_models(self) -> Dict[str, Any]:
        module = DummyVAE(**self.vae_config)
        params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 8, 8)))["params"]
        return {"vae": ModelHandle(module, params, dict(self.vae_config))}

    def load_diffusion_models(self) -> Dict[str, Any]:
        module = DummyTransformer(
            **self.transformer_config, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
            dtype=self.transformer_dtype,
        )
        params = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 1, 4, 4)),
            jnp.zeros((1, self.caption_len, self.caption_dim)),
            jnp.zeros((1,)),
        )["params"]
        return {
            "transformer": ModelHandle(module, params, dict(self.transformer_config)),
            "scheduler": FlowMatchEulerScheduler(),
        }

    def load_pipeline(self, transformer: ModelHandle = None, vae: ModelHandle = None, **kwargs):
        from .pipeline import DummyPipeline

        vae = vae or self.load_latent_models()["vae"]
        if transformer is None:
            transformer = self.load_diffusion_models()["transformer"]
        return DummyPipeline(spec=self, transformer=transformer, vae=vae, scheduler=FlowMatchEulerScheduler())

    # ------------------------------------------------------------- data prep
    def prepare_conditions(self, caption: str, **kwargs) -> Dict[str, Any]:
        emb = _hash_embedding(caption, self.caption_len, self.caption_dim)[None]
        return {"encoder_hidden_states": emb, "encoder_kv_lens": np.asarray([self.caption_len], np.int32)}

    def prepare_latents(
        self,
        vae: ModelHandle,
        image: Optional[np.ndarray] = None,
        video: Optional[np.ndarray] = None,
        generator=None,
        compute_posterior: bool = False,
        **kwargs,
    ) -> Dict[str, Any]:
        if video is None:
            video = image[None]  # (1, C, H, W) -> (F=1, C, H, W)
        x = np.asarray(video, np.float32)[None].transpose(0, 2, 1, 3, 4)  # (1, C, F, H, W)
        moments = vae.apply(jnp.asarray(x), method=DummyVAE.encode)
        if compute_posterior:
            latents = sample_posterior(moments, jax.random.PRNGKey(0))
            return {"latents": np.asarray(latents)}
        return {"latents": np.asarray(moments)}

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
        latents = latent_model_conditions["latents"]
        if not compute_posterior:
            latents = sample_posterior(latents, rng_post)
        noise = jax.random.normal(rng_noise, latents.shape, dtype=latents.dtype)
        sigmas_e = sigmas.reshape(sigmas.shape + (1,) * (latents.ndim - 1))
        noisy = flow_match_xt(latents, noise, sigmas_e)
        timestep = (sigmas * 1000.0).astype(jnp.float32)

        pred = transformer.module.apply(
            {"params": transformer.params},
            noisy,
            condition_model_conditions["encoder_hidden_states"],
            timestep,
            encoder_kv_lens=condition_model_conditions.get("encoder_kv_lens"),
        )
        target = flow_match_target(noise, latents)
        return pred, target, sigmas

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, prompt: str, height: int = 32, width: int = 32,
                   num_frames: int = 1, num_inference_steps: int = 4, **kwargs) -> List[Any]:
        from ...data._artifact import VideoArtifact

        video = pipeline(prompt=prompt, height=height, width=width, num_frames=num_frames,
                         num_inference_steps=num_inference_steps)
        return [VideoArtifact(value=video)]

    def cp_plan(self) -> Dict[str, int]:
        # Frames dim of the latents carries the CP-sharded sequence; the patchified
        # token stream inherits the sharding (GSPMD propagates through reshape).
        return {"latents": 2}

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        return {"latents": (2, 3, 4)}
