"""Flax text/vision towers: Llama decoder, GLM decoder, CLIP text, CLIP vision.

Own TPU-first implementations (no torch at runtime) that load HF safetensors
checkpoints through the same converter machinery as the DiT families
(`models/weight_utils.py`). Param paths mirror HF module paths (layers_{i} ->
layers.{i}, kernel -> weight transposed, scale -> weight), so the generic
`flax_key_to_torch` mapping covers every key.

Reference usage being replaced (hash-encoder stand-ins in round 1):
  - Llama: HunyuanVideo prompt embeds, `hidden_states[-(skip+1)]` with template
    crop (reference `processors/llama.py:23-120`).
  - GLM: CogView4 prompt embeds, `hidden_states[-2]`, causal only — the
    reference passes no padding mask (reference `processors/glm.py:60-73`).
  - CLIP text: pooled EOS-token embedding (reference `processors/clip.py:50-63`).
  - CLIP vision: Wan I2V image embeds, `hidden_states[-2]` (reference
    `models/wan/base_specification.py:183-206`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import attention_dispatch
from ..layers import RMSNorm


# --------------------------------------------------------------------- configs


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Covers Llama and GLM (HF config.json field names)."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    attention_bias: bool = False
    partial_rotary_factor: float = 1.0
    interleaved_rope: bool = False  # GLM pairs (0,1),(2,3)…; Llama rotates halves
    fused_gate_up: bool = False     # GLM gate_up_proj; Llama separate gate/up

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def llama(cls, cfg: dict) -> "DecoderConfig":
        return cls(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
            rope_theta=cfg.get("rope_theta", 10000.0),
            attention_bias=cfg.get("attention_bias", False),
        )

    @classmethod
    def glm(cls, cfg: dict) -> "DecoderConfig":
        return cls(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            head_dim=cfg.get("head_dim"),
            rms_norm_eps=cfg.get("rms_norm_eps", 1.5625e-07),
            rope_theta=cfg.get("rope_theta", 10000.0),
            attention_bias=cfg.get("attention_bias", True),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.5),
            interleaved_rope=True,
            fused_gate_up=True,
        )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for CLIPTextModelWithProjection

    @classmethod
    def from_hf(cls, cfg: dict, with_projection: bool = False) -> "CLIPTextConfig":
        return cls(
            vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            max_position_embeddings=cfg.get("max_position_embeddings", 77),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
            eos_token_id=cfg.get("eos_token_id", 49407),
            projection_dim=cfg.get("projection_dim") if with_projection else None,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def from_hf(cls, cfg: dict) -> "CLIPVisionConfig":
        return cls(
            hidden_size=cfg["hidden_size"], intermediate_size=cfg["intermediate_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            image_size=cfg.get("image_size", 224), patch_size=cfg.get("patch_size", 14),
            num_channels=cfg.get("num_channels", 3),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            hidden_act=cfg.get("hidden_act", "quick_gelu"),
        )


# ----------------------------------------------------------------------- RoPE


def _decoder_rope(positions: jax.Array, head_dim: int, theta: float, partial: float):
    """(cos, sin) of shape (S, rot_dim/2) for the rotated slice of each head."""
    rot_dim = int(head_dim * partial)
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def _apply_decoder_rope(x: jax.Array, cos: jax.Array, sin: jax.Array, interleaved: bool):
    """x: (B, S, N, H). Rotates the first 2*cos.shape[-1] dims of H; the rest
    pass through (GLM partial rotary). Llama: half-split rotation; GLM:
    interleaved pairs (transformers glm `rotate_half` stacks (-x2, x1))."""
    rot = 2 * cos.shape[-1]
    x32 = x.astype(jnp.float32)
    x_rot, x_pass = x32[..., :rot], x32[..., rot:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    if interleaved:
        x1 = x_rot[..., 0::2]
        x2 = x_rot[..., 1::2]
        out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(x_rot.shape)
    else:
        x1, x2 = jnp.split(x_rot, 2, axis=-1)
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return jnp.concatenate([out, x_pass], axis=-1).astype(x.dtype)


# -------------------------------------------------------------------- decoder


class _DecoderAttention(nn.Module):
    config: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, cos, sin):
        cfg = self.config
        h = cfg.resolved_head_dim
        n, n_kv = cfg.num_attention_heads, cfg.num_key_value_heads
        b, s, _ = x.shape
        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(n * h, cfg.attention_bias, "q_proj")(x).reshape(b, s, n, h)
        k = dense(n_kv * h, cfg.attention_bias, "k_proj")(x).reshape(b, s, n_kv, h)
        v = dense(n_kv * h, cfg.attention_bias, "v_proj")(x).reshape(b, s, n_kv, h)
        q = _apply_decoder_rope(q, cos, sin, cfg.interleaved_rope)
        k = _apply_decoder_rope(k, cos, sin, cfg.interleaved_rope)
        out = attention_dispatch(q, k, v, attn_mask=mask, scale=h**-0.5)
        out = out.reshape(b, s, n * h)
        return dense(cfg.hidden_size, False, "o_proj")(out)


class _DecoderMLP(nn.Module):
    config: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=name
        )
        if cfg.fused_gate_up:
            gate_up = dense(2 * cfg.intermediate_size, "gate_up_proj")(x)
            gate, up = jnp.split(gate_up, 2, axis=-1)
        else:
            gate = dense(cfg.intermediate_size, "gate_proj")(x)
            up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class _DecoderLayer(nn.Module):
    config: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, cos, sin):
        cfg = self.config
        h = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        x = x + _DecoderAttention(cfg, dtype=self.dtype, name="self_attn")(h, mask, cos, sin)
        h = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        x = x + _DecoderMLP(cfg, dtype=self.dtype, name="mlp")(h)
        return x


class DecoderTextModel(nn.Module):
    """Causal decoder trunk (LlamaModel / GlmModel equivalent). Returns the HF
    `hidden_states` tuple: [embeddings, after layer 1, …, after layer N-1,
    final-norm(after layer N)] — the diffusion specs index from the end."""

    config: DecoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # (B, S) int32
        attention_mask: Optional[jax.Array] = None,  # (B, S) 1=valid
    ) -> List[jax.Array]:
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                     dtype=self.dtype, name="embed_tokens")(input_ids)
        s = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            causal = jnp.logical_and(causal, attention_mask[:, None, None, :].astype(bool))
        cos, sin = _decoder_rope(jnp.arange(s), cfg.resolved_head_dim, cfg.rope_theta,
                                 cfg.partial_rotary_factor)
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = _DecoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal, cos, sin)
            if i < cfg.num_hidden_layers - 1:
                hidden_states.append(x)
        x = RMSNorm(eps=cfg.rms_norm_eps, dtype=self.dtype, name="norm")(x)
        hidden_states.append(x)
        return hidden_states


# ----------------------------------------------------------------------- CLIP


def _clip_act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        return lambda x: nn.gelu(x, approximate=True)
    raise ValueError(f"Unknown CLIP activation {name!r}")


class _CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        hd = self.hidden_size // self.num_heads
        b, s, _ = x.shape
        dense = lambda name: nn.Dense(self.hidden_size, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q = dense("q_proj")(x).reshape(b, s, self.num_heads, hd)
        k = dense("k_proj")(x).reshape(b, s, self.num_heads, hd)
        v = dense("v_proj")(x).reshape(b, s, self.num_heads, hd)
        attn = attention_dispatch(q, k, v, attn_mask=mask, scale=hd**-0.5)
        return dense("out_proj")(attn.reshape(b, s, self.hidden_size))


class _CLIPMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        h = _clip_act(self.act)(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(h)


class _CLIPLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    eps: float
    act: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="layer_norm1")(x)
        x = x + _CLIPAttention(self.hidden_size, self.num_heads, dtype=self.dtype,
                               name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="layer_norm2")(x)
        return x + _CLIPMLP(self.hidden_size, self.intermediate_size, self.act,
                            dtype=self.dtype, name="mlp")(h)


class _CLIPEncoder(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    num_layers: int
    eps: float
    act: str
    dtype: Any = jnp.float32
    collect_hidden: bool = False

    @nn.compact
    def __call__(self, x, mask):
        hidden_states = [x]
        for i in range(self.num_layers):
            x = _CLIPLayer(self.hidden_size, self.intermediate_size, self.num_heads,
                           self.eps, self.act, dtype=self.dtype, name=f"layers_{i}")(x, mask)
            hidden_states.append(x)
        return (x, hidden_states) if self.collect_hidden else (x, None)


class _CLIPTextEmbeddings(nn.Module):
    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=jnp.float32,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size, param_dtype=jnp.float32,
                       dtype=self.dtype, name="position_embedding")(jnp.arange(input_ids.shape[1]))
        return tok + pos[None]


class _CLIPVisionEmbeddings(nn.Module):
    config: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]
        # (B, C, H, W) -> (B, H, W, C) for flax conv
        x = jnp.transpose(pixel_values.astype(self.dtype), (0, 2, 3, 1))
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False, padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="patch_embedding")(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x], axis=1
        )
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(n_pos, cfg.hidden_size, param_dtype=jnp.float32, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(x.shape[1]))
        return x + pos[None]


class CLIPTextTower(nn.Module):
    """CLIPTextModel(+WithProjection) equivalent: returns (last_hidden_state,
    pooled). Pooled = final-norm hidden at the first EOS position (projected
    when the config carries a projection dim)."""

    config: CLIPTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        b, s = input_ids.shape
        x = _CLIPTextEmbeddings(cfg, dtype=self.dtype, name="embeddings")(input_ids)
        mask = jnp.tril(jnp.ones((s, s), bool))[None, None]
        x, _ = _CLIPEncoder(cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
                            cfg.num_hidden_layers, cfg.layer_norm_eps, cfg.hidden_act,
                            dtype=self.dtype, name="encoder")(x, mask)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_layer_norm")(x)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eos_pos]
        if cfg.projection_dim:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                              param_dtype=jnp.float32, name="text_projection")(pooled)
        return x, pooled


class CLIPVisionTower(nn.Module):
    """CLIPVisionModel equivalent: returns the HF hidden_states tuple + pooled
    (post-norm class token). Wan I2V consumes hidden_states[-2]."""

    config: CLIPVisionConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> Tuple[List[jax.Array], jax.Array]:
        cfg = self.config
        x = _CLIPVisionEmbeddings(cfg, dtype=self.dtype, name="embeddings")(pixel_values)
        # HF's CLIPVisionTransformer attribute is (sic) "pre_layrnorm".
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                         name="pre_layrnorm")(x)
        x, hidden_states = _CLIPEncoder(
            cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
            cfg.num_hidden_layers, cfg.layer_norm_eps, cfg.hidden_act,
            dtype=self.dtype, collect_hidden=True, name="encoder",
        )(x, None)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=jnp.float32,
                              name="post_layernorm")(x[:, 0])
        return hidden_states, pooled
