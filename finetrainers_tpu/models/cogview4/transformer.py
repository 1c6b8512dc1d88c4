"""CogView4 image DiT in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `CogView4Transformer2DModel` (reference spec
`finetrainers/models/cogview4/base_specification.py`): joint [text, image] token
stream with per-stream adaLN modulation, 2D RoPE on image tokens, GLM text
conditioning, and SDXL-style size/crop microconditioning
(original_size / target_size / crop_coords, reference :126-130).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import attention_dispatch
from ..layers import (
    LayerNorm,
    LoRADense,
    axial_rope_freqs,
    block_stack,
    resolve_use_scan,
    scan_group_size,
    sinusoidal_timestep_embedding,
)


def _rope_interleaved(x, cos, sin):
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., 0::2], x32[..., 1::2]
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    return jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(x.shape).astype(x.dtype)


class CogView4Block(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    time_embed_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb, freqs):
        b = hidden.shape[0]
        st = encoder_hidden.shape[1]
        n, hd = self.num_heads, self.head_dim

        mod = LoRADense(12 * self.dim, dtype=self.dtype, name="adaln_linear")(nn.silu(temb))
        (shift, scale, gate, enc_shift, enc_scale, enc_gate,
         shift2, scale2, gate2, enc_shift2, enc_scale2, enc_gate2) = jnp.split(mod, 12, axis=-1)

        h = LayerNorm(dtype=self.dtype, name="norm1")(hidden) * (1 + scale[:, None]) + shift[:, None]
        e = LayerNorm(dtype=self.dtype, name="norm1_context")(encoder_hidden) * (1 + enc_scale[:, None]) + enc_shift[:, None]
        x = jnp.concatenate([e, h], axis=1)
        s = x.shape[1]
        q = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_q")(x)
        k = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_k")(x)
        v = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_v")(x)
        q = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="attn1_norm_q")(q.reshape(b, s, n, hd))
        k = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="attn1_norm_k")(k.reshape(b, s, n, hd))
        v = v.reshape(b, s, n, hd)
        cos, sin = freqs
        cos2 = jnp.repeat(cos, 2, axis=-1)
        sin2 = jnp.repeat(sin, 2, axis=-1)
        rope = (
            jnp.concatenate([jnp.ones((st, cos2.shape[-1]), cos2.dtype), cos2]),
            jnp.concatenate([jnp.zeros((st, sin2.shape[-1]), sin2.dtype), sin2]),
        )
        attn = attention_dispatch(q, k, v, rope_freqs=rope).reshape(b, s, n * hd)
        attn = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                         name="attn1_to_out")(attn)
        encoder_hidden = encoder_hidden + enc_gate[:, None] * attn[:, :st]
        hidden = hidden + gate[:, None] * attn[:, st:]

        h = LayerNorm(dtype=self.dtype, name="norm2")(hidden) * (1 + scale2[:, None]) + shift2[:, None]
        e = LayerNorm(dtype=self.dtype, name="norm2_context")(encoder_hidden) * (1 + enc_scale2[:, None]) + enc_shift2[:, None]
        x = jnp.concatenate([e, h], axis=1)
        x = LoRADense(4 * self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_0_proj")(x)
        x = nn.gelu(x, approximate=True)
        x = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_2")(x)
        encoder_hidden = encoder_hidden + enc_gate2[:, None] * x[:, :st]
        hidden = hidden + gate2[:, None] * x[:, st:]
        return hidden, encoder_hidden


class CogView4Transformer2DModel(nn.Module):
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    num_layers: int = 28
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    condition_dim: int = 256
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    use_scan: Optional[bool] = None
    gradient_checkpointing: Optional[str] = None

    def scan_stacks(self):
        if not resolve_use_scan(self.use_scan, self.num_layers):
            return []
        return [("transformer_blocks", self.num_layers, scan_group_size(self.gradient_checkpointing))]

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # (B, C, H, W)
        encoder_hidden_states: jax.Array,  # (B, L, text_embed_dim)
        timestep: jax.Array,  # (B,)
        original_size: Optional[jax.Array] = None,  # (B, 2)
        target_size: Optional[jax.Array] = None,  # (B, 2)
        crop_coords: Optional[jax.Array] = None,  # (B, 2)
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim
        b, c, h, w = hidden_states.shape
        p = self.patch_size
        ph, pw = h // p, w // p

        x = hidden_states.reshape(b, c, ph, p, pw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, ph * pw, c * p * p)
        x = LoRADense(inner, dtype=self.dtype, name="patch_embed_proj")(x.astype(self.dtype))
        context = LoRADense(inner, dtype=self.dtype, name="patch_embed_text_proj")(
            encoder_hidden_states.astype(self.dtype))

        # Timestep + SDXL-style microconditioning
        t_emb = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), self.condition_dim)
        cond_parts = [t_emb]
        for tensor in (original_size, target_size, crop_coords):
            if tensor is None:
                tensor = jnp.zeros((b, 2), jnp.float32)
            emb = sinusoidal_timestep_embedding(tensor.reshape(-1).astype(jnp.float32), self.condition_dim)
            cond_parts.append(emb.reshape(b, -1))
        cond = jnp.concatenate(cond_parts, axis=-1)
        temb = LoRADense(self.time_embed_dim, dtype=self.dtype, name="time_condition_embed_linear_1")(
            cond.astype(self.dtype))
        temb = nn.silu(temb)
        temb = LoRADense(self.time_embed_dim, dtype=self.dtype, name="time_condition_embed_linear_2")(temb)

        freqs = axial_rope_freqs(self.attention_head_dim, (ph, pw), (0.5, 0.5))

        x, context = block_stack(
            CogView4Block,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 time_embed_dim=self.time_embed_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            (x, context),
            broadcast_args=(temb, freqs),
            broadcast_kinds=("batched", "static"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="transformer_blocks",
            parent=self,
        )

        mod = LoRADense(2 * inner, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm_out_ln")(x) * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(self.out_channels * p * p, dtype=self.dtype, name="proj_out")(x)

        x = x.reshape(b, ph, pw, self.out_channels, p, p)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, self.out_channels, h, w)
        return x.astype(jnp.float32)
