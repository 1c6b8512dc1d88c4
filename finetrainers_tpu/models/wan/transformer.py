"""Wan 2.1 DiT in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `WanTransformer3DModel` (reference spec `finetrainers/models/wan/
base_specification.py`; T2V/I2V auto-detection via `image_dim` at :240-256).

Structure: 3D patch embed (1,2,2) -> [N x block: adaLN(self-attn w/ 3D RoPE,
per-head rms QK norm) -> LayerNorm cross-attn to text (+ separate image-KV
branch for I2V) -> adaLN(GELU MLP)] -> norm_out + table modulation -> proj_out.
Per-block scale_shift_table (6, dim) combined with the shared (B, 6*dim) temb.
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
    RMSNorm,
    block_stack,
    resolve_use_scan,
    scan_group_size,
    sinusoidal_timestep_embedding,
)


def wan_rope_freqs(head_dim: int, num_frames: int, height: int, width: int,
                   theta: float = 10000.0) -> Tuple[jax.Array, jax.Array]:
    """3D axial RoPE: h/w get ~1/3 of slots each, t the rest (Wan split;
    exact slot allocation via the shared helper)."""
    from ..layers import axial_rope_freqs

    return axial_rope_freqs(head_dim, (num_frames, height, width), (1 / 3, 1 / 3, 1 / 3), theta)


def _apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, N, H); freqs (S, H/2); rotate interleaved pairs (complex convention)."""
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class WanAttention(nn.Module):
    num_heads: int
    head_dim: int
    has_image_kv: bool = False  # I2V: extra K/V projections over image embeds
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, context=None, freqs=None, kv_lens=None, image_context=None):
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_q")(x)
        k = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_k")(ctx)
        v = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_v")(ctx)
        q = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_q")(q)
        k = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_k")(k)
        b, sq = q.shape[0], q.shape[1]
        skv = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, skv, self.num_heads, self.head_dim)
        v = v.reshape(b, skv, self.num_heads, self.head_dim)
        rope = None
        if freqs is not None:
            # repeat-2 expanded (S, H) shared tables: flash-family providers
            # rotate q/k inside the Pallas kernels; others fall back in XLA.
            cos, sin = freqs
            rope = (jnp.repeat(cos, 2, axis=-1), jnp.repeat(sin, 2, axis=-1))
        out = attention_dispatch(q, k, v, kv_lens=kv_lens, rope_freqs=rope)
        if self.has_image_kv and image_context is not None:
            k_img = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                              name="add_k_proj")(image_context)
            v_img = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                              name="add_v_proj")(image_context)
            k_img = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_added_k")(k_img)
            s_img = k_img.shape[1]
            k_img = k_img.reshape(b, s_img, self.num_heads, self.head_dim)
            v_img = v_img.reshape(b, s_img, self.num_heads, self.head_dim)
            out = out + attention_dispatch(q, k_img, v_img)
        out = out.reshape(b, sq, inner)
        return LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_out")(out)


class WanTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    ffn_dim: int
    has_image_kv: bool = False
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, temb, freqs, encoder_kv_lens=None, image_context=None):
        # temb: (B, 6, dim) — NOT per-token (unlike LTX)
        table = self.param("scale_shift_table", nn.initializers.normal(self.dim**-0.5), (1, 6, self.dim), jnp.float32)
        ada = (table + temb.astype(jnp.float32))
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            a[:, 0][:, None].astype(self.dtype) for a in jnp.split(ada, 6, axis=1)
        ]

        h = LayerNorm(elementwise_affine=False, dtype=self.dtype, name="norm1")(x)
        h = h * (1.0 + scale_msa) + shift_msa
        h = WanAttention(self.num_heads, self.head_dim, lora_rank=self.lora_rank,
                         lora_alpha=self.lora_alpha, dtype=self.dtype, name="attn1")(h, freqs=freqs)
        x = x + h * gate_msa

        h = LayerNorm(elementwise_affine=True, use_bias=True, dtype=self.dtype, name="norm2")(x)
        h = WanAttention(self.num_heads, self.head_dim, has_image_kv=self.has_image_kv,
                         lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype,
                         name="attn2")(h, context=context, kv_lens=encoder_kv_lens, image_context=image_context)
        x = x + h

        h = LayerNorm(elementwise_affine=False, dtype=self.dtype, name="norm3")(x)
        h = h * (1.0 + c_scale) + c_shift
        h = LoRADense(self.ffn_dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ffn_net_0_proj")(h)
        h = nn.gelu(h, approximate=True)
        h = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ffn_net_2")(h)
        x = x + h * c_gate
        return x


class WanTransformer3DModel(nn.Module):
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 12
    attention_head_dim: int = 128
    num_layers: int = 30
    ffn_dim: int = 8960
    text_dim: int = 4096
    freq_dim: int = 256
    image_dim: Optional[int] = None  # set (e.g. 1280) for I2V
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    use_scan: Optional[bool] = None
    gradient_checkpointing: Optional[str] = None

    def scan_stacks(self):
        if not resolve_use_scan(self.use_scan, self.num_layers):
            return []
        return [("blocks", self.num_layers, scan_group_size(self.gradient_checkpointing))]

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # (B, C, F, H, W)
        encoder_hidden_states: jax.Array,  # (B, L, text_dim)
        timestep: jax.Array,  # (B,)
        encoder_hidden_states_image: Optional[jax.Array] = None,  # (B, Li, image_dim)
        encoder_attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim
        b, c, f, h, w = hidden_states.shape
        pt, ph, pw = self.patch_size
        pf_, phh, pww = f // pt, h // ph, w // pw

        # 3D patch embedding
        x = hidden_states.reshape(b, c, pf_, pt, phh, ph, pww, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, pf_ * phh * pww, c * pt * ph * pw)
        x = LoRADense(inner, dtype=self.dtype, name="patch_embedding")(x.astype(self.dtype))

        # Condition embedder
        temb_sin = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), self.freq_dim)
        temb = LoRADense(inner, dtype=self.dtype, name="condition_embedder_time_embedder_linear_1")(
            temb_sin.astype(self.dtype))
        temb = nn.silu(temb)
        temb = LoRADense(inner, dtype=self.dtype, name="condition_embedder_time_embedder_linear_2")(temb)
        temb_proj = LoRADense(6 * inner, dtype=self.dtype, name="condition_embedder_time_proj")(nn.silu(temb))
        temb_proj = temb_proj.reshape(b, 6, inner)

        context = LoRADense(inner, dtype=self.dtype, name="condition_embedder_text_embedder_linear_1")(
            encoder_hidden_states.astype(self.dtype))
        context = nn.gelu(context, approximate=True)
        context = LoRADense(inner, dtype=self.dtype, name="condition_embedder_text_embedder_linear_2")(context)

        image_context = None
        if self.image_dim is not None and encoder_hidden_states_image is not None:
            ic = LayerNorm(elementwise_affine=True, dtype=self.dtype,
                           name="condition_embedder_image_embedder_norm1")(
                encoder_hidden_states_image.astype(self.dtype))
            ic = LoRADense(inner, dtype=self.dtype, name="condition_embedder_image_embedder_ff_1")(ic)
            ic = nn.gelu(ic, approximate=True)
            ic = LoRADense(inner, dtype=self.dtype, name="condition_embedder_image_embedder_ff_2")(ic)
            image_context = LayerNorm(elementwise_affine=True, dtype=self.dtype,
                                      name="condition_embedder_image_embedder_norm2")(ic)

        kv_lens = None
        if encoder_attention_mask is not None:
            kv_lens = (encoder_attention_mask.astype(jnp.int32).sum(axis=1)
                       if encoder_attention_mask.ndim == 2 else encoder_attention_mask.astype(jnp.int32))

        freqs = wan_rope_freqs(self.attention_head_dim, pf_, phh, pww)

        x = block_stack(
            WanTransformerBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 ffn_dim=self.ffn_dim, has_image_kv=self.image_dim is not None,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            x,
            broadcast_args=(context, temb_proj, freqs, kv_lens, image_context),
            broadcast_kinds=("batched", "batched", "static", "batched", "batched"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="blocks",
            parent=self,
        )

        table = self.param("scale_shift_table", nn.initializers.normal(inner**-0.5), (1, 2, inner), jnp.float32)
        mod = table + temb[:, None].astype(jnp.float32)  # (B, 2, inner)
        shift, scale = mod[:, 0][:, None].astype(self.dtype), mod[:, 1][:, None].astype(self.dtype)
        x = LayerNorm(elementwise_affine=False, dtype=self.dtype, name="norm_out")(x)
        x = x * (1.0 + scale) + shift
        x = LoRADense(self.out_channels * pt * ph * pw, dtype=self.dtype, name="proj_out")(x)

        # Unpatchify
        x = x.reshape(b, pf_, phh, pww, self.out_channels, pt, ph, pw)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(b, self.out_channels, f, h, w)
        return x.astype(jnp.float32)
