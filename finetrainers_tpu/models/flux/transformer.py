"""Flux DiT (MMDiT dual-stream + single-stream) in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `FluxTransformer2DModel` (reference spec `finetrainers/models/flux/
base_specification.py`; pack/unpack + latent image ids at :315-342).

Structure: packed 2x2 latent tokens + T5 text tokens; 19 dual-stream blocks
(separate img/txt streams, joint attention, AdaLayerNormZero per stream), then
38 single-stream blocks (fused qkv+mlp projection over the concatenated stream,
AdaLayerNormZeroSingle), AdaLayerNormContinuous out. Conditioned on timestep +
CLIP pooled text (+ guidance embedding for the distilled checkpoints).
RoPE over (id0, y, x) coordinate ids with axes dims (16, 56, 56) by default.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

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


def flux_rope_freqs(ids: jax.Array, axes_dims: Sequence[int], theta: float = 10000.0):
    """ids: (S, n_axes) float; per-axis rotary freqs concatenated to head_dim/2."""
    parts = []
    for i, adim in enumerate(axes_dims):
        inv = 1.0 / (theta ** (jnp.arange(0, adim, 2, dtype=jnp.float32) / adim))
        parts.append(ids[:, i : i + 1] * inv[None, :])
    freqs = jnp.concatenate(parts, axis=-1)
    return jnp.cos(freqs), jnp.sin(freqs)


def _rope_tables(cos, sin):
    """(S, H/2) complex-convention tables -> repeat-2 (S, H) for
    attention_dispatch's fused/fallback interleaved rotation."""
    return jnp.repeat(cos, 2, axis=-1), jnp.repeat(sin, 2, axis=-1)


def _rope(x, cos, sin):
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., 0::2], x32[..., 1::2]
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    return jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(x.shape).astype(x.dtype)


class AdaLayerNormZero(nn.Module):
    """silu(temb) -> 6*dim modulation params."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, temb):
        mod = LoRADense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        return jnp.split(mod, 6, axis=-1)  # shift, scale, gate, shift_mlp, scale_mlp, gate_mlp


class FluxDualBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    mlp_ratio: float = 4.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img, txt, temb, freqs):
        n, hd = self.num_heads, self.head_dim
        b, si = img.shape[:2]
        st = txt.shape[1]
        shift_i, scale_i, gate_i, shift_im, scale_im, gate_im = AdaLayerNormZero(
            self.dim, self.dtype, name="norm1")(temb)
        shift_t, scale_t, gate_t, shift_tm, scale_tm, gate_tm = AdaLayerNormZero(
            self.dim, self.dtype, name="norm1_context")(temb)

        img_n = LayerNorm(dtype=self.dtype, name="ln_img")(img) * (1 + scale_i[:, None]) + shift_i[:, None]
        txt_n = LayerNorm(dtype=self.dtype, name="ln_txt")(txt) * (1 + scale_t[:, None]) + shift_t[:, None]

        def qkv(x, qn, kn, vn, nqn, nkn):
            q = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name=qn)(x)
            k = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name=kn)(x)
            v = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name=vn)(x)
            q = q.reshape(b, -1, n, hd)
            k = k.reshape(b, -1, n, hd)
            v = v.reshape(b, -1, n, hd)
            q = RMSNorm(dtype=self.dtype, name=nqn)(q)
            k = RMSNorm(dtype=self.dtype, name=nkn)(k)
            return q, k, v

        qi, ki, vi = qkv(img_n, "attn_to_q", "attn_to_k", "attn_to_v", "attn_norm_q", "attn_norm_k")
        qt, kt, vt = qkv(txt_n, "attn_add_q_proj", "attn_add_k_proj", "attn_add_v_proj",
                         "attn_norm_added_q", "attn_norm_added_k")
        q = jnp.concatenate([qt, qi], axis=1)
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        out = attention_dispatch(q, k, v, rope_freqs=_rope_tables(*freqs)).reshape(b, st + si, n * hd)
        txt_attn, img_attn = out[:, :st], out[:, st:]
        img_attn = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                             name="attn_to_out")(img_attn)
        txt_attn = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                             name="attn_to_add_out")(txt_attn)
        img = img + gate_i[:, None] * img_attn
        txt = txt + gate_t[:, None] * txt_attn

        mlp_dim = int(self.dim * self.mlp_ratio)
        img_m = LayerNorm(dtype=self.dtype, name="ln_img2")(img) * (1 + scale_im[:, None]) + shift_im[:, None]
        img_m = LoRADense(mlp_dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                          name="ff_net_0_proj")(img_m)
        img_m = nn.gelu(img_m, approximate=True)
        img_m = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                          name="ff_net_2")(img_m)
        img = img + gate_im[:, None] * img_m

        txt_m = LayerNorm(dtype=self.dtype, name="ln_txt2")(txt) * (1 + scale_tm[:, None]) + shift_tm[:, None]
        txt_m = LoRADense(mlp_dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                          name="ff_context_net_0_proj")(txt_m)
        txt_m = nn.gelu(txt_m, approximate=True)
        txt_m = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                          name="ff_context_net_2")(txt_m)
        txt = txt + gate_tm[:, None] * txt_m
        return img, txt


class FluxSingleBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    mlp_ratio: float = 4.0
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb, freqs):
        n, hd = self.num_heads, self.head_dim
        b, s = x.shape[:2]
        mlp_dim = int(self.dim * self.mlp_ratio)
        mod = LoRADense(3 * self.dim, dtype=self.dtype, name="norm_linear")(nn.silu(temb))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        x_n = LayerNorm(dtype=self.dtype, name="ln")(x) * (1 + scale[:, None]) + shift[:, None]

        q = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_q")(x_n)
        k = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_k")(x_n)
        v = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_v")(x_n)
        q = RMSNorm(dtype=self.dtype, name="attn_norm_q")(q.reshape(b, s, n, hd))
        k = RMSNorm(dtype=self.dtype, name="attn_norm_k")(k.reshape(b, s, n, hd))
        v = v.reshape(b, s, n, hd)
        attn = attention_dispatch(q, k, v, rope_freqs=_rope_tables(*freqs)).reshape(b, s, n * hd)

        mlp = LoRADense(mlp_dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                        name="proj_mlp")(x_n)
        mlp = nn.gelu(mlp, approximate=True)
        out = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                        name="proj_out")(jnp.concatenate([attn, mlp], axis=-1))
        return x + gate[:, None] * out


class FluxTransformer2DModel(nn.Module):
    in_channels: int = 64  # packed 2x2 of 16-ch latents
    num_layers: int = 19
    num_single_layers: int = 38
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    pooled_projection_dim: int = 768
    joint_attention_dim: int = 4096
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    use_scan: Optional[bool] = None
    gradient_checkpointing: Optional[str] = None

    def scan_stacks(self):
        group = scan_group_size(self.gradient_checkpointing)
        stacks = []
        if resolve_use_scan(self.use_scan, self.num_layers):
            stacks.append(("transformer_blocks", self.num_layers, group))
        if resolve_use_scan(self.use_scan, self.num_single_layers):
            stacks.append(("single_transformer_blocks", self.num_single_layers, group))
        return stacks

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # (B, S_img, in_channels) packed latents
        encoder_hidden_states: jax.Array,  # (B, S_txt, joint_attention_dim)
        pooled_projections: jax.Array,  # (B, pooled_projection_dim)
        timestep: jax.Array,  # (B,) in [0, 1] * 1000
        img_ids: jax.Array,  # (S_img, 3)
        txt_ids: jax.Array,  # (S_txt, 3)
        guidance: Optional[jax.Array] = None,  # (B,)
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim

        img = LoRADense(inner, dtype=self.dtype, name="x_embedder")(hidden_states.astype(self.dtype))
        txt = LoRADense(inner, dtype=self.dtype, name="context_embedder")(
            encoder_hidden_states.astype(self.dtype))

        t_emb = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), 256,
                                              flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = LoRADense(inner, dtype=self.dtype, name="timestep_embedder_linear_1")(t_emb.astype(self.dtype))
        temb = LoRADense(inner, dtype=self.dtype, name="timestep_embedder_linear_2")(nn.silu(temb))
        if self.guidance_embeds:
            g = guidance if guidance is not None else jnp.full_like(timestep, 3.5) * 1000.0
            g_emb = sinusoidal_timestep_embedding(g.astype(jnp.float32), 256,
                                                  flip_sin_to_cos=True, downscale_freq_shift=0.0)
            ge = LoRADense(inner, dtype=self.dtype, name="guidance_embedder_linear_1")(g_emb.astype(self.dtype))
            ge = LoRADense(inner, dtype=self.dtype, name="guidance_embedder_linear_2")(nn.silu(ge))
            temb = temb + ge
        pe = LoRADense(inner, dtype=self.dtype, name="text_embedder_linear_1")(
            pooled_projections.astype(self.dtype))
        pe = LoRADense(inner, dtype=self.dtype, name="text_embedder_linear_2")(nn.silu(pe))
        temb = temb + pe

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        freqs = flux_rope_freqs(ids.astype(jnp.float32), self.axes_dims_rope)

        img, txt = block_stack(
            FluxDualBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            (img, txt),
            broadcast_args=(temb, freqs),
            broadcast_kinds=("batched", "static"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="transformer_blocks",
            parent=self,
        )

        x = jnp.concatenate([txt, img], axis=1)
        x = block_stack(
            FluxSingleBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_single_layers,
            x,
            broadcast_args=(temb, freqs),
            broadcast_kinds=("batched", "static"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="single_transformer_blocks",
            parent=self,
        )
        img = x[:, txt.shape[1] :]

        mod = LoRADense(2 * inner, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        img = LayerNorm(dtype=self.dtype, name="norm_out_ln")(img) * (1 + scale[:, None]) + shift[:, None]
        img = LoRADense(self.in_channels, dtype=self.dtype, name="proj_out")(img)
        return img.astype(jnp.float32)


def pack_flux_latents(latents: jax.Array) -> jax.Array:
    """(B, C, H, W) -> (B, H/2*W/2, C*4) (FluxPipeline._pack_latents semantics)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_flux_latents(packed: jax.Array, height: int, width: int) -> jax.Array:
    b, s, d = packed.shape
    c = d // 4
    x = packed.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, height, width)


def prepare_latent_image_ids(height: int, width: int) -> jax.Array:
    """(H/2 * W/2, 3) ids: (0, row, col) (FluxPipeline._prepare_latent_image_ids)."""
    h, w = height // 2, width // 2
    ids = jnp.zeros((h, w, 3))
    ids = ids.at[..., 1].add(jnp.arange(h)[:, None])
    ids = ids.at[..., 2].add(jnp.arange(w)[None, :])
    return ids.reshape(h * w, 3)
