"""HunyuanVideo DiT in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `HunyuanVideoTransformer3DModel` (reference spec
`finetrainers/models/hunyuan_video/base_specification.py`): MMDiT with 20 dual-
stream + 40 single-stream blocks (structurally the Flux blocks — reused from
`models/flux/transformer.py`), a 2-block token refiner over the Llama prompt
embeddings, CLIP pooled conditioning, guidance embedding (distilled model),
3D RoPE over (frame, row, col) video token coordinates, patchify (1, 2, 2).
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
    block_stack,
    resolve_use_scan,
    scan_group_size,
    sinusoidal_timestep_embedding,
)
from ..flux.transformer import FluxDualBlock, FluxSingleBlock, flux_rope_freqs


class TokenRefinerBlock(nn.Module):
    """Self-attention block over text tokens, gated by (timestep + pooled-text) emb."""

    dim: int
    num_heads: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cond, kv_lens=None):
        b, s, _ = x.shape
        hd = self.dim // self.num_heads
        mod = LoRADense(2 * self.dim, dtype=self.dtype, name="norm_out_linear")(nn.silu(cond))
        gate_attn, gate_mlp = jnp.split(mod, 2, axis=-1)

        h = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="norm1")(x)
        q = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_q")(h)
        k = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_k")(h)
        v = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn_to_v")(h)
        q = q.reshape(b, s, self.num_heads, hd)
        k = k.reshape(b, s, self.num_heads, hd)
        v = v.reshape(b, s, self.num_heads, hd)
        attn = attention_dispatch(q, k, v, kv_lens=kv_lens).reshape(b, s, self.dim)
        attn = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                         name="attn_to_out")(attn)
        x = x + attn * gate_attn[:, None]

        h = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="norm2")(x)
        h = LoRADense(4 * self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_0_proj")(h)
        h = nn.silu(h)
        h = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_2")(h)
        return x + h * gate_mlp[:, None]


class HunyuanVideoTransformer3DModel(nn.Module):
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    patch_size_t: int = 1
    num_attention_heads: int = 24
    attention_head_dim: int = 128
    num_layers: int = 20
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
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
        hidden_states: jax.Array,  # (B, C, F, H, W)
        encoder_hidden_states: jax.Array,  # (B, L, text_embed_dim) — Llama hidden states
        timestep: jax.Array,  # (B,)
        pooled_projections: jax.Array,  # (B, pooled_projection_dim) — CLIP pooled
        encoder_attention_mask: Optional[jax.Array] = None,  # (B, L)
        guidance: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim
        b, c, f, h, w = hidden_states.shape
        p, pt = self.patch_size, self.patch_size_t
        pf_, phh, pww = f // pt, h // p, w // p

        x = hidden_states.reshape(b, c, pf_, pt, phh, p, pww, p)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(b, pf_ * phh * pww, c * pt * p * p)
        x = LoRADense(inner, dtype=self.dtype, name="x_embedder")(x.astype(self.dtype))

        # Timestep + guidance + pooled conditioning
        t_emb = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), 256)
        temb = LoRADense(inner, dtype=self.dtype, name="timestep_embedder_linear_1")(t_emb.astype(self.dtype))
        temb = LoRADense(inner, dtype=self.dtype, name="timestep_embedder_linear_2")(nn.silu(temb))
        if self.guidance_embeds:
            g = guidance if guidance is not None else jnp.full_like(timestep, 6.0) * 1000.0
            g_emb = sinusoidal_timestep_embedding(g.astype(jnp.float32), 256)
            ge = LoRADense(inner, dtype=self.dtype, name="guidance_embedder_linear_1")(g_emb.astype(self.dtype))
            ge = LoRADense(inner, dtype=self.dtype, name="guidance_embedder_linear_2")(nn.silu(ge))
            temb = temb + ge
        pe = LoRADense(inner, dtype=self.dtype, name="text_embedder_linear_1")(
            pooled_projections.astype(self.dtype))
        pe = LoRADense(inner, dtype=self.dtype, name="text_embedder_linear_2")(nn.silu(pe))
        temb = temb + pe

        # Token refiner over the Llama hidden states
        txt = LoRADense(inner, dtype=self.dtype, name="context_embedder_proj_in")(
            encoder_hidden_states.astype(self.dtype))
        kv_lens = None
        if encoder_attention_mask is not None:
            kv_lens = (encoder_attention_mask.astype(jnp.int32).sum(axis=1)
                       if encoder_attention_mask.ndim == 2 else encoder_attention_mask.astype(jnp.int32))
        refine_t = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), 256)
        rc = LoRADense(inner, dtype=self.dtype, name="refiner_t_embedder_linear_1")(refine_t.astype(self.dtype))
        rc = LoRADense(inner, dtype=self.dtype, name="refiner_t_embedder_linear_2")(nn.silu(rc))
        # pooled context conditioning: mean over valid tokens
        if kv_lens is not None:
            token_mask = (jnp.arange(txt.shape[1])[None, :] < kv_lens[:, None]).astype(txt.dtype)[..., None]
            ctx_pool = (txt * token_mask).sum(axis=1) / jnp.maximum(token_mask.sum(axis=1), 1.0)
        else:
            ctx_pool = txt.mean(axis=1)
        rp = LoRADense(inner, dtype=self.dtype, name="refiner_c_embedder_linear_1")(ctx_pool)
        rp = LoRADense(inner, dtype=self.dtype, name="refiner_c_embedder_linear_2")(nn.silu(rp))
        refine_cond = rc + rp
        for i in range(self.num_refiner_layers):
            txt = TokenRefinerBlock(
                inner, self.num_attention_heads, lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                dtype=self.dtype, name=f"refiner_blocks_{i}",
            )(txt, refine_cond, kv_lens=kv_lens)

        # 3D rope ids: (frame, row, col)
        ids = jnp.zeros((pf_ * phh * pww, 3))
        grid_f = jnp.repeat(jnp.arange(pf_), phh * pww)
        grid_h = jnp.tile(jnp.repeat(jnp.arange(phh), pww), pf_)
        grid_w = jnp.tile(jnp.arange(pww), pf_ * phh)
        img_ids = jnp.stack([grid_f, grid_h, grid_w], axis=-1).astype(jnp.float32)
        txt_ids = jnp.zeros((txt.shape[1], 3))
        freqs = flux_rope_freqs(jnp.concatenate([txt_ids, img_ids], axis=0), self.rope_axes_dim)

        x, txt = block_stack(
            FluxDualBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            (x, txt),
            broadcast_args=(temb, freqs),
            broadcast_kinds=("batched", "static"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="transformer_blocks",
            parent=self,
        )
        full = jnp.concatenate([txt, x], axis=1)
        full = block_stack(
            FluxSingleBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_single_layers,
            full,
            broadcast_args=(temb, freqs),
            broadcast_kinds=("batched", "static"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="single_transformer_blocks",
            parent=self,
        )
        x = full[:, txt.shape[1]:]

        mod = LoRADense(2 * inner, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm_out_ln")(x) * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(self.out_channels * pt * p * p, dtype=self.dtype, name="proj_out")(x)

        x = x.reshape(b, pf_, phh, pww, self.out_channels, pt, p, p)
        x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(b, self.out_channels, f, h, w)
        return x.astype(jnp.float32)
