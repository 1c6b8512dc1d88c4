"""CogVideoX DiT in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `CogVideoXTransformer3DModel` (reference spec
`finetrainers/models/cogvideox/base_specification.py`; RoPE helper at
`models/cogvideox/utils.py:8`).

Joint [text, vision] token stream; CogVideoXLayerNormZero modulation (separate
shift/scale/gate for the text and vision halves from one temb linear), LayerNorm
QK-norm, learned positional embeddings (2B) or 3D RoPE (5B). Latents are
frames-first (B, F, C, H, W) like the reference. The model predicts velocity.
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


def cogvideox_rope_freqs(head_dim: int, num_frames: int, height: int, width: int,
                         theta: float = 10000.0) -> Tuple[jax.Array, jax.Array]:
    """3D rope over (t, h, w): ~1/4 of slots temporal, rest split h/w
    (diffusers get_3d_rotary_pos_embed proportions; exact slot allocation)."""
    from ..layers import axial_rope_freqs

    return axial_rope_freqs(head_dim, (num_frames, height, width), (0.25, 0.375, 0.375), theta)


def _rope_interleaved(x, cos, sin):
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., 0::2], x32[..., 1::2]
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    return jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).reshape(x.shape).astype(x.dtype)


class CogVideoXLayerNormZero(nn.Module):
    """temb -> 6 params: (shift, scale, gate) for vision + (shift, scale, gate)
    for text; applies affine-free LN then modulation to both streams."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb):
        mod = LoRADense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(temb))
        shift, scale, gate, enc_shift, enc_scale, enc_gate = jnp.split(mod, 6, axis=-1)
        h = LayerNorm(dtype=self.dtype, name="norm")(hidden)
        e = LayerNorm(dtype=self.dtype, name="norm_enc")(encoder_hidden)
        h = h * (1 + scale[:, None]) + shift[:, None]
        e = e * (1 + enc_scale[:, None]) + enc_shift[:, None]
        return h, e, gate[:, None], enc_gate[:, None]


class CogVideoXBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    time_embed_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden, encoder_hidden, temb, freqs=None):
        b = hidden.shape[0]
        st = encoder_hidden.shape[1]
        n, hd = self.num_heads, self.head_dim

        h, e, gate, enc_gate = CogVideoXLayerNormZero(self.dim, self.dtype, name="norm1")(
            hidden, encoder_hidden, temb)
        x = jnp.concatenate([e, h], axis=1)
        q = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_q")(x)
        k = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_k")(x)
        v = LoRADense(n * hd, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="attn1_to_v")(x)
        s = x.shape[1]
        q = q.reshape(b, s, n, hd)
        k = k.reshape(b, s, n, hd)
        v = v.reshape(b, s, n, hd)
        q = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="attn1_norm_q")(q)
        k = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="attn1_norm_k")(k)
        rope = None
        if freqs is not None:
            # RoPE applies only to the vision tokens: prepend identity rows
            # (cos=1, sin=0) for the text prefix so the whole joint stream goes
            # through one fused rotation in the attention kernel.
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
        enc_attn, vis_attn = attn[:, :st], attn[:, st:]
        hidden = hidden + gate * vis_attn
        encoder_hidden = encoder_hidden + enc_gate * enc_attn

        h, e, gate, enc_gate = CogVideoXLayerNormZero(self.dim, self.dtype, name="norm2")(
            hidden, encoder_hidden, temb)
        x = jnp.concatenate([e, h], axis=1)
        x = LoRADense(4 * self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_0_proj")(x)
        x = nn.gelu(x, approximate=True)
        x = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_2")(x)
        enc_ff, vis_ff = x[:, :st], x[:, st:]
        hidden = hidden + gate * vis_ff
        encoder_hidden = encoder_hidden + enc_gate * enc_ff
        return hidden, encoder_hidden


class CogVideoXTransformer3DModel(nn.Module):
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    patch_size_t: Optional[int] = None
    num_attention_heads: int = 30
    attention_head_dim: int = 64
    num_layers: int = 30
    text_embed_dim: int = 4096
    time_embed_dim: int = 512
    max_text_seq_length: int = 226
    sample_frames: int = 49
    sample_height: int = 60
    sample_width: int = 90
    use_rotary_positional_embeddings: bool = False
    use_learned_positional_embeddings: bool = True
    ofs_embed_dim: Optional[int] = None
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
        hidden_states: jax.Array,  # (B, F, C, H, W) — frames-first like reference
        encoder_hidden_states: jax.Array,  # (B, L, text_embed_dim)
        timestep: jax.Array,  # (B,)
        ofs: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim
        b, f, c, h, w = hidden_states.shape
        p = self.patch_size
        pt = self.patch_size_t or 1
        ph, pw = h // p, w // p
        pf = f // pt

        # Patchify: 2D patches per frame (1.0) or 3D patches (1.5, patch_size_t=2).
        x = hidden_states.reshape(b, pf, pt, c, ph, p, pw, p)
        x = x.transpose(0, 1, 4, 6, 2, 3, 5, 7).reshape(b, pf * ph * pw, pt * c * p * p)
        x = LoRADense(inner, dtype=self.dtype, name="patch_embed_proj")(x.astype(self.dtype))
        context = LoRADense(inner, dtype=self.dtype, name="patch_embed_text_proj")(
            encoder_hidden_states.astype(self.dtype))

        if self.use_learned_positional_embeddings and not self.use_rotary_positional_embeddings:
            max_tokens = self.max_text_seq_length + (
                self.sample_frames // 4 + 1) * (self.sample_height // p) * (self.sample_width // p)
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (1, max_tokens, inner), jnp.float32)
            st = context.shape[1]
            context = context + pos[:, :st].astype(self.dtype)
            x = x + pos[:, self.max_text_seq_length : self.max_text_seq_length + x.shape[1]].astype(self.dtype)

        t_emb = sinusoidal_timestep_embedding(timestep.astype(jnp.float32), inner,
                                              flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = LoRADense(self.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_1")(
            t_emb.astype(self.dtype))
        temb = nn.silu(temb)
        temb = LoRADense(self.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_2")(temb)
        if self.ofs_embed_dim is not None and ofs is not None:
            o_emb = sinusoidal_timestep_embedding(ofs.astype(jnp.float32), self.ofs_embed_dim,
                                                  flip_sin_to_cos=True, downscale_freq_shift=0.0)
            oe = LoRADense(self.time_embed_dim, dtype=self.dtype, name="ofs_embedding_linear_1")(
                o_emb.astype(self.dtype))
            oe = LoRADense(self.time_embed_dim, dtype=self.dtype, name="ofs_embedding_linear_2")(nn.silu(oe))
            temb = temb + oe

        freqs = None
        if self.use_rotary_positional_embeddings:
            freqs = cogvideox_rope_freqs(self.attention_head_dim, pf, ph, pw)

        x, context = block_stack(
            CogVideoXBlock,
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

        full = jnp.concatenate([context, x], axis=1)
        full = LayerNorm(elementwise_affine=True, dtype=self.dtype, name="norm_final")(full)
        x = full[:, context.shape[1]:]

        mod = LoRADense(2 * inner, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = LayerNorm(dtype=self.dtype, name="norm_out_ln")(x) * (1 + scale[:, None]) + shift[:, None]
        x = LoRADense(self.out_channels * pt * p * p, dtype=self.dtype, name="proj_out")(x)

        # Unpatchify back to (B, F, C, H, W)
        x = x.reshape(b, pf, ph, pw, pt, self.out_channels, p, p)
        x = x.transpose(0, 1, 4, 5, 2, 6, 3, 7).reshape(b, f, self.out_channels, h, w)
        return x.astype(jnp.float32)
