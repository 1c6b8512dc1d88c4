"""LTX-Video DiT in flax.

Faithful reimplementation of the architecture the reference trains through
diffusers' `LTXVideoTransformer3DModel` (reference spec:
`finetrainers/models/ltx_video/base_specification.py`; per-token-timestep patch at
`patches/models/ltx_video/patch.py:38-127` — here per-token timesteps are native).

Structure (packed-token stream, patch_size 1x1x1 by default):
  proj_in -> [N x block: adaLN(self-attn w/ 3D RoPE + rms-qk-norm) ->
  cross-attn(no pre-norm, LTX quirk) -> adaLN(MLP)] -> norm_out+mod -> proj_out.
Per-block `scale_shift_table` (6, dim) combines with the shared AdaLayerNormSingle
timestep embedding; supports per-token timesteps (B, S) natively.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import (
    LoRADense,
    LoRAProjParams,
    RMSNorm,
    block_stack,
    resolve_use_scan,
    scan_group_size,
    sinusoidal_timestep_embedding,
)
from ...ops import attention_dispatch


class LTXAdaLayerNormSingle(nn.Module):
    """PixArt-style single adaLN: timestep -> (temb 6*dim, embedded_timestep dim).
    Accepts (B,) or per-token (B, S) timesteps."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, timestep: jax.Array) -> Tuple[jax.Array, jax.Array]:
        shape = timestep.shape
        flat = timestep.reshape(-1)
        emb = sinusoidal_timestep_embedding(flat, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        emb = LoRADense(self.dim, dtype=self.dtype, name="timestep_embedder_linear_1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        embedded_timestep = LoRADense(self.dim, dtype=self.dtype, name="timestep_embedder_linear_2")(emb)
        temb = LoRADense(6 * self.dim, dtype=self.dtype, name="linear")(nn.silu(embedded_timestep))
        temb = temb.reshape(*shape, 6 * self.dim)
        embedded_timestep = embedded_timestep.reshape(*shape, self.dim)
        return temb, embedded_timestep


class LTXRotaryPosEmbed(nn.Module):
    """3D RoPE over (frame, row, col) token coordinates, exact diffusers
    `LTXVideoRotaryPosEmbed` semantics: computed over the FULL inner dim
    (applied before the head split), `dim//6` log-spaced frequencies 1..theta
    scaled by pi/2, positions mapped to (2*pos_normalized - 1), frequency slots
    interleaved per-axis as (f_k, h_k, w_k) triples, and `dim % 6` identity
    slots prepended."""

    dim: int  # full inner dim (num_heads * head_dim)
    patch_size: int = 1
    patch_size_t: int = 1
    base_num_frames: int = 20
    base_height: int = 2048
    base_width: int = 2048
    theta: float = 10000.0

    def __call__(
        self, num_frames: int, height: int, width: int,
        rope_interpolation_scale: Sequence[float],
    ) -> Tuple[jax.Array, jax.Array]:
        import numpy as np

        # All inputs are static (Python ints/floats), so the table is computed in
        # numpy float64 at trace time: phases reach theta*pi/2 ~ 1.6e4 rad, where
        # float32 phase rounding already perturbs cos/sin by ~1e-2. XLA sees the
        # f32 result as a constant.
        # Token grid over the latent dims in (f, h, w) row-major order, matching
        # _pack_latents (diffusers builds the same grid via meshgrid(indexing="ij")).
        gf, gh, gw = np.meshgrid(
            np.arange(num_frames, dtype=np.float64),
            np.arange(height, dtype=np.float64),
            np.arange(width, dtype=np.float64),
            indexing="ij",
        )
        grid = np.stack([gf.reshape(-1), gh.reshape(-1), gw.reshape(-1)], axis=-1)  # (S, 3)
        scale = np.asarray(
            [
                rope_interpolation_scale[0] * self.patch_size_t / self.base_num_frames,
                rope_interpolation_scale[1] * self.patch_size / self.base_height,
                rope_interpolation_scale[2] * self.patch_size / self.base_width,
            ],
            np.float64,
        )
        grid = grid * scale[None, :]

        n = self.dim // 6
        # theta ** linspace(log_theta(1), log_theta(theta), n) == theta ** linspace(0, 1, n)
        freqs = self.theta ** np.linspace(0.0, 1.0, n, dtype=np.float64)
        freqs = freqs * (np.pi / 2.0)
        freqs = freqs[None, None, :] * (grid[:, :, None] * 2.0 - 1.0)  # (S, 3, n)
        freqs = np.swapaxes(freqs, -1, -2).reshape(grid.shape[0], -1)  # (S, 3n): (f_k,h_k,w_k) triples
        cos = np.repeat(np.cos(freqs), 2, axis=-1)
        sin = np.repeat(np.sin(freqs), 2, axis=-1)
        pad = self.dim % 6
        if pad:
            cos = np.concatenate([np.ones((cos.shape[0], pad)), cos], axis=-1)
            sin = np.concatenate([np.zeros((sin.shape[0], pad)), sin], axis=-1)
        return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def apply_ltx_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair rotation on the full inner dim (diffusers
    `apply_rotary_emb` in transformer_ltx; reference TP-compat copy at
    `patches/models/ltx_video/patch.py:24-35`). x: (B, S, D); cos/sin: (S, D)."""
    x32 = x.astype(jnp.float32)
    pairs = x32.reshape(*x.shape[:-1], -1, 2)
    rotated = jnp.stack([-pairs[..., 1], pairs[..., 0]], axis=-1).reshape(x32.shape)
    return (x32 * cos[None] + rotated * sin[None]).astype(x.dtype)


class LTXAttention(nn.Module):
    """LTX attention: qk RMS-norm applied across the full inner dim
    ("rms_norm_across_heads"), biases on q/k/v/out.

    TPU-first layout of the hot path:
      - Self-attention fuses the q/k/v base kernels into ONE (D, 3D) matmul and
        the three LoRA A factors into one (D, 3r) matmul (same param tree as
        three LoRADense modules — `LoRAProjParams` declares identical leaves).
        The wide matmuls keep the MXU busy where three narrow ones stall on
        weight streaming, and autodiff still only touches LoRA factors.
      - RoPE is NOT applied here: the (cos, sin) tables go to
        `attention_dispatch(rope_freqs=...)` and are applied inside the Pallas
        flash kernels (fwd + transpose-rotation in bwd), so rotated q/k never
        round-trip through HBM (profiled: the XLA interleave rotation cost more
        per step than the flash forward itself).
    """

    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None, freqs=None, kv_lens=None):
        inner = self.num_heads * self.head_dim
        b, sq = x.shape[0], x.shape[1]
        if context is None:
            in_features = x.shape[-1]
            wq, bq, aq, b2q = LoRAProjParams(in_features, inner, rank=self.lora_rank, name="to_q")()
            wk, bk, ak, b2k = LoRAProjParams(in_features, inner, rank=self.lora_rank, name="to_k")()
            wv, bv, av, b2v = LoRAProjParams(in_features, inner, rank=self.lora_rank, name="to_v")()
            xc = x.astype(self.dtype)
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(self.dtype)
            y = jnp.dot(xc, w) + jnp.concatenate([bq, bk, bv]).astype(self.dtype)
            if self.lora_rank > 0:
                scaling = self.lora_alpha / self.lora_rank
                a = jnp.concatenate([aq, ak, av], axis=1).astype(self.dtype)
                ya = jnp.dot(xc, a)  # (B, S, 3r)
                deltas = [
                    jnp.dot(ya[..., i * self.lora_rank:(i + 1) * self.lora_rank], f.astype(self.dtype))
                    for i, f in enumerate((b2q, b2k, b2v))
                ]
                y = y + scaling * jnp.concatenate(deltas, axis=-1).astype(y.dtype)
            q, k, v = jnp.split(y, 3, axis=-1)
            skv = sq
        else:
            q = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_q")(x)
            k = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_k")(context)
            v = LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_v")(context)
            skv = k.shape[1]
        q = RMSNorm(dtype=self.dtype, name="norm_q")(q)
        k = RMSNorm(dtype=self.dtype, name="norm_k")(k)
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, skv, self.num_heads, self.head_dim)
        v = v.reshape(b, skv, self.num_heads, self.head_dim)
        # diffusers applies RoPE on the full inner dim BEFORE the head split;
        # pairs never cross head boundaries, so per-head application inside the
        # kernel is exact.
        out = attention_dispatch(q, k, v, kv_lens=kv_lens, rope_freqs=freqs)
        out = out.reshape(b, sq, inner)
        return LoRADense(inner, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype, name="to_out")(out)


class LTXTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context, temb, freqs, encoder_kv_lens=None):
        # scale_shift_table (6, dim) + temb (B, S|1, 6*dim). Slice temb FIRST,
        # then add in fp32 per modulation: same math as reshaping the whole temb
        # to fp32 and splitting, but the (B, S, 6, dim) fp32 intermediate (132MB
        # at flagship scale, re-materialized per block in fwd AND the remat
        # backward) never exists.
        table = self.param("scale_shift_table", nn.initializers.normal(self.dim**-0.5), (6, self.dim), jnp.float32)
        t6 = temb.reshape(temb.shape[0], -1, 6, self.dim)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            (table[i][None, None] + t6[:, :, i].astype(jnp.float32)).astype(self.dtype)
            for i in range(6)
        ]

        h = RMSNorm(elementwise_affine=False, dtype=self.dtype, name="norm1")(x)
        h = h * (1.0 + scale_msa) + shift_msa
        h = LTXAttention(self.num_heads, self.head_dim, self.lora_rank, self.lora_alpha,
                        dtype=self.dtype, name="attn1")(h, freqs=freqs)
        x = x + h * gate_msa

        # LTX quirk: cross-attention has no pre-norm.
        h = LTXAttention(self.num_heads, self.head_dim, self.lora_rank, self.lora_alpha,
                        dtype=self.dtype, name="attn2")(x, context=context, kv_lens=encoder_kv_lens)
        x = x + h

        h = RMSNorm(elementwise_affine=False, dtype=self.dtype, name="norm2")(x)
        h = h * (1.0 + scale_mlp) + shift_mlp
        h = LoRADense(4 * self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_0_proj")(h)
        h = nn.gelu(h, approximate=True)
        h = LoRADense(self.dim, rank=self.lora_rank, alpha=self.lora_alpha, dtype=self.dtype,
                      name="ff_net_2")(h)
        x = x + h * gate_mlp
        return x


class LTXVideoTransformer3DModel(nn.Module):
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_attention_heads: int = 32
    attention_head_dim: int = 64
    cross_attention_dim: int = 2048
    num_layers: int = 28
    caption_channels: int = 4096
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    # scan-over-layers (None = auto for deep stacks) + per-block remat policy
    # (None | "full" | "ops" | "block_skip") — see models/layers.block_stack.
    use_scan: Optional[bool] = None
    gradient_checkpointing: Optional[str] = None

    def scan_stacks(self):
        if not resolve_use_scan(self.use_scan, self.num_layers):
            return []
        return [("transformer_blocks", self.num_layers, scan_group_size(self.gradient_checkpointing))]

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,  # packed tokens (B, S, in_channels*p*p*pt)
        encoder_hidden_states: jax.Array,  # (B, L, caption_channels)
        timestep: jax.Array,  # (B,) or (B, S) in [0, 1000)
        encoder_attention_mask: Optional[jax.Array] = None,  # (B, L) bool / kv_lens (B,)
        num_frames: int = 1,
        height: int = 1,
        width: int = 1,
        rope_interpolation_scale: Sequence[float] = (1.0, 32.0, 32.0),
    ) -> jax.Array:
        inner = self.num_attention_heads * self.attention_head_dim
        x = LoRADense(inner, dtype=self.dtype, name="proj_in")(hidden_states.astype(self.dtype))

        temb, embedded_timestep = LTXAdaLayerNormSingle(inner, dtype=self.dtype, name="time_embed")(
            timestep.astype(jnp.float32)
        )

        context = LoRADense(inner, dtype=self.dtype, name="caption_projection_linear_1")(
            encoder_hidden_states.astype(self.dtype)
        )
        context = nn.gelu(context, approximate=True)
        context = LoRADense(inner, dtype=self.dtype, name="caption_projection_linear_2")(context)

        kv_lens = None
        if encoder_attention_mask is not None:
            if encoder_attention_mask.ndim == 2:
                kv_lens = encoder_attention_mask.astype(jnp.int32).sum(axis=1)
            else:
                kv_lens = encoder_attention_mask.astype(jnp.int32)

        freqs = LTXRotaryPosEmbed(
            dim=inner, patch_size=self.patch_size, patch_size_t=self.patch_size_t,
            name="rope",
        )(num_frames, height, width, rope_interpolation_scale)

        x = block_stack(
            LTXTransformerBlock,
            dict(dim=inner, num_heads=self.num_attention_heads, head_dim=self.attention_head_dim,
                 lora_rank=self.lora_rank, lora_alpha=self.lora_alpha, dtype=self.dtype),
            self.num_layers,
            x,
            broadcast_args=(context, temb, freqs, kv_lens),
            broadcast_kinds=("batched", "batched", "static", "batched"),
            use_scan=self.use_scan,
            checkpoint=self.gradient_checkpointing,
            list_name="transformer_blocks",
            parent=self,
        )

        table = self.param("scale_shift_table", nn.initializers.normal(inner**-0.5), (2, inner), jnp.float32)
        emb_t = embedded_timestep.reshape(embedded_timestep.shape[0], -1, inner).astype(jnp.float32)
        shift = (table[0][None, None] + emb_t).astype(self.dtype)
        scale = (table[1][None, None] + emb_t).astype(self.dtype)
        x = RMSNorm(elementwise_affine=False, dtype=self.dtype, name="norm_out")(x)
        x = x * (1.0 + scale) + shift
        x = LoRADense(
            self.out_channels * self.patch_size * self.patch_size * self.patch_size_t,
            dtype=self.dtype, name="proj_out",
        )(x)
        return x.astype(jnp.float32)


def pack_latents(latents: jax.Array, patch_size: int = 1, patch_size_t: int = 1) -> jax.Array:
    """(B, C, F, H, W) -> (B, F/pt * H/p * W/p, C*pt*p*p) (reference
    `_pack_latents`, ltx base_specification.py:438-459)."""
    b, c, f, h, w = latents.shape
    pf, ph, pw = f // patch_size_t, h // patch_size, w // patch_size
    x = latents.reshape(b, c, pf, patch_size_t, ph, patch_size, pw, patch_size)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, pf * ph * pw, c * patch_size_t * patch_size * patch_size)


def unpack_latents(
    packed: jax.Array, num_frames: int, height: int, width: int,
    patch_size: int = 1, patch_size_t: int = 1,
) -> jax.Array:
    b, s, d = packed.shape
    pf, ph, pw = num_frames // patch_size_t, height // patch_size, width // patch_size
    c = d // (patch_size_t * patch_size * patch_size)
    x = packed.reshape(b, pf, ph, pw, c, patch_size_t, patch_size, patch_size)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, c, num_frames, height, width)
