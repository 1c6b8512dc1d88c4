"""Faithful HunyuanVideo causal 3D VAE (diffusers `AutoencoderKLHunyuanVideo`)
in flax.

Architecture and key names mirror the diffusers implementation the reference
encodes through (`/root/reference/finetrainers/models/hunyuan_video/base_specification.py`
prepare_latents):

  encoder.conv_in.conv | encoder.down_blocks.{i}.{resnets.{j}.{norm1,conv1.conv,
  norm2,conv2.conv,conv_shortcut.conv}, downsamplers.0.conv.conv} |
  encoder.mid_block.{resnets.{j}, attentions.0.{group_norm,to_q,to_k,to_v,to_out.0}}
  | encoder.conv_norm_out | encoder.conv_out.conv | quant_conv | post_quant_conv
  | decoder.(conv_in.conv, mid_block, up_blocks.{i}.{resnets, upsamplers.0.conv.conv},
  conv_norm_out, conv_out.conv)

Semantics:
  - HunyuanVideoCausalConv3d wraps nn.Conv3d as `.conv`; temporal padding is
    front-only REPLICATE (causal), spatial symmetric zero.
  - GroupNorm normalizes over (T, H, W, C/g) like torch (whole-clip statistics
    — the torch VAE is causal through its convs only).
  - Encoder: 3 spatial downsamples (blocks 0-2), 2 temporal (blocks 1-2) →
    8x spatial / 4x temporal, 1+4k -> 1+k frames via stride-2 causal convs.
  - Decoder upsample: first frame is upsampled spatially only, the rest
    spatio-temporally (1+k -> 1+2k per temporal stage), then a 3x3x3 conv.
  - Mid blocks carry one single-head SD-style attention over (T*H*W) tokens.

Layout: NDHWC internally, NCDHW public.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.476986
    spatial_compression_ratio: int = 8
    temporal_compression_ratio: int = 4
    mid_block_add_attention: bool = True

    @classmethod
    def from_hf(cls, cfg: dict) -> "HunyuanVAEConfig":
        return cls(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 16),
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.476986),
            spatial_compression_ratio=cfg.get("spatial_compression_ratio", 8),
            temporal_compression_ratio=cfg.get("temporal_compression_ratio", 4),
            mid_block_add_attention=cfg.get("mid_block_add_attention", True),
        )


def _group_norm(groups: int, channels: int, dtype, name: str):
    return nn.GroupNorm(num_groups=min(groups, channels), epsilon=1e-6, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class HunyuanCausalConv3d(nn.Module):
    """Wraps the conv as `.conv` (torch key parity); replicate causal time pad."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel_size
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        if kh > 1 or kw > 1:
            x = jnp.pad(x, ((0, 0), (0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel_size, strides=self.strides, padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class HunyuanResnetBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _group_norm(self.groups, self.in_dim, self.dtype, "norm1")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.silu(h)
        h = HunyuanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(h)
        h = _group_norm(self.groups, self.out_dim, self.dtype, "norm2")(h.astype(jnp.float32)).astype(h.dtype)
        h = nn.silu(h)
        h = HunyuanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(h)
        if self.in_dim != self.out_dim:
            x = HunyuanCausalConv3d(self.out_dim, (1, 1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class HunyuanAttentionBlock(nn.Module):
    """SD-style single-head attention over all (T*H*W) tokens."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        res = x
        y = _group_norm(self.groups, c, self.dtype, "group_norm")(x.astype(jnp.float32)).astype(x.dtype)
        y = y.reshape(b, t * hh * ww, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(y), dense("to_k")(y), dense("to_v")(y)
        scale = c ** -0.5
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)), axis=-1
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(self.dtype)
        y = dense("to_out_0")(y)
        return res + y.reshape(b, t, hh, ww, c)


class HunyuanMidBlock3D(nn.Module):
    dim: int
    groups: int = 32
    add_attention: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = HunyuanResnetBlock3D(self.dim, self.dim, self.groups, self.dtype, name="resnets_0")(x)
        if self.add_attention:
            x = HunyuanAttentionBlock(self.dim, self.groups, self.dtype, name="attentions_0")(x)
        x = HunyuanResnetBlock3D(self.dim, self.dim, self.groups, self.dtype, name="resnets_1")(x)
        return x


class HunyuanDownsample3D(nn.Module):
    dim: int
    stride: Tuple[int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return HunyuanCausalConv3d(self.dim, (3, 3, 3), strides=self.stride,
                                   dtype=self.dtype, name="conv")(x)


class HunyuanUpsample3D(nn.Module):
    dim: int
    temporal: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        if self.temporal and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            first = jax.image.resize(first, (b, 1, hh * 2, ww * 2, c), "nearest")
            rest = jax.image.resize(rest, (b, (t - 1) * 2, hh * 2, ww * 2, c), "nearest")
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = jax.image.resize(x, (b, t, hh * 2, ww * 2, c), "nearest")
        return HunyuanCausalConv3d(self.dim, (3, 3, 3), dtype=self.dtype, name="conv")(x)


class HunyuanDownBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    downsample_stride: Any  # None or (t, h, w)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.in_dim
        for j in range(self.num_layers):
            x = HunyuanResnetBlock3D(ch, self.out_dim, self.groups, self.dtype,
                                     name=f"resnets_{j}")(x)
            ch = self.out_dim
        if self.downsample_stride is not None:
            x = HunyuanDownsample3D(ch, self.downsample_stride, self.dtype,
                                    name="downsamplers_0")(x)
        return x


class HunyuanUpBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    upsample_temporal: Any  # None = no upsampler, else bool (temporal doubling)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.in_dim
        for j in range(self.num_layers):
            x = HunyuanResnetBlock3D(ch, self.out_dim, self.groups, self.dtype,
                                     name=f"resnets_{j}")(x)
            ch = self.out_dim
        if self.upsample_temporal is not None:
            x = HunyuanUpsample3D(ch, temporal=bool(self.upsample_temporal), dtype=self.dtype,
                                  name="upsamplers_0")(x)
        return x


class HunyuanEncoder3D(nn.Module):
    config: HunyuanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        g = cfg.norm_num_groups
        num_spatial = int(np.log2(cfg.spatial_compression_ratio))
        num_time = int(np.log2(cfg.temporal_compression_ratio))
        n = len(cfg.block_out_channels)
        x = HunyuanCausalConv3d(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        ch = cfg.block_out_channels[0]
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == n - 1
            add_spatial = i < num_spatial
            add_time = i >= (n - 1 - num_time) and not is_final
            stride = None
            if add_spatial or add_time:
                stride = (2 if add_time else 1, 2 if add_spatial else 1, 2 if add_spatial else 1)
            x = HunyuanDownBlock3D(ch, out_ch, cfg.layers_per_block, g, stride,
                                   self.dtype, name=f"down_blocks_{i}")(x)
            ch = out_ch
        x = HunyuanMidBlock3D(ch, g, cfg.mid_block_add_attention, self.dtype, name="mid_block")(x)
        x = _group_norm(g, ch, self.dtype, "conv_norm_out")(x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        return HunyuanCausalConv3d(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(x)


class HunyuanDecoder3D(nn.Module):
    config: HunyuanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        g = cfg.norm_num_groups
        channels = tuple(reversed(cfg.block_out_channels))
        num_spatial = int(np.log2(cfg.spatial_compression_ratio))
        num_time = int(np.log2(cfg.temporal_compression_ratio))
        n = len(channels)
        x = HunyuanCausalConv3d(channels[0], dtype=self.dtype, name="conv_in")(z)
        x = HunyuanMidBlock3D(channels[0], g, cfg.mid_block_add_attention, self.dtype,
                              name="mid_block")(x)
        ch = channels[0]
        for i, out_ch in enumerate(channels):
            is_final = i == n - 1
            add_spatial = i < num_spatial
            # diffusers DecoderCausal3D reuses the encoder's placement formula:
            # temporal upsampling sits on the later-indexed (non-final) blocks.
            add_time = i >= (n - 1 - num_time) and not is_final
            upsample = None if (is_final or not (add_spatial or add_time)) else add_time
            x = HunyuanUpBlock3D(ch, out_ch, cfg.layers_per_block + 1, g, upsample,
                                 self.dtype, name=f"up_blocks_{i}")(x)
            ch = out_ch
        x = _group_norm(g, ch, self.dtype, "conv_norm_out")(x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        return HunyuanCausalConv3d(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKLHunyuanVideo(nn.Module):
    """Public boundary NCDHW (B, C, T, H, W), T = 1 + 4k frames."""

    config: HunyuanVAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = HunyuanEncoder3D(self.config, self.dtype)
        self.decoder = HunyuanDecoder3D(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1, 1),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1, 1),
                                       dtype=self.dtype, param_dtype=jnp.float32)

    def encode(self, x: jax.Array) -> jax.Array:
        h = jnp.moveaxis(x.astype(self.dtype), 1, -1)
        moments = self.quant_conv(self.encoder(h))
        return jnp.moveaxis(moments, -1, 1).astype(jnp.float32)

    def decode(self, z: jax.Array) -> jax.Array:
        h = jnp.moveaxis(z.astype(self.dtype), 1, -1)
        out = self.decoder(self.post_quant_conv(h))
        return jnp.moveaxis(out, -1, 1).astype(jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        moments = self.encode(x)
        mean, _ = jnp.split(moments, 2, axis=1)
        return self.decode(mean)


# ------------------------------------------------------------------ conversion


def hunyuan_vae_key_map(flax_key: str) -> str:
    import re

    key = flax_key
    key = key.replace("downsamplers_0", "downsamplers.0")
    key = key.replace("upsamplers_0", "upsamplers.0")
    key = key.replace("to_out_0", "to_out.0")
    key = re.sub(r"\b(down_blocks|up_blocks|resnets|attentions)_(\d+)", r"\1.\2", key)
    key = key.replace(".kernel", ".weight")
    key = re.sub(r"\.scale$", ".weight", key)
    return key


def load_hunyuan_vae_params(state_dict, abstract_params):
    from ..wan.vae import _transpose_conv_kernels
    from ..weight_utils import torch_state_dict_to_flax

    state = _transpose_conv_kernels(state_dict, abstract_params, hunyuan_vae_key_map)
    return torch_state_dict_to_flax(state, abstract_params, key_map=hunyuan_vae_key_map)


def export_hunyuan_vae_state_dict(params):
    from ..modeling_utils import flatten_params

    out = {}
    for k, v in flatten_params(params).items():
        value = np.asarray(v)
        if k.endswith(".kernel") and value.ndim == 5:
            value = np.transpose(value, (4, 3, 0, 1, 2))
        elif k.endswith(".kernel") and value.ndim == 4:
            value = np.transpose(value, (3, 2, 0, 1))
        elif k.endswith(".kernel") and value.ndim == 2:
            value = value.T
        out[hunyuan_vae_key_map(k)] = np.ascontiguousarray(value)
    return out
