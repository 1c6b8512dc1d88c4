"""Faithful CogVideoX causal 3D VAE (diffusers `AutoencoderKLCogVideoX`) in flax.

Architecture and key names mirror the diffusers implementation the reference
encodes through (`/root/reference/finetrainers/models/cogvideox/base_specification.py`
prepare_latents):

  encoder.conv_in.conv | encoder.down_blocks.{i}.{resnets.{j}.{norm1,conv1.conv,
  norm2,conv2.conv,conv_shortcut}, downsamplers.0.conv} | encoder.mid_block |
  encoder.norm_out | encoder.conv_out.conv |
  decoder.conv_in.conv | decoder.mid_block / up_blocks — resnets use the
  zq-conditioned CogVideoXSpatialNorm3D ({norm_layer, conv_y.conv, conv_b.conv})
  | decoder.up_blocks.{i}.upsamplers.0.conv | decoder.norm_out.{...} |
  decoder.conv_out.conv
  (use_quant_conv = use_post_quant_conv = False for CogVideoX.)

Semantics:
  - CogVideoXCausalConv3d wraps nn.Conv3d as `.conv`; temporal padding
    replicates the first frame (kt-1 front), spatial symmetric zero.
  - conv_shortcut is a plain 1x1x1 nn.Conv3d (no `.conv` level).
  - Downsample: temporal pairwise avg-pool of frames 1.. (first frame kept)
    then asymmetric-pad stride-2 2D conv; 1+4k -> 1+k over two stages.
  - Upsample: first frame spatially only, rest nearest x2 in (t,h,w), then a
    3x3 2D conv.
  - Decoder norms: GroupNorm(x) * conv_y(zq) + conv_b(zq) with zq resized to
    the feature map (first frame handled separately).

Layout: NDHWC internally, NCDHW public.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CogVideoXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    temporal_compression_ratio: int = 4
    scaling_factor: float = 1.15258426

    @classmethod
    def from_hf(cls, cfg: dict) -> "CogVideoXVAEConfig":
        return cls(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 16),
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 256, 512))),
            layers_per_block=cfg.get("layers_per_block", 3),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            temporal_compression_ratio=cfg.get("temporal_compression_ratio", 4),
            scaling_factor=cfg.get("scaling_factor", 1.15258426),
        )

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _group_norm(groups: int, channels: int, name: str):
    return nn.GroupNorm(num_groups=min(groups, channels), epsilon=1e-6, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class CogCausalConv3d(nn.Module):
    """Wraps the conv as `.conv`; replicate-first-frame causal time padding."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel_size
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        if kh > 1 or kw > 1:
            x = jnp.pad(x, ((0, 0), (0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
        return nn.Conv(self.features, self.kernel_size, padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class CogSpatialNorm3D(nn.Module):
    """CogVideoXSpatialNorm3D: GroupNorm(f) * conv_y(zq) + conv_b(zq), zq resized
    to f's resolution with the first frame resized separately."""

    f_channels: int
    zq_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f: jax.Array, zq: jax.Array) -> jax.Array:
        b, t, hh, ww, _ = f.shape
        zt = zq.shape[1]
        if zt > 1 and t > 1 and t != zt:
            z_first, z_rest = zq[:, :1], zq[:, 1:]
            z_first = jax.image.resize(z_first, (b, 1, hh, ww, zq.shape[-1]), "nearest")
            z_rest = jax.image.resize(z_rest, (b, t - 1, hh, ww, zq.shape[-1]), "nearest")
            zq = jnp.concatenate([z_first, z_rest], axis=1)
        else:
            zq = jax.image.resize(zq, (b, t, hh, ww, zq.shape[-1]), "nearest")
        norm = _group_norm(self.groups, self.f_channels, "norm_layer")(
            f.astype(jnp.float32)).astype(f.dtype)
        conv_y = CogCausalConv3d(self.f_channels, (1, 1, 1), dtype=self.dtype, name="conv_y")(zq)
        conv_b = CogCausalConv3d(self.f_channels, (1, 1, 1), dtype=self.dtype, name="conv_b")(zq)
        return norm * conv_y + conv_b


class CogResnetBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    groups: int = 32
    spatial_norm_dim: Optional[int] = None  # decoder: zq channels
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, zq: Optional[jax.Array] = None) -> jax.Array:
        def norm(name, channels, h):
            if self.spatial_norm_dim is None:
                return _group_norm(self.groups, channels, name)(
                    h.astype(jnp.float32)).astype(h.dtype)
            return CogSpatialNorm3D(channels, self.spatial_norm_dim, self.groups,
                                    self.dtype, name=name)(h, zq)

        h = norm("norm1", self.in_dim, x)
        h = nn.silu(h)
        h = CogCausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(h)
        h = norm("norm2", self.out_dim, h)
        h = nn.silu(h)
        h = CogCausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(h)
        if self.in_dim != self.out_dim:
            # plain 1x1x1 SafeConv3d (weights live on the module)
            x = nn.Conv(self.out_dim, (1, 1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv_shortcut")(x)
        return x + h


class CogDownsample3D(nn.Module):
    dim: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        if self.compress_time and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            tr = rest.shape[1]
            rest = rest.reshape(b, tr // 2, 2, hh, ww, c).mean(axis=2)
            x = jnp.concatenate([first, rest], axis=1)
            t = x.shape[1]
        flat = x.reshape(b * t, hh, ww, c)
        flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
        flat = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(flat)
        return flat.reshape(b, t, flat.shape[1], flat.shape[2], c)


class CogUpsample3D(nn.Module):
    dim: int
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        if self.compress_time and t > 1:
            first, rest = x[:, :1], x[:, 1:]
            first = jax.image.resize(first, (b, 1, hh * 2, ww * 2, c), "nearest")
            rest = jax.image.resize(rest, (b, (t - 1) * 2, hh * 2, ww * 2, c), "nearest")
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = jax.image.resize(x, (b, t, hh * 2, ww * 2, c), "nearest")
        t2 = x.shape[1]
        flat = x.reshape(b * t2, x.shape[2], x.shape[3], c)
        flat = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(flat)
        return flat.reshape(b, t2, flat.shape[1], flat.shape[2], self.dim)


class CogDownBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    add_downsample: bool
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.in_dim
        for j in range(self.num_layers):
            x = CogResnetBlock3D(ch, self.out_dim, self.groups, None, self.dtype,
                                 name=f"resnets_{j}")(x)
            ch = self.out_dim
        if self.add_downsample:
            x = CogDownsample3D(ch, self.compress_time, self.dtype, name="downsamplers_0")(x)
        return x


class CogUpBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    groups: int
    spatial_norm_dim: int
    add_upsample: bool
    compress_time: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, zq: jax.Array) -> jax.Array:
        ch = self.in_dim
        for j in range(self.num_layers):
            x = CogResnetBlock3D(ch, self.out_dim, self.groups, self.spatial_norm_dim,
                                 self.dtype, name=f"resnets_{j}")(x, zq)
            ch = self.out_dim
        if self.add_upsample:
            x = CogUpsample3D(ch, self.compress_time, self.dtype, name="upsamplers_0")(x)
        return x


class CogVideoXEncoder3D(nn.Module):
    config: CogVideoXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        g = cfg.norm_num_groups
        n = len(cfg.block_out_channels)
        temporal_levels = int(np.log2(cfg.temporal_compression_ratio))
        x = CogCausalConv3d(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        ch = cfg.block_out_channels[0]
        for i, out_ch in enumerate(cfg.block_out_channels):
            x = CogDownBlock3D(
                ch, out_ch, cfg.layers_per_block, g,
                add_downsample=i < n - 1, compress_time=i < temporal_levels,
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
            ch = out_ch
        # mid block: 2 resnets, no attention
        for j in range(2):
            x = CogResnetBlock3D(ch, ch, g, None, self.dtype,
                                 name=f"mid_block_resnets_{j}")(x)
        x = _group_norm(g, ch, "norm_out")(x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        return CogCausalConv3d(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(x)


class CogVideoXDecoder3D(nn.Module):
    config: CogVideoXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        g = cfg.norm_num_groups
        channels = tuple(reversed(cfg.block_out_channels))
        n = len(channels)
        temporal_levels = int(np.log2(cfg.temporal_compression_ratio))
        zq = z
        x = CogCausalConv3d(channels[0], dtype=self.dtype, name="conv_in")(z)
        for j in range(2):
            x = CogResnetBlock3D(channels[0], channels[0], g, cfg.latent_channels,
                                 self.dtype, name=f"mid_block_resnets_{j}")(x, zq)
        ch = channels[0]
        for i, out_ch in enumerate(channels):
            x = CogUpBlock3D(
                ch, out_ch, cfg.layers_per_block + 1, g, cfg.latent_channels,
                add_upsample=i < n - 1, compress_time=i < temporal_levels,
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x, zq)
            ch = out_ch
        x = CogSpatialNorm3D(ch, cfg.latent_channels, g, self.dtype, name="norm_out")(x, zq)
        x = nn.silu(x)
        return CogCausalConv3d(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKLCogVideoX(nn.Module):
    """Public boundary NCDHW (B, C, T, H, W), T = 1 + 4k frames. CogVideoX has
    no quant/post-quant convs."""

    config: CogVideoXVAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = CogVideoXEncoder3D(self.config, self.dtype)
        self.decoder = CogVideoXDecoder3D(self.config, self.dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        h = jnp.moveaxis(x.astype(self.dtype), 1, -1)
        moments = self.encoder(h)
        return jnp.moveaxis(moments, -1, 1).astype(jnp.float32)

    def decode(self, z: jax.Array) -> jax.Array:
        h = jnp.moveaxis(z.astype(self.dtype), 1, -1)
        out = self.decoder(h)
        return jnp.moveaxis(out, -1, 1).astype(jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        moments = self.encode(x)
        mean, _ = jnp.split(moments, 2, axis=1)
        return self.decode(mean)


# ------------------------------------------------------------------ conversion


def cogvideox_vae_key_map(flax_key: str) -> str:
    import re

    key = flax_key
    key = key.replace("mid_block_resnets_", "mid_block.resnets.")
    key = key.replace("downsamplers_0", "downsamplers.0")
    key = key.replace("upsamplers_0", "upsamplers.0")
    key = re.sub(r"\b(down_blocks|up_blocks|resnets)_(\d+)", r"\1.\2", key)
    key = key.replace(".kernel", ".weight")
    key = re.sub(r"\.scale$", ".weight", key)
    return key


def load_cogvideox_vae_params(state_dict, abstract_params):
    from ..wan.vae import _transpose_conv_kernels
    from ..weight_utils import torch_state_dict_to_flax

    state = _transpose_conv_kernels(state_dict, abstract_params, cogvideox_vae_key_map)
    return torch_state_dict_to_flax(state, abstract_params, key_map=cogvideox_vae_key_map)


def export_cogvideox_vae_state_dict(params):
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
        out[cogvideox_vae_key_map(k)] = np.ascontiguousarray(value)
    return out
