"""Faithful LTX-Video causal 3D VAE (diffusers `AutoencoderKLLTXVideo`, 0.9.0
config family) in flax.

Architecture and key names mirror the diffusers implementation the reference
encodes through (`/root/reference/finetrainers/models/ltx_video/base_specification.py:260-280`):

  encoder.conv_in.conv | encoder.down_blocks.{i}.{resnets.{j}, downsamplers.0.conv,
  conv_out} | encoder.mid_block.resnets.{j} | encoder.conv_out.conv |
  decoder.conv_in.conv | decoder.mid_block | decoder.up_blocks.{i}.{conv_in,
  upsamplers.0.conv.conv, resnets.{j}} | decoder.conv_out.conv

Semantics:
  - LTXVideoCausalConv3d wraps nn.Conv3d as `.conv` (keys carry the extra
    level); temporal padding is REPLICATE — causal (front kt-1) in the encoder,
    symmetric in the (non-causal) decoder; spatial SAME zero padding.
  - RMSNorm has elementwise_affine=False: no norm parameters anywhere.
  - Encoder: pixel-unshuffle patchify (p=4, pt=1; channel order (c, pt, p, q)
    major->minor), stride-(2,2,2) downsampler convs, and the shared-logvar
    quirk: conv_out emits latent_channels+1 channels and the last channel is
    repeated to form the logvar half of the moments.
  - Decoder: mid first, up blocks = conv_in resnet -> upsampler (conv to
    8C + 3D depth-to-space, trimming the leading stride_t-1 frames) -> resnets,
    then conv_out + unpatchify.
  - 1 + 8k input frames -> 1 + k latent frames; 32x spatial (4 patchify x 2^3).

Layout: NDHWC internally, NCDHW at the public boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LTXVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    decoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    decoder_layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    decoder_spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    patch_size: int = 4
    patch_size_t: int = 1
    resnet_norm_eps: float = 1e-6
    encoder_causal: bool = True
    decoder_causal: bool = False
    scaling_factor: float = 1.0

    @classmethod
    def from_hf(cls, cfg: dict) -> "LTXVAEConfig":
        return cls(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 128),
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
            decoder_block_out_channels=tuple(
                cfg.get("decoder_block_out_channels", cfg.get("block_out_channels", (128, 256, 512, 512)))
            ),
            layers_per_block=tuple(cfg.get("layers_per_block", (4, 3, 3, 3, 4))),
            decoder_layers_per_block=tuple(
                cfg.get("decoder_layers_per_block", cfg.get("layers_per_block", (4, 3, 3, 3, 4)))
            ),
            spatio_temporal_scaling=tuple(cfg.get("spatio_temporal_scaling", (True, True, True, False))),
            decoder_spatio_temporal_scaling=tuple(
                cfg.get("decoder_spatio_temporal_scaling",
                        cfg.get("spatio_temporal_scaling", (True, True, True, False)))
            ),
            patch_size=cfg.get("patch_size", 4),
            patch_size_t=cfg.get("patch_size_t", 1),
            resnet_norm_eps=cfg.get("resnet_norm_eps", 1e-6),
            encoder_causal=cfg.get("encoder_causal", True),
            decoder_causal=cfg.get("decoder_causal", False),
            scaling_factor=cfg.get("scaling_factor", 1.0),
        )

    @property
    def spatial_compression_ratio(self) -> int:
        return self.patch_size * 2 ** sum(self.spatio_temporal_scaling)

    @property
    def temporal_compression_ratio(self) -> int:
        return self.patch_size_t * 2 ** sum(self.spatio_temporal_scaling)


def _rms_norm(x: jax.Array, eps: float) -> jax.Array:
    """diffusers RMSNorm(elementwise_affine=False) over the channel axis."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LTXCausalConv3d(nn.Module):
    """diffusers LTXVideoCausalConv3d: replicate temporal padding (causal =
    front-only), SAME spatial zero padding; wraps the conv as `.conv`."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    is_causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel_size
        if kt > 1:
            if self.is_causal:
                front = jnp.repeat(x[:, :1], kt - 1, axis=1)
                x = jnp.concatenate([front, x], axis=1)
            else:
                front = jnp.repeat(x[:, :1], (kt - 1) // 2, axis=1)
                back = jnp.repeat(x[:, -1:], kt // 2, axis=1)
                x = jnp.concatenate([front, x, back], axis=1)
        if kh > 1 or kw > 1:
            x = jnp.pad(x, ((0, 0), (0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)


class LTXResnetBlock3d(nn.Module):
    in_dim: int
    out_dim: int
    eps: float = 1e-6
    is_causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _rms_norm(x, self.eps)
        h = nn.silu(h)
        h = LTXCausalConv3d(self.out_dim, is_causal=self.is_causal, dtype=self.dtype, name="conv1")(h)
        h = _rms_norm(h, self.eps)
        h = nn.silu(h)
        h = LTXCausalConv3d(self.out_dim, is_causal=self.is_causal, dtype=self.dtype, name="conv2")(h)
        if self.in_dim != self.out_dim:
            x = LTXCausalConv3d(self.out_dim, (1, 1, 1), is_causal=self.is_causal,
                                dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class LTXDownBlock3D(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    spatio_temporal_scale: bool
    eps: float = 1e-6
    is_causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.num_layers):
            x = LTXResnetBlock3d(self.in_dim, self.in_dim, self.eps, self.is_causal,
                                 self.dtype, name=f"resnets_{j}")(x)
        if self.spatio_temporal_scale:
            x = LTXCausalConv3d(self.in_dim, (3, 3, 3), strides=(2, 2, 2),
                                is_causal=self.is_causal, dtype=self.dtype,
                                name="downsamplers_0")(x)
        if self.in_dim != self.out_dim:
            x = LTXResnetBlock3d(self.in_dim, self.out_dim, self.eps, self.is_causal,
                                 self.dtype, name="conv_out")(x)
        return x


class LTXMidBlock3d(nn.Module):
    dim: int
    num_layers: int
    eps: float = 1e-6
    is_causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for j in range(self.num_layers):
            x = LTXResnetBlock3d(self.dim, self.dim, self.eps, self.is_causal,
                                 self.dtype, name=f"resnets_{j}")(x)
        return x


class LTXUpsampler3d(nn.Module):
    """conv to C*8, 3D depth-to-space by (2,2,2), trim the leading frame."""

    dim: int
    is_causal: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        st, sh, sw = 2, 2, 2
        y = LTXCausalConv3d(self.dim * st * sh * sw, (3, 3, 3), is_causal=self.is_causal,
                            dtype=self.dtype, name="conv")(x)
        # torch: rearrange "b (c p1 p2 p3) f h w -> b c (f p1) (h p2) (w p3)"
        # channel order (c, p1, p2, p3) major->minor.
        y = y.reshape(b, t, hh, ww, self.dim, st, sh, sw)
        y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, t, p1, h, p2, w, p3, c
        y = y.reshape(b, t * st, hh * sh, ww * sw, self.dim)
        return y[:, st - 1:]


class LTXUpBlock3d(nn.Module):
    in_dim: int
    out_dim: int
    num_layers: int
    spatio_temporal_scale: bool
    eps: float = 1e-6
    is_causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.in_dim != self.out_dim:
            x = LTXResnetBlock3d(self.in_dim, self.out_dim, self.eps, self.is_causal,
                                 self.dtype, name="conv_in")(x)
        if self.spatio_temporal_scale:
            x = LTXUpsampler3d(self.out_dim, self.is_causal, self.dtype, name="upsamplers_0")(x)
        for j in range(self.num_layers):
            x = LTXResnetBlock3d(self.out_dim, self.out_dim, self.eps, self.is_causal,
                                 self.dtype, name=f"resnets_{j}")(x)
        return x


def _patchify(x: jax.Array, p: int, pt: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T/pt, H/p, W/p, C*pt*p*p), channel order
    (c, pt, p, q) major->minor — matches the diffusers encoder rearrange."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pt, pt, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b, t', h', w', c, pt, p, q
    return x.reshape(b, t // pt, h // p, w // p, c * pt * p * p)


def _unpatchify(x: jax.Array, p: int, pt: int, out_channels: int) -> jax.Array:
    b, t, h, w, _ = x.shape
    x = x.reshape(b, t, h, w, out_channels, pt, p, p)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b, t, pt, h, p, w, q, c
    return x.reshape(b, t * pt, h * p, w * p, out_channels)


class LTXEncoder3d(nn.Module):
    config: LTXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        causal = cfg.encoder_causal
        x = _patchify(x, cfg.patch_size, cfg.patch_size_t)
        x = LTXCausalConv3d(cfg.block_out_channels[0], is_causal=causal, dtype=self.dtype,
                            name="conv_in")(x)
        n = len(cfg.block_out_channels)
        out_ch = cfg.block_out_channels[0]
        for i in range(n):
            in_ch = out_ch
            out_ch = cfg.block_out_channels[i + 1] if i + 1 < n else cfg.block_out_channels[-1]
            x = LTXDownBlock3D(
                in_ch, out_ch, cfg.layers_per_block[i], cfg.spatio_temporal_scaling[i],
                cfg.resnet_norm_eps, causal, self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = LTXMidBlock3d(out_ch, cfg.layers_per_block[-1], cfg.resnet_norm_eps, causal,
                          self.dtype, name="mid_block")(x)
        x = _rms_norm(x, cfg.resnet_norm_eps)
        x = nn.silu(x)
        x = LTXCausalConv3d(cfg.latent_channels + 1, is_causal=causal, dtype=self.dtype,
                            name="conv_out")(x)
        # Shared-logvar quirk: the (latent+1)-channel output's last channel is
        # repeated latent-1 times so moments = (mean x128, logvar x128 all equal).
        last = x[..., -1:]
        return jnp.concatenate([x, jnp.repeat(last, cfg.latent_channels - 1, axis=-1)], axis=-1)


class LTXDecoder3d(nn.Module):
    config: LTXVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        causal = cfg.decoder_causal
        channels = tuple(reversed(cfg.decoder_block_out_channels))
        scaling = tuple(reversed(cfg.decoder_spatio_temporal_scaling))
        layers = tuple(reversed(cfg.decoder_layers_per_block))
        x = LTXCausalConv3d(channels[0], is_causal=causal, dtype=self.dtype, name="conv_in")(z)
        x = LTXMidBlock3d(channels[0], layers[0], cfg.resnet_norm_eps, causal,
                          self.dtype, name="mid_block")(x)
        n = len(channels)
        out_ch = channels[0]
        for i in range(n):
            in_ch = out_ch
            out_ch = channels[i + 1] if i + 1 < n else channels[-1]
            x = LTXUpBlock3d(
                in_ch, out_ch, layers[i + 1], scaling[i], cfg.resnet_norm_eps, causal,
                self.dtype, name=f"up_blocks_{i}",
            )(x)
        x = _rms_norm(x, cfg.resnet_norm_eps)
        x = nn.silu(x)
        x = LTXCausalConv3d(
            cfg.out_channels * cfg.patch_size_t * cfg.patch_size ** 2,
            is_causal=causal, dtype=self.dtype, name="conv_out",
        )(x)
        return _unpatchify(x, cfg.patch_size, cfg.patch_size_t, cfg.out_channels)


class AutoencoderKLLTXVideo(nn.Module):
    """Public boundary NCDHW (B, C, T, H, W), T = 1 + 8k frames."""

    config: LTXVAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = LTXEncoder3d(self.config, self.dtype)
        self.decoder = LTXDecoder3d(self.config, self.dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        """(B, 3, 1+8k, H, W) -> moments (B, 2*128, 1+k, H/32, W/32)."""
        h = jnp.moveaxis(x.astype(self.dtype), 1, -1)
        # LTX pads T to 1 + ceil((T-1)/8)*8 on the host side; here T must
        # already satisfy 1 mod 8 (the data pipeline buckets guarantee it).
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


def ltx_vae_key_map(flax_key: str) -> str:
    """flax param path -> diffusers AutoencoderKLLTXVideo key. LTX's causal conv
    WRAPS nn.Conv3d (`.conv.weight` level is real, unlike Wan)."""
    import re

    key = flax_key
    key = key.replace("downsamplers_0", "downsamplers.0")
    key = key.replace("upsamplers_0", "upsamplers.0")
    key = re.sub(r"\b(down_blocks|up_blocks|resnets)_(\d+)", r"\1.\2", key)
    key = key.replace(".kernel", ".weight")
    return key


def load_ltx_vae_params(state_dict, abstract_params):
    from ..wan.vae import _transpose_conv_kernels
    from ..weight_utils import torch_state_dict_to_flax

    state = _transpose_conv_kernels(state_dict, abstract_params, ltx_vae_key_map)
    return torch_state_dict_to_flax(state, abstract_params, key_map=ltx_vae_key_map)


def export_ltx_vae_state_dict(params):
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
        out[ltx_vae_key_map(k)] = np.ascontiguousarray(value)
    return out
