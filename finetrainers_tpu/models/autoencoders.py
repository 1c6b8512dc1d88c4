"""Causal 3D (and degenerate 2D) convolutional VAE family.

The reference delegates latent encoding to diffusers' per-model VAEs
(AutoencoderKLLTXVideo / AutoencoderKLWan / AutoencoderKLCogVideoX /
AutoencoderKLHunyuanVideo / AutoencoderKL — reference §2.7, prepare_latents
paths). This module provides one configurable TPU-native implementation:

  - `CausalConv3d`: temporally-causal padding (frame t sees only <= t), SAME
    spatial padding — the shared building block of all the video VAEs.
  - Encoder: conv_in -> per-stage [ResBlock3D x N, optional spatial and/or
    temporal down] -> mid ResBlocks -> GroupNorm/SiLU/conv_out -> 2*latent_ch
    moments. Decoder mirrors with nearest-neighbor upsampling.
  - First-frame causality: temporal compression maps 1 + k*r frames ->
    1 + k latent frames (the 3D causal convention of LTX/Wan/Hunyuan VAEs).

Per-model *weight* parity with the diffusers checkpoints is NOT claimed yet —
each model spec pins a config with the right compression ratios/channel counts
so shapes, memory behavior and the training path are faithful; converter stubs
live with each spec.

Conv layouts are NDHWC internally (TPU-native; channels-last feeds the MXU), with
NCDHW at the public boundary to match the reference's tensor contracts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class CausalConv3d(nn.Module):
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, H, W, C)."""
        kt, kh, kw = self.kernel_size
        # Temporal: causal (pad left with replicated first frame); spatial: SAME.
        if kt > 1:
            front = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([front, x], axis=1)
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        x = jnp.pad(x, ((0, 0), (0, 0), pad_h, pad_w, (0, 0)))
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class GroupNorm(nn.Module):
    """Per-frame GroupNorm: statistics are computed within each frame (time folded
    into batch) — normalizing across time would break the causal property the
    video VAEs rely on."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t = x.shape[0], x.shape[1]
        flat = x.reshape((b * t,) + x.shape[2:])
        out = nn.GroupNorm(num_groups=min(self.num_groups, x.shape[-1]), epsilon=self.eps,
                           dtype=jnp.float32, name="norm")(flat.astype(jnp.float32))
        return out.reshape(x.shape).astype(x.dtype)


class ResBlock3d(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GroupNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = CausalConv3d(self.features, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + h


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    latent_channels: int = 128
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    # Per-stage downsampling flags; len == len(block_out_channels) - 1 entries used.
    spatial_downsample: Tuple[bool, ...] = (True, True, True)
    temporal_downsample: Tuple[bool, ...] = (True, True, True)
    in_channels: int = 3
    scaling_factor: float = 1.0

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** sum(self.spatial_downsample)

    @property
    def temporal_compression_ratio(self) -> int:
        return 2 ** sum(self.temporal_downsample)


class Encoder3d(nn.Module):
    config: AutoencoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        h = CausalConv3d(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, features in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResBlock3d(features, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                st = 2 if cfg.spatial_downsample[i] else 1
                tt = 2 if cfg.temporal_downsample[i] else 1
                if st > 1 or tt > 1:
                    # Causal temporal stride: keep frame 0, stride the rest.
                    if tt > 1:
                        first, rest = h[:, :1], h[:, 1:]
                        rest = CausalConv3d(
                            cfg.block_out_channels[i + 1], (3, 3, 3), strides=(tt, st, st),
                            dtype=self.dtype, name=f"down_{i}_downsample",
                        )(rest)
                        first = nn.Conv(cfg.block_out_channels[i + 1], (1, st, st), strides=(1, st, st),
                                        dtype=self.dtype, name=f"down_{i}_first_frame")(first)
                        h = jnp.concatenate([first, rest], axis=1)
                    else:
                        h = CausalConv3d(
                            cfg.block_out_channels[i + 1], (3, 3, 3), strides=(1, st, st),
                            dtype=self.dtype, name=f"down_{i}_downsample",
                        )(h)
        for j in range(cfg.layers_per_block):
            h = ResBlock3d(cfg.block_out_channels[-1], dtype=self.dtype, name=f"mid_block_{j}")(h)
        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(h)


class Decoder3d(nn.Module):
    config: AutoencoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        channels = list(reversed(cfg.block_out_channels))
        h = CausalConv3d(channels[0], dtype=self.dtype, name="conv_in")(z)
        for j in range(cfg.layers_per_block):
            h = ResBlock3d(channels[0], dtype=self.dtype, name=f"mid_block_{j}")(h)
        up_spatial = list(reversed(cfg.spatial_downsample))
        up_temporal = list(reversed(cfg.temporal_downsample))
        for i, features in enumerate(channels):
            for j in range(cfg.layers_per_block):
                h = ResBlock3d(features, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
            if i < len(channels) - 1:
                st = 2 if up_spatial[i] else 1
                tt = 2 if up_temporal[i] else 1
                if st > 1 or tt > 1:
                    b, t, hh, ww, c = h.shape
                    if tt > 1:
                        # Causal temporal upsample: first frame stays single.
                        first, rest = h[:, :1], h[:, 1:]
                        rest = jnp.repeat(rest, tt, axis=1)
                        h = jnp.concatenate([first, rest], axis=1)
                    if st > 1:
                        h = jnp.repeat(jnp.repeat(h, st, axis=2), st, axis=3)
                    h = CausalConv3d(channels[i + 1], dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(dtype=self.dtype, name="norm_out")(h)
        h = nn.silu(h)
        return CausalConv3d(cfg.in_channels, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL3D(nn.Module):
    """Public boundary uses NCDHW (B, C, T, H, W) like the reference."""

    config: AutoencoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder3d(self.config, dtype=self.dtype)
        self.decoder = Decoder3d(self.config, dtype=self.dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        """(B, C, T, H, W) in [-1,1] -> moments (B, 2*latent, T', H', W')."""
        h = jnp.moveaxis(x.astype(self.dtype), 1, -1)  # NDHWC
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


def encode_sliced(vae_handle, x: jax.Array, slice_size: int = 1) -> jax.Array:
    """Batch-sliced VAE encode (reference --enable_slicing: encode one sample at a
    time to bound peak memory; `vae.use_slicing` path in prepare_latents)."""
    if x.shape[0] <= slice_size:
        return vae_handle.apply(x, method=type(vae_handle.module).encode)
    chunks = [
        vae_handle.apply(x[i : i + slice_size], method=type(vae_handle.module).encode)
        for i in range(0, x.shape[0], slice_size)
    ]
    return jnp.concatenate(chunks, axis=0)


def encode_tiled(
    vae_handle, x: jax.Array, tile: int = 256, overlap: int = 32
) -> jax.Array:
    """Spatially-tiled VAE encode (reference --enable_tiling): encode overlapping
    spatial tiles and blend; bounds activation memory for large resolutions."""
    b, c, t, h, w = x.shape
    if h <= tile and w <= tile:
        return vae_handle.apply(x, method=type(vae_handle.module).encode)
    ratio = vae_handle.config["spatial_compression_ratio"] if hasattr(vae_handle, "config") else 8
    stride = tile - overlap
    out = None
    weight = None
    for y0 in range(0, max(h - overlap, 1), stride):
        for x0 in range(0, max(w - overlap, 1), stride):
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            patch = x[:, :, :, y0:y1, x0:x1]
            enc = vae_handle.apply(patch, method=type(vae_handle.module).encode)
            if out is None:
                lt, lh, lw = enc.shape[2], h // ratio, w // ratio
                out = jnp.zeros((b, enc.shape[1], lt, lh, lw), enc.dtype)
                weight = jnp.zeros((1, 1, 1, lh, lw), enc.dtype)
            ly0, lx0 = y0 // ratio, x0 // ratio
            ly1, lx1 = ly0 + enc.shape[3], lx0 + enc.shape[4]
            out = out.at[:, :, :, ly0:ly1, lx0:lx1].add(enc)
            weight = weight.at[:, :, :, ly0:ly1, lx0:lx1].add(1.0)
    return out / jnp.maximum(weight, 1.0)


def encode_media(vae_handle, x: jax.Array, tile: int = 256, overlap: int = 32) -> jax.Array:
    """Encode (B, C, T, H, W) media through a 3D VAE handle, honoring the
    handle's `use_slicing` / `use_tiling` memory modes (--enable_slicing /
    --enable_tiling; reference `utils/diffusion.py:154-158` + the vae.use_slicing
    branches of each spec's prepare_latents)."""
    x = jnp.asarray(x)
    if getattr(vae_handle, "use_tiling", False) and (x.shape[-2] > tile or x.shape[-1] > tile):
        return encode_tiled(vae_handle, x, tile=tile, overlap=overlap)
    if getattr(vae_handle, "use_slicing", False) and x.shape[0] > 1:
        return encode_sliced(vae_handle, x)
    return vae_handle.apply(x, method=type(vae_handle.module).encode)


def encode_image_vae(vae_handle, x):
    """Encode a (B, C, H, W) image through either the 2D AutoencoderKL or a
    (degenerate single-frame) 3D VAE handle -> moments (B, 2C, H', W')."""
    import jax.numpy as jnp

    from .autoencoder_kl import AutoencoderKL

    if isinstance(vae_handle.module, AutoencoderKL):
        return vae_handle.apply(jnp.asarray(x), method=AutoencoderKL.encode)
    moments = vae_handle.apply(jnp.asarray(x)[:, :, None], method=type(vae_handle.module).encode)
    return moments[:, :, 0]


def decode_image_vae(vae_handle, z):
    """Decode (B, C, H', W') latents -> (B, 3, H, W) via either VAE family."""
    import jax.numpy as jnp

    from .autoencoder_kl import AutoencoderKL

    if isinstance(vae_handle.module, AutoencoderKL):
        return vae_handle.apply(jnp.asarray(z), method=AutoencoderKL.decode)
    out = vae_handle.apply(jnp.asarray(z)[:, :, None], method=type(vae_handle.module).decode)
    return out[:, :, 0]


def sample_from_moments(moments: jax.Array, rng: jax.Array) -> jax.Array:
    """DiagonalGaussian sample; moments (B, 2C, ...) channel-split mean/logvar."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)


# ------------------------------------------------------- per-model configurations

LTX_VAE_CONFIG = AutoencoderConfig(
    latent_channels=128,
    block_out_channels=(128, 256, 512, 512, 512),
    layers_per_block=2,
    spatial_downsample=(True, True, True, True, True),   # 32x spatial
    temporal_downsample=(False, True, True, True, False),  # 8x temporal
)

WAN_VAE_CONFIG = AutoencoderConfig(
    latent_channels=16,
    block_out_channels=(96, 192, 384, 384),
    layers_per_block=2,
    spatial_downsample=(True, True, True),  # 8x spatial
    temporal_downsample=(False, True, True),  # 4x temporal
)

COGVIDEOX_VAE_CONFIG = AutoencoderConfig(
    latent_channels=16,
    block_out_channels=(128, 256, 256, 512),
    layers_per_block=3,
    spatial_downsample=(True, True, True),  # 8x spatial
    temporal_downsample=(False, True, True),  # 4x temporal
)

HUNYUAN_VAE_CONFIG = AutoencoderConfig(
    latent_channels=16,
    block_out_channels=(128, 256, 512, 512),
    layers_per_block=2,
    spatial_downsample=(True, True, True),  # 8x spatial
    temporal_downsample=(False, True, True),  # 4x temporal
)

# 2D image VAEs (Flux / CogView4 / SD-family): temporal-degenerate config.
SD_VAE_CONFIG = AutoencoderConfig(
    latent_channels=16,  # Flux uses 16; CogView4 16
    block_out_channels=(128, 256, 512, 512),
    layers_per_block=2,
    spatial_downsample=(True, True, True),  # 8x spatial
    temporal_downsample=(False, False, False),
)
