"""Faithful 2D AutoencoderKL (the SD/Flux/CogView4 image VAE) in flax.

Architecture and key names mirror diffusers' `AutoencoderKL`
(DownEncoderBlock2D / UpDecoderBlock2D / UNetMidBlock2D with one single-head
attention), so real checkpoints convert exactly:

  encoder.conv_in | encoder.down_blocks.{i}.resnets.{j}.{norm1,conv1,norm2,conv2,
  conv_shortcut} | encoder.down_blocks.{i}.downsamplers.0.conv |
  encoder.mid_block.resnets.{0,1} | encoder.mid_block.attentions.0.{group_norm,
  to_q,to_k,to_v,to_out.0} | encoder.conv_norm_out | encoder.conv_out |
  decoder.(mirrored with up_blocks.{i}.upsamplers.0.conv) |
  quant_conv / post_quant_conv (SD; Flux configs disable both).

Reference usage: `finetrainers/models/flux/base_specification.py` /
`cogview4/base_specification.py` encode through diffusers AutoencoderKL.
Layout: NHWC internally (TPU channels-last), NCHW at the public boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    scaling_factor: float = 0.18215
    shift_factor: Optional[float] = None

    @classmethod
    def from_hf(cls, cfg: dict) -> "AutoencoderKLConfig":
        return cls(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            latent_channels=cfg.get("latent_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            use_quant_conv=cfg.get("use_quant_conv", True),
            use_post_quant_conv=cfg.get("use_post_quant_conv", True),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
            shift_factor=cfg.get("shift_factor"),
        )

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def _group_norm(groups: int, dtype, name: str):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype,
                        param_dtype=jnp.float32, name=name)


def _conv(features: int, kernel: int, stride: int, dtype, name: str, padding="SAME"):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride), padding=padding,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _group_norm(self.groups, self.dtype, "norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, 3, 1, self.dtype, "conv1")(h)
        h = _group_norm(self.groups, self.dtype, "norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, 3, 1, self.dtype, "conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, 1, self.dtype, "conv_shortcut")(x)
        return x + h


class AttentionBlock2D(nn.Module):
    """diffusers Attention as used in the VAE mid block: single head over the
    full channel dim, group-norm, residual."""

    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = _group_norm(self.groups, self.dtype, "group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q = dense("to_q")(y)
        k = dense("to_k")(y)
        v = dense("to_v")(y)
        scale = c ** -0.5
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)),
            axis=-1,
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(self.dtype)
        y = dense("to_out_0")(y)
        return res + y.reshape(b, h, w, c)


class MidBlock2D(nn.Module):
    channels: int
    groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, self.groups, self.dtype, name="resnets_0")(x)
        x = AttentionBlock2D(self.channels, self.groups, self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, self.groups, self.dtype, name="resnets_1")(x)
        return x


class _Downsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers Downsample2D: asymmetric pad (0,1),(0,1), stride-2 VALID
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv(self.channels, 3, 2, self.dtype, "conv", padding="VALID")(x)


class _Upsample2D(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return _conv(self.channels, 3, 1, self.dtype, "conv")(x)


class DownEncoderBlock2D(nn.Module):
    channels: int
    num_layers: int
    groups: int
    add_downsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.channels, self.groups, self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = _Downsample2D(self.channels, self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    channels: int
    num_layers: int
    groups: int
    add_upsample: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.channels, self.groups, self.dtype, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = _Upsample2D(self.channels, self.dtype, name="upsamplers_0")(x)
        return x


class Encoder2D(nn.Module):
    config: AutoencoderKLConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        x = _conv(cfg.block_out_channels[0], 3, 1, self.dtype, "conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock2D(
                ch, cfg.layers_per_block, g,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = MidBlock2D(cfg.block_out_channels[-1], g, self.dtype, name="mid_block")(x)
        x = _group_norm(g, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        return _conv(2 * cfg.latent_channels, 3, 1, self.dtype, "conv_out")(x)


class Decoder2D(nn.Module):
    config: AutoencoderKLConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        x = _conv(reversed_ch[0], 3, 1, self.dtype, "conv_in")(z)
        x = MidBlock2D(reversed_ch[0], g, self.dtype, name="mid_block")(x)
        for i, ch in enumerate(reversed_ch):
            x = UpDecoderBlock2D(
                ch, cfg.layers_per_block + 1, g,
                add_upsample=i < len(reversed_ch) - 1,
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
        x = _group_norm(g, self.dtype, "conv_norm_out")(x)
        x = nn.silu(x)
        return _conv(cfg.out_channels, 3, 1, self.dtype, "conv_out")(x)


class AutoencoderKL(nn.Module):
    """Public boundary: NCHW, like the reference's torch contracts."""

    config: AutoencoderKLConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder2D(self.config, self.dtype)
        self.decoder = Decoder2D(self.config, self.dtype)
        if self.config.use_quant_conv:
            self.quant_conv = _conv(2 * self.config.latent_channels, 1, 1, self.dtype, None)
        if self.config.use_post_quant_conv:
            self.post_quant_conv = _conv(self.config.latent_channels, 1, 1, self.dtype, None)

    def encode(self, x: jax.Array) -> jax.Array:
        """(B, C, H, W) -> moments (B, 2*latent, H/r, W/r)."""
        h = jnp.transpose(x.astype(self.dtype), (0, 2, 3, 1))
        moments = self.encoder(h)
        if self.config.use_quant_conv:
            moments = self.quant_conv(moments)
        return jnp.transpose(moments, (0, 3, 1, 2)).astype(jnp.float32)

    def decode(self, z: jax.Array) -> jax.Array:
        h = jnp.transpose(z.astype(self.dtype), (0, 2, 3, 1))
        if self.config.use_post_quant_conv:
            h = self.post_quant_conv(h)
        out = self.decoder(h)
        return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, x):
        moments = self.encode(x)
        mean, _ = jnp.split(moments, 2, axis=1)
        return self.decode(mean)


# ------------------------------------------------------------------ conversion


def autoencoder_kl_key_map(flax_key: str) -> str:
    """flax param path -> diffusers AutoencoderKL state-dict key."""
    key = flax_key
    key = key.replace("to_out_0", "to_out.0")
    key = key.replace("downsamplers_0", "downsamplers.0")
    key = key.replace("upsamplers_0", "upsamplers.0")
    import re

    key = re.sub(r"\b(down_blocks|up_blocks|resnets|attentions)_(\d+)", r"\1.\2", key)
    key = key.replace(".kernel", ".weight")
    key = re.sub(r"\.scale$", ".weight", key)
    return key


def load_autoencoder_kl_params(state_dict, abstract_params):
    """diffusers AutoencoderKL state dict -> flax params (conv kernels OIHW ->
    HWIO; linear kernels transposed by the generic rule)."""
    from .modeling_utils import flatten_params
    from .weight_utils import torch_state_dict_to_flax

    state = dict(state_dict)
    flat = flatten_params(abstract_params)
    conv_keys = {
        autoencoder_kl_key_map(k) for k, v in flat.items()
        if k.endswith(".kernel") and len(getattr(v, "shape", ())) == 4
    }
    for tkey in conv_keys:
        if tkey in state and np.asarray(state[tkey]).ndim == 4:
            state[tkey] = np.transpose(np.asarray(state[tkey]), (2, 3, 1, 0))

    def _key_map_no_transpose(flax_key: str) -> str:
        return autoencoder_kl_key_map(flax_key)

    # 4D conv kernels already transposed above; 2D attention linears get the
    # generic .kernel transpose inside torch_state_dict_to_flax.
    return torch_state_dict_to_flax(state, abstract_params, key_map=_key_map_no_transpose)


def export_autoencoder_kl_state_dict(params):
    from .weight_utils import flax_params_to_torch_state_dict
    from .modeling_utils import flatten_params

    out = {}
    for k, v in flatten_params(params).items():
        value = np.asarray(v)
        tkey = autoencoder_kl_key_map(k)
        if k.endswith(".kernel") and value.ndim == 4:
            value = np.transpose(value, (3, 2, 0, 1))
        elif k.endswith(".kernel") and value.ndim == 2:
            value = value.T
        out[tkey] = np.ascontiguousarray(value)
    return out
