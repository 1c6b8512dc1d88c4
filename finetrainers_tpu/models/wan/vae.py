"""Faithful Wan 2.1 causal 3D VAE (diffusers `AutoencoderKLWan`) in flax.

Architecture and key names mirror the diffusers implementation the reference
encodes through (`/root/reference/finetrainers/models/wan/base_specification.py:420-474`):

  encoder.conv_in | encoder.down_blocks.{flat i} (WanResidualBlock:
  {norm1,conv1,norm2,conv2,conv_shortcut} / WanResample: {resample.1, time_conv})
  | encoder.mid_block.{resnets.{0,1}, attentions.0.{norm,to_qkv,proj}} |
  encoder.norm_out | encoder.conv_out | quant_conv | post_quant_conv |
  decoder.(conv_in, mid_block, up_blocks.{flat}, norm_out, conv_out)

Semantics reproduced from the chunked-causal diffusers forward (frame 0 alone,
then 4-frame chunks with feat_cache), folded into single-shot math:
  - WanCausalConv3d == temporal conv with (kt-1) zero left-padding (the first
    chunk pads with zeros; later chunks pad with the cached previous frames —
    identical to one global causal conv).
  - downsample3d == spatial stride-2 (asymmetric ZeroPad2d (0,1,0,1)) then
    temporal: y = concat([x[:1], time_conv_valid_stride2(x)]) — the first frame
    passes through untouched (the cache-init branch), so 1+4k frames -> 1+k
    latent frames with exact first-frame causality.
  - upsample3d == temporal frame-doubling via a 2C-channel causal time_conv
    (interleave, drop the leading frame: 1+k -> 1+2k) then nearest 2x spatial.
    The chunked decoder's first-"Rep"-chunk alignment is best-effort pending
    real-checkpoint goldens; the training path (encoder) is exact.
  - WanRMS_norm == x / ||x||_2(channel) * sqrt(C) * gamma (F.normalize form),
    gamma stored at its torch shape (C,1,1,1) / (C,1,1).

Layout: NDHWC internally (TPU channels-last feeds the MXU), NCDHW public.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    base_dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Tuple[float, ...] = tuple([0.0] * 16)
    latents_std: Tuple[float, ...] = tuple([1.0] * 16)

    @classmethod
    def from_hf(cls, cfg: dict) -> "WanVAEConfig":
        return cls(
            base_dim=cfg.get("base_dim", 96),
            z_dim=cfg.get("z_dim", 16),
            dim_mult=tuple(cfg.get("dim_mult", (1, 2, 4, 4))),
            num_res_blocks=cfg.get("num_res_blocks", 2),
            attn_scales=tuple(cfg.get("attn_scales", ())),
            temperal_downsample=tuple(cfg.get("temperal_downsample", (False, True, True))),
            latents_mean=tuple(cfg.get("latents_mean", [0.0] * cfg.get("z_dim", 16))),
            latents_std=tuple(cfg.get("latents_std", [1.0] * cfg.get("z_dim", 16))),
        )

    @property
    def spatial_compression_ratio(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_compression_ratio(self) -> int:
        return 2 ** sum(self.temperal_downsample)


class WanRMSNorm(nn.Module):
    """WanRMS_norm: F.normalize over channels * sqrt(C) * gamma. `gamma_shape`
    preserves the torch parameter shape ((C,1,1,1) video / (C,1,1) image)."""

    dim: int
    gamma_ndim: int = 4  # (C,1,1,1) for 3D feature maps, 3 for per-frame 2D
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", lambda k: jnp.ones((self.dim,) + (1,) * (self.gamma_ndim - 1)))
        xf = x.astype(jnp.float32)
        # channels-last: normalize over the trailing dim (torch normalizes dim=1
        # channel-first — same vectors).
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
        out = xf / jnp.maximum(norm, 1e-12) * (self.dim ** 0.5) * gamma.reshape(-1).astype(jnp.float32)
        return out.astype(x.dtype)


class WanCausalConv3d(nn.Module):
    """nn.Conv3d with (kt-1) zero left-padding in time, SAME spatial padding."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    temporal_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kt, kh, kw = self.kernel_size
        if self.temporal_pad and kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        pad_h = ((kh - 1) // 2, kh // 2)
        pad_w = ((kw - 1) // 2, kw // 2)
        if kh > 1 or kw > 1:
            x = jnp.pad(x, ((0, 0), (0, 0), pad_h, pad_w, (0, 0)))
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)


class WanResidualBlock(nn.Module):
    in_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        if self.in_dim != self.out_dim:
            h = WanCausalConv3d(self.out_dim, (1, 1, 1), dtype=self.dtype, name="conv_shortcut")(h)
        y = WanRMSNorm(self.in_dim, dtype=self.dtype, name="norm1")(x)
        y = nn.silu(y)
        y = WanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(y)
        y = WanRMSNorm(self.out_dim, dtype=self.dtype, name="norm2")(y)
        y = nn.silu(y)
        y = WanCausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(y)
        return h + y


class WanAttentionBlock(nn.Module):
    """Per-frame single-head self-attention over H*W (diffusers WanAttentionBlock:
    RMS norm -> 1x1 to_qkv conv -> SDPA -> 1x1 proj, residual)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        res = x
        y = WanRMSNorm(self.dim, gamma_ndim=3, dtype=self.dtype, name="norm")(x)
        y = y.reshape(b * t, hh, ww, c)
        # torch nn.Conv2d 1x1 (weights live on the module: to_qkv.weight 4D)
        qkv = nn.Conv(self.dim * 3, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="to_qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b * t, hh * ww, 3 * c), 3, axis=-1)
        scale = c ** -0.5
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)),
            axis=-1,
        )
        y = jnp.einsum("bqk,bkc->bqc", attn, v.astype(jnp.float32)).astype(self.dtype)
        y = y.reshape(b * t, hh, ww, c)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj")(y)
        return res + y.reshape(b, t, hh, ww, c)


class WanResample(nn.Module):
    """mode in {downsample2d, downsample3d, upsample2d, upsample3d}. The spatial
    path is a torch Sequential whose conv sits at index 1 -> named `resample_1`."""

    dim: int
    mode: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, hh, ww, c = x.shape
        if self.mode == "upsample3d":
            # Temporal doubling matching diffusers' cached frame-by-frame decode
            # exactly: the FIRST frame passes through un-doubled and NEVER enters
            # the time conv (the first chunk marks its cache "Rep" and skips the
            # conv; the second chunk then convolves with zero left-padding, so
            # frames 2..T form an independent causal sequence). Output frame
            # count: 1 + 2*(T-1).
            time_conv = WanCausalConv3d(self.dim * 2, (3, 1, 1), dtype=self.dtype, name="time_conv")
            if t > 1:
                y = time_conv(x[:, 1:])  # causal zero-pad; f1 excluded
                y = y.reshape(b, t - 1, hh, ww, 2, c)
                y = jnp.moveaxis(y, 4, 2).reshape(b, (t - 1) * 2, hh, ww, c)
                x = jnp.concatenate([x[:, :1], y], axis=1)
            else:
                # single-frame input: pass through, but materialize the conv
                # params so checkpoints load shape-independently.
                time_conv(jnp.zeros((b, 3, hh, ww, c), x.dtype))
            t = x.shape[1]
        if self.mode in ("upsample2d", "upsample3d"):
            flat = x.reshape(b * t, x.shape[2], x.shape[3], c)
            flat = jax.image.resize(flat, (b * t, x.shape[2] * 2, x.shape[3] * 2, c), "nearest")
            flat = nn.Conv(self.dim // 2, (3, 3), padding="SAME", dtype=self.dtype,
                           param_dtype=jnp.float32, name="resample_1")(flat)
            return flat.reshape(b, t, flat.shape[1], flat.shape[2], self.dim // 2)
        # downsample: asymmetric ZeroPad2d((0,1,0,1)) + stride-2 VALID conv
        flat = x.reshape(b * t, hh, ww, c)
        flat = jnp.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
        flat = nn.Conv(self.dim, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32, name="resample_1")(flat)
        x = flat.reshape(b, t, flat.shape[1], flat.shape[2], c)
        if self.mode == "downsample3d":
            # first frame passes through (cache-init); stride-2 valid windows
            # starting at frame 0 produce the remaining latent frames.
            time_conv = WanCausalConv3d(
                self.dim, (3, 1, 1), strides=(2, 1, 1), temporal_pad=False,
                dtype=self.dtype, name="time_conv",
            )
            first = x[:, :1]
            if t >= 3:
                x = jnp.concatenate([first, time_conv(x)], axis=1)
            else:
                # single-frame input: cache-init only — still materialize the
                # conv params so checkpoints load shape-independently.
                time_conv(jnp.zeros((b, 3) + x.shape[2:], x.dtype))
                x = first
        return x


class WanMidBlock(nn.Module):
    dim: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = WanResidualBlock(self.dim, self.dim, dtype=self.dtype, name="resnets_0")(x)
        for i in range(self.num_layers):
            x = WanAttentionBlock(self.dim, dtype=self.dtype, name=f"attentions_{i}")(x)
            x = WanResidualBlock(self.dim, self.dim, dtype=self.dtype, name=f"resnets_{i + 1}")(x)
        return x


class WanEncoder3d(nn.Module):
    config: WanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = WanCausalConv3d(dims[0], dtype=self.dtype, name="conv_in")(x)
        idx = 0
        scale = 1.0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            cur = in_dim
            for _ in range(cfg.num_res_blocks):
                x = WanResidualBlock(cur, out_dim, dtype=self.dtype, name=f"down_blocks_{idx}")(x)
                idx += 1
                if scale in cfg.attn_scales:
                    x = WanAttentionBlock(out_dim, dtype=self.dtype, name=f"down_blocks_{idx}")(x)
                    idx += 1
                cur = out_dim
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
                x = WanResample(out_dim, mode, dtype=self.dtype, name=f"down_blocks_{idx}")(x)
                idx += 1
                scale /= 2.0
        x = WanMidBlock(dims[-1], dtype=self.dtype, name="mid_block")(x)
        x = WanRMSNorm(dims[-1], dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        return WanCausalConv3d(2 * cfg.z_dim, dtype=self.dtype, name="conv_out")(x)


class WanDecoder3d(nn.Module):
    config: WanVAEConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        mults = (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))
        dims = [cfg.base_dim * u for u in mults]
        temperal_upsample = tuple(reversed(cfg.temperal_downsample))
        x = WanCausalConv3d(dims[0], dtype=self.dtype, name="conv_in")(z)
        x = WanMidBlock(dims[0], dtype=self.dtype, name="mid_block")(x)
        idx = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            cur = in_dim // 2 if i > 0 else in_dim  # upsampler halved the channels
            for _ in range(cfg.num_res_blocks + 1):
                x = WanResidualBlock(cur, out_dim, dtype=self.dtype, name=f"up_blocks_{idx}")(x)
                idx += 1
                cur = out_dim
            if i != len(cfg.dim_mult) - 1:
                mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
                x = WanResample(out_dim, mode, dtype=self.dtype, name=f"up_blocks_{idx}")(x)
                idx += 1
        x = WanRMSNorm(dims[-1], dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        return WanCausalConv3d(3, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKLWan(nn.Module):
    """Public boundary NCDHW (B, C, T, H, W), T = 1 + 4k frames."""

    config: WanVAEConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = WanEncoder3d(self.config, self.dtype)
        self.decoder = WanDecoder3d(self.config, self.dtype)
        self.quant_conv = WanCausalConv3d(2 * self.config.z_dim, (1, 1, 1), dtype=self.dtype)
        self.post_quant_conv = WanCausalConv3d(self.config.z_dim, (1, 1, 1), dtype=self.dtype)

    def encode(self, x: jax.Array) -> jax.Array:
        """(B, 3, T, H, W) in [-1,1] -> moments (B, 2*z, 1+(T-1)/4, H/8, W/8)."""
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


def wan_vae_key_map(flax_key: str) -> str:
    """flax param path -> diffusers AutoencoderKLWan state-dict key.

    WanCausalConv3d subclasses nn.Conv3d in diffusers (its weights live directly
    on the module), so the flax wrapper level `.conv.` is stripped. The spatial
    resample conv is index 1 of a torch Sequential."""
    import re

    key = flax_key
    key = key.replace(".conv.kernel", ".weight").replace(".conv.bias", ".bias")
    key = key.replace("resample_1.kernel", "resample.1.weight")
    key = key.replace("resample_1.bias", "resample.1.bias")
    key = re.sub(r"\b(down_blocks|up_blocks|resnets|attentions)_(\d+)", r"\1.\2", key)
    key = key.replace(".kernel", ".weight")
    return key


def _transpose_conv_kernels(state_dict, abstract_params, key_map):
    """torch conv kernels (O,I,[T,]H,W) -> flax ([T,]H,W,I,O) ahead of the
    generic converter (which only transposes 2D linear kernels)."""
    from ..modeling_utils import flatten_params

    state = dict(state_dict)
    for k, v in flatten_params(abstract_params).items():
        ndim = len(getattr(v, "shape", ()))
        if k.endswith(".kernel") and ndim in (4, 5):
            tkey = key_map(k)
            if tkey in state:
                arr = np.asarray(state[tkey])
                perm = (2, 3, 1, 0) if arr.ndim == 4 else (2, 3, 4, 1, 0)
                state[tkey] = np.transpose(arr, perm)
    return state


def load_wan_vae_params(state_dict, abstract_params):
    from ..weight_utils import torch_state_dict_to_flax

    state = _transpose_conv_kernels(state_dict, abstract_params, wan_vae_key_map)
    return torch_state_dict_to_flax(state, abstract_params, key_map=wan_vae_key_map)


def export_wan_vae_state_dict(params):
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
        out[wan_vae_key_map(k)] = np.ascontiguousarray(value)
    return out
