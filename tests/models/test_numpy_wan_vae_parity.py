"""Independent NumPy re-implementation of the FULL Wan 2.1 causal 3D VAE —
encoder (zero-left-padded causal convs, asymmetric spatial downsample,
first-frame-passthrough temporal downsample, mid attention) and decoder
(temporal frame-doubling upsampler with first-frame passthrough, nearest 2x
spatial upsample) — against the flax model on random weights.

Math written from the diffusers `AutoencoderKLWan` semantics the reference
encodes/decodes through
(`/root/reference/finetrainers/models/wan/base_specification.py:420-474`),
single-shot folded form of its chunked feat_cache forward (see
`finetrainers_tpu/models/wan/vae.py` module docstring for the equivalence).
Complements the LTX VAE numpy parity (replicate- vs zero-padding, RMS vs
F.normalize norms, depth-to-space vs interleave upsamplers).
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from test_numpy_vae_parity import np_conv3d, np_silu  # noqa: E402

ATOL, RTOL = 3e-4, 3e-4


def np_wan_causal_conv(x, p, kernel_size=(3, 3, 3), strides=(1, 1, 1), temporal_pad=True):
    """Zero (kt-1) LEFT temporal pad + SAME spatial zero pad + VALID conv."""
    kt, kh, kw = kernel_size
    if temporal_pad and kt > 1:
        x = np.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
    if kh > 1 or kw > 1:
        x = np.pad(x, ((0, 0), (0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
    return np_conv3d(x, p["conv"]["kernel"], p["conv"]["bias"], strides)


def np_wan_rms(x, gamma):
    """F.normalize over channels * sqrt(C) * gamma."""
    c = x.shape[-1]
    norm = np.sqrt(np.sum(x * x, axis=-1, keepdims=True))
    return x / np.maximum(norm, 1e-12) * (c ** 0.5) * np.asarray(gamma).reshape(-1)


def np_wan_resblock(x, p):
    h = x
    if "conv_shortcut" in p:
        h = np_wan_causal_conv(h, p["conv_shortcut"], kernel_size=(1, 1, 1))
    y = np_silu(np_wan_rms(x, p["norm1"]["gamma"]))
    y = np_wan_causal_conv(y, p["conv1"])
    y = np_silu(np_wan_rms(y, p["norm2"]["gamma"]))
    y = np_wan_causal_conv(y, p["conv2"])
    return h + y


def np_conv2d_same(x, kernel, bias, strides=(1, 1), pad="same"):
    """x (N,H,W,C); kernel (kh,kw,in,out)."""
    kh, kw, cin, cout = kernel.shape
    if pad == "same":
        x = np.pad(x, ((0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
    sh, sw = strides
    n, h, w, _ = x.shape
    ho, wo = (h - kh) // sh + 1, (w - kw) // sw + 1
    out = np.zeros((n, ho, wo, cout))
    for dh in range(kh):
        for dw in range(kw):
            out += x[:, dh:dh + sh * ho:sh, dw:dw + sw * wo:sw, :] @ kernel[dh, dw]
    return out + bias


def np_wan_attention(x, p):
    b, t, hh, ww, c = x.shape
    res = x
    y = np_wan_rms(x, p["norm"]["gamma"]).reshape(b * t, hh, ww, c)
    qkv = np_conv2d_same(y, p["to_qkv"]["kernel"], p["to_qkv"]["bias"], pad="valid")
    q, k, v = np.split(qkv.reshape(b * t, hh * ww, 3 * c), 3, axis=-1)
    logits = np.einsum("bqc,bkc->bqk", q * c ** -0.5, k)
    logits -= logits.max(axis=-1, keepdims=True)
    attn = np.exp(logits)
    attn /= attn.sum(axis=-1, keepdims=True)
    y = np.einsum("bqk,bkc->bqc", attn, v).reshape(b * t, hh, ww, c)
    y = np_conv2d_same(y, p["proj"]["kernel"], p["proj"]["bias"], pad="valid")
    return res + y.reshape(b, t, hh, ww, c)


def np_wan_mid(x, p):
    x = np_wan_resblock(x, p["resnets_0"])
    x = np_wan_attention(x, p["attentions_0"])
    return np_wan_resblock(x, p["resnets_1"])


def np_upsample3d(x, p, dim):
    b, t, hh, ww, c = x.shape
    if t > 1:
        y = np_wan_causal_conv(x[:, 1:], p["time_conv"], kernel_size=(3, 1, 1))
        y = y.reshape(b, t - 1, hh, ww, 2, c)
        y = np.moveaxis(y, 4, 2).reshape(b, (t - 1) * 2, hh, ww, c)
        x = np.concatenate([x[:, :1], y], axis=1)
        t = x.shape[1]
    flat = x.reshape(b * t, hh, ww, c)
    up = np.repeat(np.repeat(flat, 2, axis=1), 2, axis=2)  # nearest 2x
    out = np_conv2d_same(up, p["resample_1"]["kernel"], p["resample_1"]["bias"])
    return out.reshape(b, t, hh * 2, ww * 2, dim // 2)


def np_downsample(x, p, mode):
    b, t, hh, ww, c = x.shape
    flat = x.reshape(b * t, hh, ww, c)
    flat = np.pad(flat, ((0, 0), (0, 1), (0, 1), (0, 0)))
    flat = np_conv2d_same(flat, p["resample_1"]["kernel"], p["resample_1"]["bias"],
                          strides=(2, 2), pad="valid")
    x = flat.reshape(b, t, flat.shape[1], flat.shape[2], c)
    if mode == "downsample3d":
        first = x[:, :1]
        y = np_wan_causal_conv(x, p["time_conv"], kernel_size=(3, 1, 1),
                               strides=(2, 1, 1), temporal_pad=False)
        x = np.concatenate([first, y], axis=1)
    return x


class TestWanVAEFullNumpyParity:
    def _build(self):
        from finetrainers_tpu.models.wan.vae import AutoencoderKLWan, WanVAEConfig

        cfg = WanVAEConfig(base_dim=4, z_dim=3, dim_mult=(1, 2), num_res_blocks=1,
                           attn_scales=(1.0,), temperal_downsample=(True,))
        model = AutoencoderKLWan(cfg)
        rng = jax.random.PRNGKey(9)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 3, 5, 8, 8), jnp.float32)
        params = model.init(jax.random.fold_in(rng, 2), x)["params"]
        flat = jax.tree_util.tree_flatten_with_path(params)
        leaves = [jax.random.normal(jax.random.fold_in(rng, 300 + i), leaf.shape, jnp.float32) * 0.2
                  for i, (_, leaf) in enumerate(flat[0])]
        params = jax.tree_util.tree_unflatten(flat[1], leaves)
        return model, params, x, cfg

    def test_encoder_matches_numpy(self):
        model, params, x, cfg = self._build()
        got = model.apply({"params": params}, x, method=model.encode)

        p = jax.tree_util.tree_map(lambda v: np.asarray(v, np.float64), params)
        pe = p["encoder"]
        h = np.moveaxis(np.asarray(x, np.float64), 1, -1)
        # dims (4, 4, 8); stage 0: resblock 4->4 (down_blocks_0) + attention at
        # scale 1.0 (down_blocks_1) + downsample3d (down_blocks_2); stage 1:
        # resblock 4->8 (down_blocks_3, scale 0.5 has no attention); mid at 8
        h = np_wan_causal_conv(h, pe["conv_in"])
        h = np_wan_resblock(h, pe["down_blocks_0"])
        h = np_wan_attention(h, pe["down_blocks_1"])
        h = np_downsample(h, pe["down_blocks_2"], "downsample3d")
        h = np_wan_resblock(h, pe["down_blocks_3"])
        h = np_wan_mid(h, pe["mid_block"])
        h = np_silu(np_wan_rms(h, pe["norm_out"]["gamma"]))
        h = np_wan_causal_conv(h, pe["conv_out"])  # 2*z channels
        h = np_wan_causal_conv(h, p["quant_conv"], kernel_size=(1, 1, 1))
        want = np.moveaxis(h, -1, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)

    def test_decoder_matches_numpy(self):
        model, params, x, cfg = self._build()
        rng = jax.random.PRNGKey(15)
        z = jax.random.normal(rng, (1, cfg.z_dim, 2, 2, 2), jnp.float32)
        got = model.apply({"params": params}, z, method=model.decode)

        p = jax.tree_util.tree_map(lambda v: np.asarray(v, np.float64), params)
        pd = p["decoder"]
        h = np.moveaxis(np.asarray(z, np.float64), 1, -1)
        h = np_wan_causal_conv(h, p["post_quant_conv"], kernel_size=(1, 1, 1))
        # mults (2, 2, 1) -> dims (8, 8, 4); stage 0: 2 resblocks at 8, then
        # upsample3d (halves channels to 4); stage 1: 2 resblocks at 4
        h = np_wan_causal_conv(h, pd["conv_in"])
        h = np_wan_mid(h, pd["mid_block"])
        h = np_wan_resblock(h, pd["up_blocks_0"])
        h = np_wan_resblock(h, pd["up_blocks_1"])
        h = np_upsample3d(h, pd["up_blocks_2"], 8)
        h = np_wan_resblock(h, pd["up_blocks_3"])
        h = np_wan_resblock(h, pd["up_blocks_4"])
        h = np_silu(np_wan_rms(h, pd["norm_out"]["gamma"]))
        h = np_wan_causal_conv(h, pd["conv_out"])
        want = np.moveaxis(h, -1, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)
