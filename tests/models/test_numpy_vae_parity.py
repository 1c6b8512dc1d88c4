"""Independent NumPy re-implementation of the FULL LTX-Video causal 3D VAE —
encoder (patchify, causal convs, downsamplers, shared-logvar head) and decoder
(mid block, upsampler depth-to-space with leading-frame trim, unpatchify) —
against the flax model on random weights (VERDICT r3 item 4: raise the offline
parity ceiling to at least one full VAE decoder).

The math is written from the diffusers `AutoencoderKLLTXVideo` semantics the
reference encodes/decodes through
(`/root/reference/finetrainers/models/ltx_video/base_specification.py:260-280`):
replicate temporal padding (causal = front-only in the encoder, symmetric in
the non-causal decoder), SAME spatial zero padding, affine-free RMSNorm, silu,
stride-(2,2,2) downsampler convs, conv->depth-to-space (2,2,2) upsamplers that
trim the first frame, and the (latent+1)-channel shared-logvar encoder head.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

ATOL, RTOL = 3e-4, 3e-4


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_rms_norm_ch(x, eps=1e-6):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps)


def np_conv3d(x, kernel, bias, strides=(1, 1, 1)):
    """VALID 3D conv, NDHWC x (kt, kh, kw, cin, cout) flax kernel layout."""
    kt, kh, kw, cin, cout = kernel.shape
    st, sh, sw = strides
    b, t, h, w, _ = x.shape
    to, ho, wo = (t - kt) // st + 1, (h - kh) // sh + 1, (w - kw) // sw + 1
    out = np.zeros((b, to, ho, wo, cout), np.float64)
    for dt in range(kt):
        for dh in range(kh):
            for dw in range(kw):
                xs = x[:, dt:dt + st * to:st, dh:dh + sh * ho:sh, dw:dw + sw * wo:sw, :]
                out += xs @ kernel[dt, dh, dw]
    return out + bias


def np_causal_conv3d(x, p, kernel_size=(3, 3, 3), strides=(1, 1, 1), is_causal=True):
    """Replicate temporal pad (front-only if causal), zero spatial SAME pad,
    then VALID conv — LTXVideoCausalConv3d semantics."""
    kt, kh, kw = kernel_size
    if kt > 1:
        if is_causal:
            x = np.concatenate([np.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
        else:
            front = np.repeat(x[:, :1], (kt - 1) // 2, axis=1)
            back = np.repeat(x[:, -1:], kt // 2, axis=1)
            x = np.concatenate([front, x, back], axis=1)
    if kh > 1 or kw > 1:
        x = np.pad(x, ((0, 0), (0, 0), ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2), (0, 0)))
    return np_conv3d(x, p["conv"]["kernel"], p["conv"]["bias"], strides)


def np_resnet(x, p, is_causal):
    h = np_silu(np_rms_norm_ch(x))
    h = np_causal_conv3d(h, p["conv1"], is_causal=is_causal)
    h = np_silu(np_rms_norm_ch(h))
    h = np_causal_conv3d(h, p["conv2"], is_causal=is_causal)
    if "conv_shortcut" in p:
        x = np_causal_conv3d(x, p["conv_shortcut"], kernel_size=(1, 1, 1), is_causal=is_causal)
    return x + h


def np_upsampler(x, p, dim, is_causal):
    b, t, hh, ww, c = x.shape
    y = np_causal_conv3d(x, p["conv"], is_causal=is_causal)
    y = y.reshape(b, t, hh, ww, dim, 2, 2, 2)
    y = y.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    y = y.reshape(b, t * 2, hh * 2, ww * 2, dim)
    return y[:, 1:]


class TestLTXVAEFullNumpyParity:
    CFG = dict(
        in_channels=3, out_channels=3, latent_channels=3,
        block_out_channels=(4, 6), decoder_block_out_channels=(4, 6),
        layers_per_block=(1, 1, 1), decoder_layers_per_block=(1, 1, 1),
        spatio_temporal_scaling=(True, False), decoder_spatio_temporal_scaling=(True, False),
        patch_size=2, patch_size_t=1,
    )

    def _build(self):
        from finetrainers_tpu.models.ltx_video.vae import AutoencoderKLLTXVideo, LTXVAEConfig

        cfg = LTXVAEConfig(**self.CFG)
        model = AutoencoderKLLTXVideo(cfg)
        rng = jax.random.PRNGKey(3)
        # T = 1 + 2k at temporal ratio pt * 2^1 = 2; H, W multiples of p * 2 = 4
        x = jax.random.normal(jax.random.fold_in(rng, 1), (1, 3, 3, 8, 8), jnp.float32)
        params = model.init(jax.random.fold_in(rng, 2), x)["params"]
        # randomize biases so transposes/orders can't hide
        flat = jax.tree_util.tree_flatten_with_path(params)
        leaves = [jax.random.normal(jax.random.fold_in(rng, 100 + i), leaf.shape, jnp.float32) * 0.2
                  for i, (_, leaf) in enumerate(flat[0])]
        params = jax.tree_util.tree_unflatten(flat[1], leaves)
        return model, params, x, cfg

    def test_encoder_matches_numpy(self):
        model, params, x, cfg = self._build()
        got = model.apply({"params": params}, x, method=model.encode)

        p = jax.tree_util.tree_map(lambda v: np.asarray(v, np.float64), params)["encoder"]
        h = np.moveaxis(np.asarray(x, np.float64), 1, -1)  # NDHWC
        b, t, hh, ww, c = h.shape
        pp, pt = cfg.patch_size, cfg.patch_size_t
        h = h.reshape(b, t // pt, pt, hh // pp, pp, ww // pp, pp, c)
        h = h.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, t // pt, hh // pp, ww // pp, c * pt * pp * pp)
        h = np_causal_conv3d(h, p["conv_in"], is_causal=True)
        # down block 0: 1 resnet at 4ch, downsample, conv_out resnet 4->6
        h = np_resnet(h, p["down_blocks_0"]["resnets_0"], True)
        h = np_causal_conv3d(h, p["down_blocks_0"]["downsamplers_0"], strides=(2, 2, 2), is_causal=True)
        h = np_resnet(h, p["down_blocks_0"]["conv_out"], True)
        # down block 1: 1 resnet at 6ch (no scale, no channel change)
        h = np_resnet(h, p["down_blocks_1"]["resnets_0"], True)
        # mid: layers_per_block[-1] = 1 resnet
        h = np_resnet(h, p["mid_block"]["resnets_0"], True)
        h = np_silu(np_rms_norm_ch(h))
        h = np_causal_conv3d(h, p["conv_out"], is_causal=True)  # latent+1 channels
        last = h[..., -1:]
        moments = np.concatenate([h, np.repeat(last, cfg.latent_channels - 1, axis=-1)], axis=-1)
        want = np.moveaxis(moments, -1, 1)

        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)

    def test_decoder_matches_numpy(self):
        model, params, x, cfg = self._build()
        rng = jax.random.PRNGKey(5)
        z = jax.random.normal(rng, (1, cfg.latent_channels, 2, 2, 2), jnp.float32)
        got = model.apply({"params": params}, z, method=model.decode)

        p = jax.tree_util.tree_map(lambda v: np.asarray(v, np.float64), params)["decoder"]
        h = np.moveaxis(np.asarray(z, np.float64), 1, -1)
        # channels reversed (6, 4); layers reversed (1, 1, 1); scaling reversed (False, True)
        h = np_causal_conv3d(h, p["conv_in"], is_causal=False)
        h = np_resnet(h, p["mid_block"]["resnets_0"], False)
        # up block 0: 6 -> 4 conv_in resnet, no upsample, 1 resnet
        h = np_resnet(h, p["up_blocks_0"]["conv_in"], False)
        h = np_resnet(h, p["up_blocks_0"]["resnets_0"], False)
        # up block 1: no channel change, upsample (depth-to-space, trim), 1 resnet
        h = np_upsampler(h, p["up_blocks_1"]["upsamplers_0"], 4, False)
        h = np_resnet(h, p["up_blocks_1"]["resnets_0"], False)
        h = np_silu(np_rms_norm_ch(h))
        h = np_causal_conv3d(h, p["conv_out"], is_causal=False)
        b, t, hh, ww, _ = h.shape
        pp, pt = cfg.patch_size, cfg.patch_size_t
        h = h.reshape(b, t, hh, ww, cfg.out_channels, pt, pp, pp)
        h = h.transpose(0, 1, 5, 2, 6, 3, 7, 4).reshape(b, t * pt, hh * pp, ww * pp, cfg.out_channels)
        want = np.moveaxis(h, -1, 1)

        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)
