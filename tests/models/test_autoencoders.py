"""Causal VAE tests: compression ratios, causality, slicing/tiling memory modes."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.autoencoders import (
    AutoencoderConfig,
    AutoencoderKL3D,
    encode_sliced,
    encode_tiled,
    sample_from_moments,
)
from finetrainers_tpu.models.modeling_utils import ModelHandle


CFG = AutoencoderConfig(latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
                        spatial_downsample=(True,), temporal_downsample=(True,))


def _vae():
    module = AutoencoderKL3D(CFG, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 2, 2)))["params"]
    return ModelHandle(module, params, {"latent_channels": 4, "spatial_compression_ratio": 2,
                                        "temporal_compression_ratio": 2})


class TestAutoencoder:
    def test_compression_shapes(self):
        vae = _vae()
        moments = vae.apply(jnp.zeros((1, 3, 5, 16, 16)), method=AutoencoderKL3D.encode)
        # 1 + 4/2 = 3 latent frames (causal), 16/2 spatial, 2*4 moment channels
        assert moments.shape == (1, 8, 3, 8, 8)

    def test_decode_shapes(self):
        vae = _vae()
        out = vae.apply(jnp.zeros((1, 4, 3, 8, 8)), method=AutoencoderKL3D.decode)
        assert out.shape == (1, 3, 5, 16, 16)

    def test_temporal_causality(self):
        """Latent frame 0 must not depend on later video frames."""
        vae = _vae()
        x1 = jnp.zeros((1, 3, 5, 16, 16))
        x2 = x1.at[:, :, 3:].set(99.0)  # change only later frames
        m1 = vae.apply(x1, method=AutoencoderKL3D.encode)
        m2 = vae.apply(x2, method=AutoencoderKL3D.encode)
        np.testing.assert_allclose(m1[:, :, 0], m2[:, :, 0], atol=1e-5)

    def test_sliced_encode_matches(self):
        vae = _vae()
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 3, 8, 8))
        full = vae.apply(x, method=AutoencoderKL3D.encode)
        sliced = encode_sliced(vae, x, slice_size=1)
        np.testing.assert_allclose(np.asarray(sliced), np.asarray(full), atol=1e-5)

    def test_tiled_encode_shape(self):
        vae = _vae()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 32, 32))
        tiled = encode_tiled(vae, x, tile=16, overlap=8)
        full = vae.apply(x, method=AutoencoderKL3D.encode)
        assert tiled.shape == full.shape
        # Interior should match closely; tile borders blend.
        assert np.isfinite(np.asarray(tiled)).all()

    def test_encode_media_honors_memory_modes(self):
        """--enable_slicing/--enable_tiling set handle flags that encode_media
        dispatches on; sliced output is bit-identical to the direct path."""
        from finetrainers_tpu.models.autoencoders import encode_media

        vae = _vae()
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, 8, 8))
        direct = np.asarray(encode_media(vae, x))
        vae.enable_slicing()
        assert vae.use_slicing
        sliced = np.asarray(encode_media(vae, x))
        np.testing.assert_allclose(sliced, direct, atol=1e-5)
        # Tiling kicks in only past the tile size; shape must be unchanged.
        vae.enable_tiling()
        big = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 3, 32, 32))
        tiled = np.asarray(encode_media(vae, big, tile=16, overlap=8))
        assert tiled.shape == np.asarray(encode_media(_vae(), big)).shape

    def test_posterior_sampling(self):
        moments = jnp.concatenate([jnp.ones((1, 4, 2, 4, 4)), jnp.full((1, 4, 2, 4, 4), -30.0)], axis=1)
        z = sample_from_moments(moments, jax.random.PRNGKey(0))
        # logvar -30 -> essentially deterministic at the mean
        np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-3)
