"""Unit tests for functional ops (flow matching, bucketing, normalization, text)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finetrainers_tpu.functional import (
    bicubic_resize_video,
    center_crop_image,
    compute_density_for_timestep_sampling,
    compute_loss_weighting,
    convert_byte_str_to_str,
    default_flow_shift,
    find_nearest_resolution_image,
    find_nearest_video_bucket,
    flow_match_target,
    flow_match_xt,
    normalize,
    remove_prefix,
    resize_to_nearest_bucket_image,
    resize_to_nearest_bucket_video,
    resolution_dependent_timestep_flow_shift,
)


class TestFlowMatch:
    def test_xt_endpoints(self):
        x0 = jnp.ones((2, 4))
        n = jnp.zeros((2, 4))
        np.testing.assert_allclose(flow_match_xt(x0, n, jnp.asarray(0.0)), x0)
        np.testing.assert_allclose(flow_match_xt(x0, n, jnp.asarray(1.0)), n)

    def test_target(self):
        x0 = jnp.full((3,), 2.0)
        n = jnp.full((3,), 5.0)
        np.testing.assert_allclose(flow_match_target(n, x0), jnp.full((3,), 3.0))

    def test_flow_shift_identity(self):
        s = jnp.linspace(0.01, 0.99, 10)
        np.testing.assert_allclose(default_flow_shift(s, 1.0), s, atol=1e-7)

    def test_flow_shift_moves_up(self):
        s = jnp.asarray([0.5])
        assert float(default_flow_shift(s, 3.0)[0]) > 0.5

    def test_resolution_shift(self):
        latents = jnp.zeros((1, 4, 32, 32))
        s = jnp.asarray([0.5])
        out = resolution_dependent_timestep_flow_shift(latents, s)
        assert out.shape == s.shape

    @pytest.mark.parametrize("scheme", ["none", "logit_normal", "mode"])
    def test_density_in_range(self, scheme):
        u = compute_density_for_timestep_sampling(jax.random.PRNGKey(0), scheme, 1024)
        assert u.shape == (1024,)
        if scheme != "mode":  # mode scheme can exceed [0,1) slightly by design
            assert float(u.min()) >= 0.0 and float(u.max()) <= 1.0

    @pytest.mark.parametrize("scheme,expected", [("none", 1.0), ("sigma_sqrt", 4.0)])
    def test_loss_weighting(self, scheme, expected):
        w = compute_loss_weighting(scheme, sigmas=jnp.asarray([0.5]))
        np.testing.assert_allclose(w, [expected], rtol=1e-6)

    def test_loss_weighting_ddim_alphas(self):
        w = compute_loss_weighting("none", alphas=jnp.asarray([0.5]))
        np.testing.assert_allclose(w, [2.0], rtol=1e-6)


class TestBuckets:
    def test_image_bucket_match(self):
        img = np.zeros((3, 480, 640), dtype=np.float32)  # 4:3
        bucket = find_nearest_resolution_image(img, [(512, 512), (480, 640), (256, 256)])
        assert bucket == (480, 640)

    def test_image_resize(self):
        img = np.random.rand(3, 100, 200).astype(np.float32)
        out = resize_to_nearest_bucket_image(img, [(64, 64), (64, 128)], "bicubic")
        assert out.shape == (3, 64, 128)

    def test_image_center_crop(self):
        img = np.random.rand(3, 100, 200).astype(np.float32)
        out = center_crop_image(img, (50, 60))
        assert out.shape == (3, 50, 60)

    def test_video_bucket_frames_le(self):
        vid = np.zeros((30, 3, 64, 64), dtype=np.float32)
        bucket = find_nearest_video_bucket(vid, [(16, 64, 64), (25, 64, 64), (49, 64, 64)])
        assert bucket == (25, 64, 64)

    def test_video_resize_downsamples_frames(self):
        vid = np.random.rand(30, 3, 48, 48).astype(np.float32)
        out, first_frame_only = resize_to_nearest_bucket_video(vid, [(8, 32, 32)], "bicubic")
        assert out.shape == (8, 3, 32, 32)
        assert first_frame_only is False

    def test_video_resize_crop(self):
        vid = np.random.rand(8, 3, 100, 50).astype(np.float32)
        out, _ = resize_to_nearest_bucket_video(vid, [(8, 32, 32)], "resize_crop")
        assert out.shape == (8, 3, 32, 32)


class TestNormalizeAndText:
    def test_normalize_range(self):
        x = np.random.rand(4, 5).astype(np.float32) * 7 - 3
        out = normalize(x)
        assert np.isclose(out.min(), -1.0) and np.isclose(out.max(), 1.0)

    def test_normalize_constant(self):
        out = normalize(np.full((3, 3), 2.0, dtype=np.float32))
        assert np.all(out == -1.0)

    def test_byte_str(self):
        assert convert_byte_str_to_str("b'hello'") == "hello"

    def test_remove_prefix(self):
        assert remove_prefix("The video shows a cat", ["The video"]) == "shows a cat"
        assert remove_prefix("A cat", ["The video"]) == "A cat"
