"""Native C++ media-op tests: numerics vs the numpy reference path."""

import numpy as np
import pytest

from finetrainers_tpu.native import get_media_ops


ops = get_media_ops()
pytestmark = pytest.mark.skipif(ops is None, reason="native extension unavailable")


class TestMediaOps:
    def test_to_float_matches_numpy_video(self):
        x = np.random.randint(0, 255, (4, 32, 48, 3), np.uint8)
        ref = np.moveaxis(x.astype(np.float32) / 127.5 - 1.0, -1, 1)
        out = ops.to_float_chw(x)
        assert out.shape == (4, 3, 32, 48)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_to_float_matches_numpy_image(self):
        x = np.random.randint(0, 255, (32, 48, 3), np.uint8)
        ref = np.moveaxis(x.astype(np.float32) / 127.5 - 1.0, -1, 0)
        out = ops.to_float_chw(x)
        assert out.shape == (3, 32, 48)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_roundtrip_exact(self):
        x = np.random.randint(0, 255, (2, 16, 16, 3), np.uint8)
        back = ops.from_float_chw(ops.to_float_chw(x))
        np.testing.assert_array_equal(back, x)

    def test_clamping(self):
        x = np.array([[[[-2.0]], [[2.0]], [[0.0]]]], np.float32)  # (1,3,1,1)
        out = ops.from_float_chw(x)
        assert out[0, 0, 0, 0] == 0 and out[0, 0, 0, 1] == 255

    def test_bad_rank_raises(self):
        with pytest.raises(ValueError):
            ops.to_float_chw(np.zeros((4, 4), np.uint8))

    def test_non_contiguous_input(self):
        x = np.random.randint(0, 255, (4, 32, 48, 6), np.uint8)[..., ::2]
        ref = np.moveaxis(x.astype(np.float32) / 127.5 - 1.0, -1, 1)
        out = ops.to_float_chw(np.ascontiguousarray(x))
        np.testing.assert_allclose(out, ref, atol=1e-6)
