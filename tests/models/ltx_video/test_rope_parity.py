"""LTX RoPE exact-parity test.

Cross-checks our jnp `LTXRotaryPosEmbed` / `apply_ltx_rotary_emb` against an
independent torch transcription of diffusers' `LTXVideoRotaryPosEmbed.forward`
and `apply_rotary_emb` (diffusers transformer_ltx; the rotation is also copied
verbatim in the reference's TP patch, `patches/models/ltx_video/patch.py:24-35`).
The torch version below follows the diffusers op sequence literally
(meshgrid/stack/flatten/transpose/repeat_interleave/unflatten/unbind) so a
transcription error in the broadcast-style jnp implementation cannot hide.
"""

import math
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO_ROOT = pathlib.Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.ltx_video.transformer import (  # noqa: E402
    LTXRotaryPosEmbed,
    apply_ltx_rotary_emb,
)


def _torch_ltx_rope(dim, num_frames, height, width, rope_interpolation_scale,
                    patch_size=1, patch_size_t=1, base_num_frames=20,
                    base_height=2048, base_width=2048, theta=10000.0,
                    dtype=torch.float64):
    """Literal transcription of diffusers LTXVideoRotaryPosEmbed.forward (B=1).

    Computed in float64 by default: the phases reach theta*pi/2 ~ 1.6e4 rad, so
    any float32 implementation (including diffusers' own) carries ~1e-2 cos/sin
    rounding jitter at the highest frequencies; the f64 table is the ground
    truth both should approximate."""
    grid_h = torch.arange(height, dtype=dtype)
    grid_w = torch.arange(width, dtype=dtype)
    grid_f = torch.arange(num_frames, dtype=dtype)
    grid = torch.meshgrid(grid_f, grid_h, grid_w, indexing="ij")
    grid = torch.stack(grid, dim=0)
    grid = grid.unsqueeze(0)  # batch 1

    grid = grid.clone()
    grid[:, 0:1] = grid[:, 0:1] * rope_interpolation_scale[0] * patch_size_t / base_num_frames
    grid[:, 1:2] = grid[:, 1:2] * rope_interpolation_scale[1] * patch_size / base_height
    grid[:, 2:3] = grid[:, 2:3] * rope_interpolation_scale[2] * patch_size / base_width

    grid = grid.flatten(2, 4).transpose(1, 2)  # [B, FHW, 3]

    start = 1.0
    end = theta
    freqs = theta ** torch.linspace(
        math.log(start, theta), math.log(end, theta), dim // 6, dtype=dtype
    )
    freqs = freqs * math.pi / 2.0
    freqs = freqs * (grid.unsqueeze(-1) * 2 - 1)  # [B, FHW, 3, dim//6]
    freqs = freqs.transpose(-1, -2).flatten(2)  # [B, FHW, dim//2-ish]

    cos_freqs = freqs.cos().repeat_interleave(2, dim=-1)
    sin_freqs = freqs.sin().repeat_interleave(2, dim=-1)

    if dim % 6 != 0:
        cos_padding = torch.ones_like(cos_freqs[:, :, : dim % 6])
        sin_padding = torch.zeros_like(cos_freqs[:, :, : dim % 6])
        cos_freqs = torch.cat([cos_padding, cos_freqs], dim=-1)
        sin_freqs = torch.cat([sin_padding, sin_freqs], dim=-1)
    return cos_freqs, sin_freqs


def _torch_apply_rotary_emb(x, freqs):
    """Literal transcription of diffusers apply_rotary_emb for LTX."""
    cos, sin = freqs
    x_real, x_imag = x.unflatten(2, (-1, 2)).unbind(-1)
    x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(2)
    out = (x.float() * cos + x_rotated.float() * sin).to(x.dtype)
    return out


@pytest.mark.parametrize(
    "dim,f,h,w",
    [
        (2048, 3, 4, 6),  # flagship inner dim: dim%6 == 2 -> front identity pad
        (96, 2, 3, 5),    # dim%6 == 0: no pad
        (64, 1, 4, 4),    # image-like single frame, dim%6 == 4
    ],
)
def test_ltx_rope_freqs_match_diffusers(dim, f, h, w):
    scale = (8.0 / 25.0, 32.0, 32.0)
    rope = LTXRotaryPosEmbed(dim=dim)
    cos_j, sin_j = rope(f, h, w, scale)
    assert cos_j.shape == (f * h * w, dim)

    # vs the float64 ground-truth transcription: tight.
    cos_t, sin_t = _torch_ltx_rope(dim, f, h, w, scale, dtype=torch.float64)
    np.testing.assert_allclose(np.asarray(cos_j), cos_t[0].numpy(), atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(sin_j), sin_t[0].numpy(), atol=2e-6, rtol=0)

    # vs the float32 transcription (what diffusers actually computes): bounded
    # by f32 phase rounding at the highest frequencies.
    cos_t32, sin_t32 = _torch_ltx_rope(dim, f, h, w, scale, dtype=torch.float32)
    np.testing.assert_allclose(np.asarray(cos_j), cos_t32[0].numpy(), atol=2e-2, rtol=0)
    np.testing.assert_allclose(np.asarray(sin_j), sin_t32[0].numpy(), atol=2e-2, rtol=0)


def test_ltx_rope_application_matches_diffusers():
    dim, f, h, w = 2048, 2, 3, 4
    scale = (8.0 / 25.0, 32.0, 32.0)
    rng = np.random.RandomState(0)
    x = rng.randn(2, f * h * w, dim).astype(np.float32)

    cos_t, sin_t = _torch_ltx_rope(dim, f, h, w, scale)
    out_t = _torch_apply_rotary_emb(torch.from_numpy(x), (cos_t, sin_t)).numpy()

    rope = LTXRotaryPosEmbed(dim=dim)
    cos_j, sin_j = rope(f, h, w, scale)
    out_j = np.asarray(apply_ltx_rotary_emb(jnp.asarray(x), cos_j, sin_j))

    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=2e-5)
    # rotation is norm-preserving per pair
    np.testing.assert_allclose(
        np.linalg.norm(out_j, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )
