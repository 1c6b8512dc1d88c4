"""Offline parity oracles: run the REFERENCE'S OWN torch code against this repo.

The reference repo at /root/reference cannot run end-to-end here (diffusers is
not installed, no network egress), but its pure-torch leaf modules import
cleanly by file path: functional/{diffusion,image,video,text,normalization}.py,
data/sampler.py, and optimizer.py's seven LR-schedule lambdas. torch's
F.scaled_dot_product_attention is likewise available as an external oracle for
the attention providers. This file executes those as oracles and asserts
equivalence with this repo on identical inputs (VERDICT r4 "Next round" item 2).

Reference lines cited per test. The reference code is treated as an opaque
numeric oracle — only its outputs are consumed.
"""

from __future__ import annotations

import importlib
import importlib.util
import math
import os
import sys
import types
from enum import Enum

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/finetrainers"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not present")


def _load_ref_file(relpath: str, name: str):
    """Load a reference module by file path (absolute-import-only modules)."""
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_diffusion():
    return _load_ref_file("functional/diffusion.py", "_ref_diffusion")


@pytest.fixture(scope="module")
def ref_image():
    return _load_ref_file("functional/image.py", "_ref_image")


@pytest.fixture(scope="module")
def ref_video():
    return _load_ref_file("functional/video.py", "_ref_video")


@pytest.fixture(scope="module")
def ref_text():
    return _load_ref_file("functional/text.py", "_ref_text")


@pytest.fixture(scope="module")
def ref_norm():
    return _load_ref_file("functional/normalization.py", "_ref_norm")


@pytest.fixture(scope="module")
def ref_sampler():
    return _load_ref_file("data/sampler.py", "_ref_sampler")


@pytest.fixture(scope="module")
def ref_optimizer():
    """optimizer.py uses two relative imports (.parallel, .utils.import_utils);
    stub them in a synthetic package so the module executes unmodified
    (reference optimizer.py:13-14)."""
    pkg = types.ModuleType("_reffr")
    pkg.__path__ = [REF]
    sys.modules["_reffr"] = pkg

    par = types.ModuleType("_reffr.parallel")

    class ParallelBackendEnum(str, Enum):
        ACCELERATE = "accelerate"
        PTD = "ptd"

    par.ParallelBackendEnum = ParallelBackendEnum
    sys.modules["_reffr.parallel"] = par

    utils_pkg = types.ModuleType("_reffr.utils")
    utils_pkg.__path__ = [os.path.join(REF, "utils")]
    sys.modules["_reffr.utils"] = utils_pkg
    iu = types.ModuleType("_reffr.utils.import_utils")
    iu.is_bitsandbytes_available = lambda: False
    sys.modules["_reffr.utils.import_utils"] = iu

    return importlib.import_module("_reffr.optimizer")


# --------------------------------------------------------------- flow matching


class TestFlowMatchOracle:
    """vs reference functional/diffusion.py:4-11."""

    def test_flow_match_xt_and_target(self, ref_diffusion):
        from finetrainers_tpu.functional import flow_match_target, flow_match_xt

        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
        n = rng.standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
        t = rng.uniform(0, 1, (2, 1, 1, 1, 1)).astype(np.float32)

        ref_xt = ref_diffusion.flow_match_xt(torch.from_numpy(x0), torch.from_numpy(n), torch.from_numpy(t))
        ref_tgt = ref_diffusion.flow_match_target(torch.from_numpy(n), torch.from_numpy(x0))
        ours_xt = flow_match_xt(jnp.asarray(x0), jnp.asarray(n), jnp.asarray(t))
        ours_tgt = flow_match_target(jnp.asarray(n), jnp.asarray(x0))

        np.testing.assert_allclose(np.asarray(ours_xt), ref_xt.numpy(), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours_tgt), ref_tgt.numpy(), rtol=1e-6, atol=1e-6)


# --------------------------------------------------------------- LR schedules


class TestLRScheduleOracle:
    """Point-for-point over 1000 steps vs reference optimizer.py:191-437."""

    LR = 3e-4
    STEPS = 1000

    def _ours(self, name, **kw):
        from finetrainers_tpu.optimizer import get_lr_scheduler

        sched = get_lr_scheduler(name, self.LR, **kw)
        return np.array([float(sched(s)) for s in range(self.STEPS)])

    def _assert_match(self, ours, lr_lambda):
        ref = np.array([self.LR * lr_lambda(s) for s in range(self.STEPS)])
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-9)

    def test_constant(self, ref_optimizer):
        self._assert_match(self._ours("constant"), ref_optimizer.get_constant_schedule())

    @pytest.mark.parametrize("warmup", [0, 1, 50])
    def test_constant_with_warmup(self, ref_optimizer, warmup):
        self._assert_match(
            self._ours("constant_with_warmup", warmup_steps=warmup),
            ref_optimizer.get_constant_schedule_with_warmup(warmup),
        )

    @pytest.mark.parametrize("warmup", [0, 50])
    def test_linear(self, ref_optimizer, warmup):
        self._assert_match(
            self._ours("linear", warmup_steps=warmup, train_steps=self.STEPS),
            ref_optimizer.get_linear_schedule_with_warmup(warmup, self.STEPS),
        )

    @pytest.mark.parametrize("warmup,cycles", [(0, 1), (50, 1), (50, 0.5), (100, 2)])
    def test_cosine(self, ref_optimizer, warmup, cycles):
        self._assert_match(
            self._ours("cosine", warmup_steps=warmup, train_steps=self.STEPS, num_cycles=cycles),
            ref_optimizer.get_cosine_schedule_with_warmup(warmup, self.STEPS, cycles),
        )

    @pytest.mark.parametrize("warmup,cycles", [(0, 1), (50, 2), (50, 3)])
    def test_cosine_with_restarts(self, ref_optimizer, warmup, cycles):
        self._assert_match(
            self._ours("cosine_with_restarts", warmup_steps=warmup, train_steps=self.STEPS, num_cycles=cycles),
            ref_optimizer.get_cosine_with_hard_restarts_schedule_with_warmup(warmup, self.STEPS, cycles),
        )

    @pytest.mark.parametrize("warmup,power", [(0, 1.0), (50, 1.0), (50, 2.0)])
    def test_polynomial(self, ref_optimizer, warmup, power):
        self._assert_match(
            self._ours("polynomial", warmup_steps=warmup, train_steps=self.STEPS, power=power),
            ref_optimizer.get_polynomial_decay_schedule_with_warmup(warmup, self.STEPS, self.LR, 1e-7, power),
        )

    @pytest.mark.parametrize("rules", ["1:10,0.1:20,0.01:30,0.005", "1:100,0.5:500,0.25", "0.8:7,0.4"])
    def test_piecewise_constant(self, ref_optimizer, rules):
        self._assert_match(
            self._ours("piecewise_constant", step_rules=rules),
            ref_optimizer.get_piecewise_constant_schedule(rules),
        )


# --------------------------------------------------------------- image ops


class TestImageOpsOracle:
    """vs reference functional/image.py. Ours runs cv2 (native C++) on numpy;
    the reference runs torch F.interpolate — both use half-pixel sampling with
    a=-0.75 bicubic, so numerics agree to float tolerance."""

    BUCKETS = [(256, 256), (512, 768), (768, 512), (480, 832), (320, 320)]

    def test_find_nearest_resolution(self, ref_image):
        from finetrainers_tpu.functional import find_nearest_resolution_image

        rng = np.random.default_rng(1)
        for _ in range(100):
            h = int(rng.integers(100, 1200))
            w = int(rng.integers(100, 1200))
            img = np.zeros((3, h, w), np.float32)
            ref = ref_image.find_nearest_resolution_image(torch.zeros(3, h, w), self.BUCKETS)
            ours = find_nearest_resolution_image(img, self.BUCKETS)
            assert tuple(ours) == tuple(ref), (h, w)

    def test_center_crop(self, ref_image):
        from finetrainers_tpu.functional import center_crop_image

        rng = np.random.default_rng(2)
        img = rng.standard_normal((3, 500, 700)).astype(np.float32)
        ref = ref_image.center_crop_image(torch.from_numpy(img), (256, 256))
        ours = center_crop_image(img, (256, 256))
        np.testing.assert_array_equal(ours, ref.numpy())

    @pytest.mark.parametrize("size", [(256, 256), (320, 480)])
    def test_bicubic(self, ref_image, size):
        from finetrainers_tpu.functional import bicubic_resize_image

        rng = np.random.default_rng(3)
        img = rng.uniform(-1, 1, (3, 200, 300)).astype(np.float32)
        ref = ref_image.bicubic_resize_image(torch.from_numpy(img), size)
        ours = bicubic_resize_image(img, size)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------- video ops


class TestVideoOpsOracle:
    """vs reference functional/video.py:36-96."""

    BUCKETS = [(1, 256, 256), (9, 256, 256), (9, 320, 480), (25, 512, 768), (49, 480, 832), (49, 512, 768)]

    def test_find_nearest_video_resolution(self, ref_video):
        from finetrainers_tpu.functional import find_nearest_video_bucket

        rng = np.random.default_rng(4)
        for _ in range(100):
            t = int(rng.integers(1, 80))
            h = int(rng.integers(100, 900))
            w = int(rng.integers(100, 900))
            vid = np.zeros((t, 3, h, w), np.float32)
            ref = ref_video.find_nearest_video_resolution(torch.zeros(t, 3, h, w), self.BUCKETS)
            ours = find_nearest_video_bucket(vid, self.BUCKETS)
            assert tuple(ours) == tuple(ref), (t, h, w)

    def test_frame_downsample_and_center_crop_exact(self, ref_video):
        """center_crop mode after linspace frame selection is pure indexing —
        bitwise equal (reference video.py:78-90)."""
        from finetrainers_tpu.functional import resize_to_nearest_bucket_video

        rng = np.random.default_rng(5)
        vid = rng.standard_normal((60, 3, 600, 900)).astype(np.float32)
        ref, ref_flag = ref_video.resize_to_nearest_bucket_video(
            torch.from_numpy(vid), self.BUCKETS, "center_crop"
        )
        ours, ours_flag = resize_to_nearest_bucket_video(vid, self.BUCKETS, "center_crop")
        assert ours_flag == ref_flag
        np.testing.assert_array_equal(ours, ref.numpy())

    @pytest.mark.parametrize("mode", ["bicubic", "resize_crop"])
    def test_resize_modes_close(self, ref_video, mode):
        from finetrainers_tpu.functional import resize_to_nearest_bucket_video

        rng = np.random.default_rng(6)
        vid = rng.uniform(-1, 1, (30, 3, 300, 400)).astype(np.float32)
        ref, _ = ref_video.resize_to_nearest_bucket_video(torch.from_numpy(vid), self.BUCKETS, mode)
        ours, _ = resize_to_nearest_bucket_video(vid, self.BUCKETS, mode)
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------- text ops


class TestTextOracle:
    """vs reference functional/text.py."""

    def test_convert_byte_str(self, ref_text):
        from finetrainers_tpu.functional import convert_byte_str_to_str

        for s in ["b'hello world'", 'b"quoted"', "b'caf\\xc3\\xa9'"]:
            # Both decode the stringified-bytes form the same way
            assert convert_byte_str_to_str(s) == ref_text.convert_byte_str_to_str(s)

    def test_remove_prefix(self, ref_text):
        from finetrainers_tpu.functional import remove_prefix

        prefixes = ["The video shows", "This image depicts", "In this video,"]
        cases = [
            "The video shows a cat.",
            "This image depicts   a dog.",
            "In this video, things happen",
            "No prefix here",
            "",
        ]
        for c in cases:
            assert remove_prefix(c, prefixes) == ref_text.remove_prefix(c, prefixes)

    def test_dropout_caption_semantics(self, ref_text):
        from finetrainers_tpu.functional import dropout_caption

        # p=0 identity, p=1 empties — deterministic ends of the bernoulli
        assert dropout_caption("abc", 0.0) == ref_text.dropout_caption("abc", 0.0)
        assert dropout_caption("abc", 1.0) == ref_text.dropout_caption("abc", 1.0)
        assert dropout_caption(["a", "b"], 1.0) == ref_text.dropout_caption(["a", "b"], 1.0)


# --------------------------------------------------------------- normalization


class TestNormalizationOracle:
    """vs reference functional/normalization.py:7-37."""

    @pytest.mark.parametrize("dim", [None, 0, 1, -1])
    def test_normalize(self, ref_norm, dim):
        from finetrainers_tpu.functional import normalize

        rng = np.random.default_rng(7)
        x = rng.uniform(-5, 9, (4, 6, 8)).astype(np.float32)
        ref = ref_norm.normalize(torch.from_numpy(x), min=-1.0, max=1.0, dim=dim)
        ours = normalize(x, min=-1.0, max=1.0, dim=dim)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_normalize_degenerate(self, ref_norm):
        from finetrainers_tpu.functional import normalize

        x = np.full((3, 3), 2.5, np.float32)
        ref = ref_norm.normalize(torch.from_numpy(x), min=-1.0, max=1.0)
        ours = normalize(x, min=-1.0, max=1.0)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy())


# --------------------------------------------------------------- sampler


class TestResolutionSamplerOracle:
    """vs reference data/sampler.py:6-58, driven the way the trainer drives it
    (drain as soon as a batch is ready — trainer/sft_trainer/trainer.py:405-423),
    under which both implementations must emit identical batch sequences."""

    def test_batch_sequence_parity(self, ref_sampler):
        from finetrainers_tpu.data.sampler import ResolutionSampler

        dim_keys = {"latents": (2, 3, 4)}
        shapes = [(1, 8, 5, 16, 24), (1, 8, 9, 32, 32), (1, 8, 5, 24, 16)]
        rng = np.random.default_rng(8)

        ref = ref_sampler.ResolutionSampler(batch_size=2, dim_keys=dim_keys)
        ours = ResolutionSampler(batch_size=2, dim_keys=dim_keys)

        ref_batches, our_batches = [], []
        for i in range(24):
            shape = shapes[int(rng.integers(0, len(shapes)))]
            cond = {"idx": i}
            lat_t = {"latents": torch.zeros(shape), "idx": i}
            lat_n = {"latents": np.zeros(shape), "idx": i}

            ref.consume(cond, lat_t)
            while ref.is_ready:
                conds, lats = ref.get_batch()
                ref_batches.append(([c["idx"] for c in conds], [l["idx"] for l in lats]))

            ours.consume(cond, lat_n)
            while ours.ready:
                conds, lats = ours.get_batch()
                our_batches.append(([c["idx"] for c in conds], [l["idx"] for l in lats]))

        assert ref_batches == our_batches
        assert len(ref_batches) > 0


# --------------------------------------------------------------- attention


def _torch_sdpa(q, k, v, attn_mask=None, is_causal=False, scale=None, enable_gqa=False):
    """torch oracle on (B, S, N, H) layout (torch wants (B, N, S, H))."""
    tq, tk, tv = (torch.from_numpy(np.asarray(x)).transpose(1, 2).double() for x in (q, k, v))
    tm = None
    if attn_mask is not None:
        m = torch.from_numpy(np.asarray(attn_mask))
        tm = m if m.dtype == torch.bool else m.double()
    out = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, attn_mask=tm, is_causal=is_causal, scale=scale, enable_gqa=enable_gqa
    )
    return out.transpose(1, 2).float().numpy()


class TestSDPAOracle:
    """torch F.scaled_dot_product_attention as an external oracle for the
    attention providers (the reference's `native` provider is exactly this op,
    attention_dispatch.py:938-962)."""

    PROVIDERS = ["native", "_native_math", "flash"]

    def _rand_qkv(self, b=2, sq=64, skv=64, n=4, nkv=None, h=32, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.standard_normal((b, sq, n, h)).astype(np.float32)
        k = rng.standard_normal((b, skv, nkv or n, h)).astype(np.float32)
        v = rng.standard_normal((b, skv, nkv or n, h)).astype(np.float32)
        return q, k, v

    @pytest.mark.parametrize("provider", PROVIDERS)
    def test_basic(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=10)
        ours = np.asarray(attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), provider=provider))
        ref = _torch_sdpa(q, k, v)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("provider", PROVIDERS)
    def test_causal(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=11)
        ours = np.asarray(
            attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True, provider=provider)
        )
        ref = _torch_sdpa(q, k, v, is_causal=True)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("provider", PROVIDERS)
    def test_custom_scale(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=12)
        ours = np.asarray(
            attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=0.05, provider=provider)
        )
        ref = _torch_sdpa(q, k, v, scale=0.05)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("provider", ["native", "_native_math", "flash"])
    def test_gqa(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(n=8, nkv=2, seed=13)
        ours = np.asarray(attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), provider=provider))
        ref = _torch_sdpa(q, k, v, enable_gqa=True)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("provider", ["native", "_native_math"])
    def test_bool_mask(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=14)
        rng = np.random.default_rng(14)
        # padding-style prefix mask (the reference normalizes masks to this form)
        lens = rng.integers(16, 64, size=(2,))
        mask = np.zeros((2, 1, 1, 64), bool)
        for i, L in enumerate(lens):
            mask[i, :, :, :L] = True
        ours = np.asarray(
            attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), attn_mask=jnp.asarray(mask), provider=provider)
        )
        ref = _torch_sdpa(q, k, v, attn_mask=mask)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("provider", ["native", "_native_math"])
    def test_additive_mask(self, provider):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=15)
        rng = np.random.default_rng(15)
        bias = (rng.standard_normal((2, 4, 64, 64)) * 0.5).astype(np.float32)
        ours = np.asarray(
            attention_dispatch(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), attn_mask=jnp.asarray(bias), provider=provider)
        )
        ref = _torch_sdpa(q, k, v, attn_mask=bias)
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_kv_lens_equals_torch_prefix_mask(self):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(seed=16)
        lens = np.array([37, 64], np.int32)
        mask = np.zeros((2, 1, 1, 64), bool)
        for i, L in enumerate(lens):
            mask[i, :, :, :L] = True
        for provider in ("native", "_native_math", "flash"):
            ours = np.asarray(
                attention_dispatch(
                    jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), kv_lens=jnp.asarray(lens), provider=provider
                )
            )
            ref = _torch_sdpa(q, k, v, attn_mask=mask)
            np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4, err_msg=provider)

    def test_dropout_expectation(self):
        """E[dropout attention] over rng draws ≈ torch's no-dropout output
        (inverted dropout is unbiased; torch semantics at dispatch:169-189)."""
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(b=1, sq=16, skv=16, n=2, h=16, seed=17)
        ref = _torch_sdpa(q, k, v)
        acc = np.zeros_like(ref)
        n_draws = 256
        for i in range(n_draws):
            acc += np.asarray(
                attention_dispatch(
                    jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    dropout_p=0.2, dropout_rng=jax.random.PRNGKey(i),
                )
            )
        mean = acc / n_draws
        # statistical bound: std of the estimator shrinks with sqrt(n_draws)
        assert np.max(np.abs(mean - ref)) < 0.15

    def test_dropout_with_segments_raises(self):
        from finetrainers_tpu.ops import attention_dispatch

        q, k, v = self._rand_qkv(b=1, seed=18)
        seg = jnp.ones((1, 64), jnp.int32)
        with pytest.raises(NotImplementedError):
            attention_dispatch(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                dropout_p=0.1, dropout_rng=jax.random.PRNGKey(0),
                q_segment_ids=seg, kv_segment_ids=seg,
            )
