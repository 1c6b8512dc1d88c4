"""tpu_flash provider: dispatch rules everywhere, numerics on a real TPU.

The kernel itself only runs on TPU hardware (the CPU test mesh exercises the
fallback paths); numerics vs _native_math are asserted when a TPU backend is
present (the driver's bench environment)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.ops import attention_dispatch  # noqa: E402
from finetrainers_tpu.ops.attention import _pick_flash_block  # noqa: E402


def test_pick_flash_block():
    assert _pick_flash_block(2688) == 896  # 2688 = 3 * 896
    assert _pick_flash_block(4096) == 1024
    assert _pick_flash_block(16384) == 1024
    assert _pick_flash_block(384) == 384
    assert _pick_flash_block(100) is None  # not a multiple of 128
    assert _pick_flash_block(128) == 128


def test_auto_provider_falls_back_off_tpu():
    """On a CPU mesh, "auto" must route to the XLA fused path and match math."""
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 256, 4, 64), jnp.float32)
    ref = attention_dispatch(q, q, q, provider="_native_math")
    out = attention_dispatch(q, q, q, provider="auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tpu_flash_provider_falls_back_for_cross_attention():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 256, 4, 64), jnp.float32)
    kv = jnp.asarray(rng.randn(1, 64, 4, 64), jnp.float32)
    ref = attention_dispatch(q, kv, kv, provider="_native_math")
    out = attention_dispatch(q, kv, kv, provider="tpu_flash")  # Sq != Skv -> fused path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs a real TPU backend")
class TestTpuFlashNumerics:
    def test_matches_math(self):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, 2688, 4, 64), jnp.float32)
        ref = attention_dispatch(q, q, q, provider="_native_math")
        out = attention_dispatch(q, q, q, provider="tpu_flash")
        assert float(jnp.abs(out - ref).max()) < 2e-2  # MXU bf16 passes

    def test_kv_lens_segment_ids(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(2, 2688, 4, 64), jnp.float32)
        kv_lens = jnp.asarray([2688, 1500], jnp.int32)
        ref = attention_dispatch(q, q, q, provider="_native_math", kv_lens=kv_lens)
        out = attention_dispatch(q, q, q, provider="tpu_flash", kv_lens=kv_lens)
        assert float(jnp.abs(out - ref).max()) < 2e-2

    def test_gradients_match_math(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 2688, 2, 64), jnp.float32)

        def loss(prov):
            return lambda q: attention_dispatch(q, q, q, provider=prov).astype(jnp.float32).sum()

        g_ref = jax.grad(loss("_native_math"))(q)
        g_out = jax.grad(loss("tpu_flash"))(q)
        assert float(jnp.abs(g_out - g_ref).max()) < 5e-2


def test_tagged_residuals_skip_fwd_replay_under_remat():
    """The tagged custom_vjp saves o/l/m under the "ops" policy, so the remat
    backward holds 3 kernel calls (fwd + dkv + dq); the plain in-tree kernel
    replays its forward as a 4th (profiled as a full extra flash fwd/layer)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes, flash_attention

    from finetrainers_tpu.ops.attention import _make_tagged_tpu_flash
    from finetrainers_tpu.utils.activation_checkpoint import get_checkpoint_policy

    b = 128
    bs = BlockSizes(block_q=b, block_k_major=b, block_k=b, block_b=1,
                    block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b, block_q_dkv=b,
                    block_k_major_dq=b, block_k_dq=b, block_q_dq=b)
    q = jnp.zeros((1, 2, 128, 64), jnp.float32)
    policy = get_checkpoint_policy("ops")

    tagged = _make_tagged_tpu_flash()
    f_t = lambda x: jnp.sum(tagged(x, x, x, False, 0.125, bs))
    f_p = lambda x: jnp.sum(flash_attention(x, x, x, causal=False, sm_scale=0.125, block_sizes=bs))
    jaxpr_tagged = str(jax.make_jaxpr(jax.grad(jax.checkpoint(f_t, policy=policy)))(q))
    jaxpr_plain = str(jax.make_jaxpr(jax.grad(jax.checkpoint(f_p, policy=policy)))(q))
    assert jaxpr_tagged.count("pallas_call") == 3
    assert jaxpr_plain.count("pallas_call") == 4


class TestForwardKernelVariants:
    """The env-gated forward-kernel experiments must stay bit-identical to the
    straight kernel (interpret mode here; measured on-chip via
    tools/attn_bench.py — docs/perf.md records the accept/reject numbers).

    - FINETRAINERS_FLASH_SKEW: software-pipelined forward (tile j's score
      matmul issued alongside tile j-1's softmax sweep; +1 drain iteration).
    - FINETRAINERS_FLASH_TWOLEVEL: block-local-max softmax, cross-tile stats
      combined per-row after the P@V matmul.
    - FINETRAINERS_FLASH_TWOPASS: max pass then accumulate pass against the
      final max (recurrence-free; +50% score matmuls).
    """

    VARIANTS = [
        "FINETRAINERS_FLASH_SKEW",
        "FINETRAINERS_FLASH_TWOLEVEL",
        "FINETRAINERS_FLASH_TWOPASS",
    ]

    def _run(self, monkeypatch, env, H=64, **kw):
        from finetrainers_tpu.ops.flash_attention import flash_attention

        for name in self.VARIANTS:
            monkeypatch.delenv(name, raising=False)
        if env:
            monkeypatch.setenv(env, "1")
        rng = np.random.RandomState(7)
        B, S, N = 2, 40, 3
        q = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)

        def loss(q):
            return jnp.sum(flash_attention(q, k, v, block_q=16, block_kv=16, **kw) ** 2)

        out = flash_attention(q, k, v, block_q=16, block_kv=16, **kw)
        return np.asarray(out), np.asarray(jax.grad(loss)(q))

    @pytest.mark.parametrize("env", VARIANTS)
    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"kv_lens": jnp.asarray([33, 17], jnp.int32)},
            # H=128 disables fuse_rowsum: exercises the two-level
            # l-bookkeeping branch (the Wan/Flux head-dim regime).
            {"H": 128},
            {"H": 128, "kv_lens": jnp.asarray([33, 17], jnp.int32)},
        ],
        ids=["plain", "kv_lens", "h128", "h128_kv_lens"],
    )
    def test_matches_straight_kernel(self, monkeypatch, env, kw):
        out, grad = self._run(monkeypatch, env, **kw)
        ref_out, ref_grad = self._run(monkeypatch, None, **kw)
        if env == "FINETRAINERS_FLASH_SKEW":
            # Identical arithmetic, reordered across iterations: bit-exact.
            np.testing.assert_array_equal(out, ref_out)
        else:
            # Two-level rounds differently (exp2 vs local max, then a separate
            # beta multiply): equivalent within float ulps, not bit-exact.
            np.testing.assert_allclose(out, ref_out, atol=1e-6)
        atol = 1e-6 if env == "FINETRAINERS_FLASH_SKEW" else 5e-6
        np.testing.assert_allclose(grad, ref_grad, atol=atol)

    @pytest.mark.parametrize("env", ["FINETRAINERS_FLASH_SKEW", "FINETRAINERS_FLASH_TWOPASS"])
    def test_variant_rope_and_segments(self, monkeypatch, env):
        from finetrainers_tpu.ops.flash_attention import flash_attention

        rng = np.random.RandomState(3)
        B, S, N, H = 2, 40, 3, 64
        q = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, N, H), jnp.float32)
        cos = jnp.asarray(rng.randn(S, H), jnp.float32)
        sin = jnp.asarray(rng.randn(S, H), jnp.float32)
        seg = jnp.asarray(rng.randint(0, 3, (B, S)), jnp.int32)

        def run():
            a = flash_attention(q, k, v, block_q=16, block_kv=16,
                                rope_cos=cos, rope_sin=sin)
            b = flash_attention(q, k, v, block_q=16, block_kv=16,
                                q_segment_ids=seg, kv_segment_ids=seg)
            return np.asarray(a), np.asarray(b)

        monkeypatch.setenv(env, "1")
        a1, b1 = run()
        monkeypatch.delenv(env)
        a0, b0 = run()
        if env == "FINETRAINERS_FLASH_SKEW":
            # skew is gated off rope (falls back to the straight kernel) and
            # bit-exact on segments.
            np.testing.assert_array_equal(a1, a0)
            np.testing.assert_array_equal(b1, b0)
        else:
            # twopass actually runs on both paths; same quantities, different
            # f32 summation order (no alpha rescales).
            np.testing.assert_allclose(a1, a0, atol=2e-6)
            np.testing.assert_allclose(b1, b0, atol=2e-6)
