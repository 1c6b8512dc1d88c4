"""Attention provider numerics: cross-provider allclose vs the math reference and
ring-attention CP tests (mirrors reference tests/models/attention_dispatch.py:36-260)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from finetrainers_tpu.ops import attention_dispatch, attention_provider, flash_attention, list_providers
from finetrainers_tpu.ops.ring_attention import ring_attention


def _qkv(b=2, sq=96, skv=96, n=4, h=32, dtype=jnp.float32, nkv=None):
    rng = jax.random.PRNGKey(0)
    nkv = nkv or n
    q = jax.random.normal(jax.random.fold_in(rng, 1), (b, sq, n, h), dtype=dtype)
    k = jax.random.normal(jax.random.fold_in(rng, 2), (b, skv, nkv, h), dtype=dtype)
    v = jax.random.normal(jax.random.fold_in(rng, 3), (b, skv, nkv, h), dtype=dtype)
    return q, k, v


TOL = {"native": 1e-5, "xla": 1e-5, "flash": 1e-4, "splash": 1e-4}


class TestProvidersForward:
    @pytest.mark.parametrize("provider", ["native", "xla", "flash", "splash"])
    def test_matches_math(self, provider):
        q, k, v = _qkv()
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = attention_dispatch(q, k, v, provider=provider)
        np.testing.assert_allclose(out, ref, atol=TOL[provider], rtol=1e-3)

    @pytest.mark.parametrize("provider", ["native", "flash"])
    def test_kv_lens(self, provider):
        q, k, v = _qkv()
        lens = jnp.array([50, 96], dtype=jnp.int32)
        ref = attention_dispatch(q, k, v, kv_lens=lens, provider="_native_math")
        out = attention_dispatch(q, k, v, kv_lens=lens, provider=provider)
        np.testing.assert_allclose(out, ref, atol=TOL[provider], rtol=1e-3)

    @pytest.mark.parametrize("provider", ["native", "flash"])
    def test_causal(self, provider):
        q, k, v = _qkv()
        ref = attention_dispatch(q, k, v, is_causal=True, provider="_native_math")
        out = attention_dispatch(q, k, v, is_causal=True, provider=provider)
        np.testing.assert_allclose(out, ref, atol=TOL[provider], rtol=1e-3)

    def test_gqa(self):
        q, k, v = _qkv(n=4, nkv=2)
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)

    def test_cross_attention_shapes(self):
        q, k, v = _qkv(sq=128, skv=77)
        out = flash_attention(q, k, v)
        assert out.shape == q.shape

    def test_bf16(self):
        q, k, v = _qkv(dtype=jnp.bfloat16)
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), atol=2e-2, rtol=1e-2
        )

    def test_bf16_large_exponents(self):
        """Bound the fuse_rowsum bf16 exponent rounding (ADVICE r4): the fused
        path computes exp2 on a bf16-rounded exponent, whose ulp grows with
        |s - m| (~0.06-0.125 beyond magnitude 8, i.e. up to ~9% relative error
        on SMALL probabilities). Amplified queries push |s - m| to ~40 so this
        regime is actually exercised; the error must stay bounded on the
        OUTPUT (small probabilities contribute proportionally little)."""
        q, k, v = _qkv(dtype=jnp.bfloat16)
        q = (q.astype(jnp.float32) * 6.0).astype(jnp.bfloat16)  # logits ~ +-40
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = flash_attention(q, k, v)
        np.testing.assert_allclose(
            out.astype(jnp.float32), ref.astype(jnp.float32), atol=4e-2, rtol=2e-2
        )


class TestProvidersBackward:
    @pytest.mark.parametrize("provider", ["flash"])
    def test_grads_match_math(self, provider):
        q, k, v = _qkv()
        lens = jnp.array([50, 96], dtype=jnp.int32)

        def loss(fn):
            return lambda q, k, v: (fn(q, k, v) ** 2).sum()

        g_ref = jax.grad(
            loss(lambda q, k, v: attention_dispatch(q, k, v, kv_lens=lens, provider="_native_math")),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_out = jax.grad(
            loss(lambda q, k, v: attention_dispatch(q, k, v, kv_lens=lens, provider=provider)),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_out, g_ref):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


class TestProviderRegistry:
    def test_list(self):
        providers = list_providers()
        for expected in ("native", "xla", "flash", "splash", "ring", "_native_math"):
            assert expected in providers

    def test_context_manager(self):
        from finetrainers_tpu.ops.attention import get_active_provider

        with attention_provider("flash"):
            assert get_active_provider() == "flash"
            with attention_provider("native"):
                assert get_active_provider() == "native"
            assert get_active_provider() == "flash"

    def test_unknown_provider_raises(self):
        with pytest.raises(ValueError):
            with attention_provider("nonexistent"):
                pass


class TestAttentionDropout:
    """dropout_p pass-through (reference attention_dispatch.py:118): with an
    explicit rng the math path applies inverted dropout; without one it fails
    loudly instead of silently ignoring it."""

    def _qkv(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8), jnp.float32)
        return q, q, q

    def test_requires_rng(self):
        q, k, v = self._qkv()
        with pytest.raises(ValueError, match="dropout_rng"):
            attention_dispatch(q, k, v, dropout_p=0.5)

    def test_zero_dropout_matches_math(self):
        q, k, v = self._qkv()
        base = attention_dispatch(q, k, v, provider="_native_math")
        out = attention_dispatch(q, k, v, dropout_p=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-5, rtol=2e-5)

    def test_dropout_perturbs_and_preserves_expectation(self):
        q, k, v = self._qkv()
        base = np.asarray(attention_dispatch(q, k, v, provider="_native_math"))
        keys = jax.random.split(jax.random.PRNGKey(7), 512)
        outs = jax.vmap(lambda r: attention_dispatch(q, k, v, dropout_p=0.3, dropout_rng=r))(keys)
        outs = np.asarray(outs)
        assert not np.allclose(outs[0], base)  # it actually drops
        # inverted dropout: the mean over rngs approaches the no-dropout output
        se = outs.std(axis=0) / np.sqrt(outs.shape[0])
        np.testing.assert_array_less(np.abs(outs.mean(axis=0) - base), 5 * se + 0.02)


@pytest.mark.parametrize("cp", [2, 4])
class TestRingAttentionCP:
    """CP2/CP4 ring attention vs full-sequence math attention (reference
    tests/models/attention_dispatch.py:150+ acceptance bar)."""

    def _mesh(self, cp):
        return Mesh(np.array(jax.devices()[:cp]).reshape(cp), ("cp",))

    def test_forward(self, cp):
        q, k, v = _qkv(b=1, sq=64, skv=64, n=2, h=32)
        mesh = self._mesh(cp)
        fn = jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="cp"),
            mesh=mesh,
            in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
            out_specs=P(None, "cp"),
            check_vma=False,
        )
        out = jax.jit(fn)(q, k, v)
        ref = attention_dispatch(q, k, v, provider="_native_math")
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)

    def test_backward(self, cp):
        q, k, v = _qkv(b=1, sq=64, skv=64, n=2, h=32)
        mesh = self._mesh(cp)
        fn = jax.shard_map(
            lambda q, k, v: ring_attention(q, k, v, axis_name="cp"),
            mesh=mesh,
            in_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
            out_specs=P(None, "cp"),
            check_vma=False,
        )
        g_ring = jax.jit(jax.grad(lambda q, k, v: (fn(q, k, v) ** 2).sum(), argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(
            lambda q, k, v: (attention_dispatch(q, k, v, provider="_native_math") ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


class TestFlashVarlen:
    """Packed varlen batching (reference flash_varlen, attention_dispatch.py:793-872):
    packed-with-segment-ids outputs/grads must equal running each sequence alone."""

    def _packed_case(self):
        from finetrainers_tpu.ops.attention import pack_sequences

        rng = jax.random.PRNGKey(7)
        n, h = 4, 32
        lens = [40, 56, 32]  # three sequences packed into one row (padded to 136)
        qs, ks, vs = [], [], []
        for i, s in enumerate(lens):
            qs.append(jax.random.normal(jax.random.fold_in(rng, 10 + i), (s, n, h)))
            ks.append(jax.random.normal(jax.random.fold_in(rng, 20 + i), (s, n, h)))
            vs.append(jax.random.normal(jax.random.fold_in(rng, 30 + i), (s, n, h)))
        total = 136  # includes 8 tokens of -1 padding
        packed_q, seg = pack_sequences(qs, total)
        packed_k, _ = pack_sequences(ks, total)
        packed_v, _ = pack_sequences(vs, total)
        return lens, qs, ks, vs, packed_q, packed_k, packed_v, seg

    def test_packed_matches_per_sequence(self):
        lens, qs, ks, vs, pq, pk, pv, seg = self._packed_case()
        out = attention_dispatch(pq, pk, pv, provider="flash_varlen",
                                 q_segment_ids=seg, kv_segment_ids=seg)
        offset = 0
        for i, s in enumerate(lens):
            ref = attention_dispatch(qs[i][None], ks[i][None], vs[i][None],
                                     provider="_native_math")
            np.testing.assert_allclose(
                np.asarray(out[0, offset:offset + s]), np.asarray(ref[0]),
                atol=2e-4, rtol=1e-3, err_msg=f"segment {i}")
            offset += s

    def test_packed_grads_match(self):
        lens, qs, ks, vs, pq, pk, pv, seg = self._packed_case()

        def packed_loss(q, k, v):
            out = attention_dispatch(q, k, v, provider="flash_varlen",
                                     q_segment_ids=seg, kv_segment_ids=seg)
            return jnp.sum(jnp.sin(out))

        gq, gk, gv = jax.grad(packed_loss, argnums=(0, 1, 2))(pq, pk, pv)

        offset = 0
        for i, s in enumerate(lens):
            def solo_loss(q, k, v):
                out = attention_dispatch(q, k, v, provider="flash")
                return jnp.sum(jnp.sin(out))

            rq, rk, rv = jax.grad(solo_loss, argnums=(0, 1, 2))(
                qs[i][None], ks[i][None], vs[i][None])
            np.testing.assert_allclose(np.asarray(gq[0, offset:offset + s]),
                                       np.asarray(rq[0]), atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(np.asarray(gk[0, offset:offset + s]),
                                       np.asarray(rk[0]), atol=2e-4, rtol=1e-3)
            np.testing.assert_allclose(np.asarray(gv[0, offset:offset + s]),
                                       np.asarray(rv[0]), atol=2e-4, rtol=1e-3)
            offset += s
        # padding tokens got zero grads
        assert float(jnp.abs(gq[0, sum(lens):]).max()) == 0.0

    def test_padding_mask_normalizes_to_kv_lens(self):
        q, k, v = _qkv(b=2, sq=64, skv=64)
        mask = jnp.ones((2, 1, 64, 64), bool).at[1, :, :, 48:].set(False)
        out = attention_dispatch(q, k, v, attn_mask=mask, provider="flash_varlen")
        ref = attention_dispatch(q, k, v, kv_lens=jnp.asarray([64, 48]),
                                 provider="_native_math")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)

    def test_dispatch_routes_segments_to_varlen(self):
        lens, qs, ks, vs, pq, pk, pv, seg = self._packed_case()
        out = attention_dispatch(pq, pk, pv, q_segment_ids=seg, kv_segment_ids=seg)
        out2 = attention_dispatch(pq, pk, pv, provider="flash_varlen",
                                  q_segment_ids=seg, kv_segment_ids=seg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


class TestSageInt8:
    """INT8 QK^T attention (sage parity, reference attention_dispatch.py:1543-1765):
    quantized output must track the fp32 math reference closely."""

    def test_matches_math_within_quant_tolerance(self):
        q, k, v = _qkv(b=2, sq=128, skv=128, n=4, h=64)
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = attention_dispatch(q, k, v, provider="sage")
        err = float(jnp.abs(out - ref).max())
        assert err < 3e-2, err  # int8 quantization noise bound

    def test_kv_lens(self):
        q, k, v = _qkv(b=2, sq=64, skv=64)
        lens = jnp.asarray([64, 40])
        ref = attention_dispatch(q, k, v, kv_lens=lens, provider="_native_math")
        out = attention_dispatch(q, k, v, kv_lens=lens, provider="sage")
        assert float(jnp.abs(out - ref).max()) < 3e-2

    def test_smooth_k_invariance(self):
        """Adding a constant vector to every K must not change the output
        (softmax shift-invariance — the smooth_k trick relies on it)."""
        q, k, v = _qkv(b=1, sq=64, skv=64)
        shift = jnp.full_like(k, 3.0)
        out1 = attention_dispatch(q, k, v, provider="sage")
        out2 = attention_dispatch(q, k + shift, v, provider="sage")
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=5e-2)

    def test_all_variant_names_registered(self):
        providers = list_providers()
        for name in ("sage", "sage_varlen", "_sage_qk_int8_pv_fp16_cuda",
                     "_sage_qk_int8_pv_fp16_triton", "_sage_qk_int8_pv_fp8_cuda",
                     "_sage_qk_int8_pv_fp8_cuda_sm90"):
            assert name in providers


class TestFlexBlockMask:
    """flex provider (reference attention_dispatch.py:875-935): tensor block
    masks run through the Pallas kernel with block-sparse tile skipping; output
    and grads must equal the dense-masked math reference."""

    def _mask(self, b=2, sq=96, skv=96):
        # Block-structured mask: second half of queries only attends to the
        # first third of keys; plus a fully-masked stripe to exercise skipping.
        m = np.ones((b, sq, skv), bool)
        m[:, sq // 2:, skv // 3:] = False
        m[:, :8, :] = False  # fully-masked q rows (zero-prob edge case)
        return jnp.asarray(m)

    def test_forward_matches_math(self):
        q, k, v = _qkv()
        mask = self._mask()
        ref = attention_dispatch(q, k, v, attn_mask=mask[:, None], provider="_native_math")
        out = attention_dispatch(q, k, v, attn_mask=mask[:, None], provider="flex")
        # compare only rows that attend to something (fully-masked rows are
        # undefined: math gives uniform attention, flex gives zeros)
        valid = np.asarray(mask.any(-1))
        np.testing.assert_allclose(
            np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-4, rtol=1e-3)

    def test_grads_match_math(self):
        q, k, v = _qkv(b=1)
        mask = jnp.asarray(np.ones((1, 96, 96), bool)).at[:, 48:, 32:].set(False)

        def loss(provider):
            def fn(q, k, v):
                out = attention_dispatch(q, k, v, attn_mask=mask[:, None], provider=provider)
                return jnp.sum(jnp.cos(out))
            return jax.grad(fn, argnums=(0, 1, 2))(q, k, v)

        gf = loss("flex")
        gr = loss("_native_math")
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)

    def test_aten_alias_names_registered(self):
        providers = list_providers()
        for name in ("flex", "_native_cudnn", "_native_efficient", "_native_flash", "xformers"):
            assert name in providers


class TestFusedRope:
    """In-kernel interleaved-pair RoPE (flash fwd + transpose rotation in bwd)
    vs XLA rotation outside the kernel."""

    def _tables(self, s, d):
        ph = jax.random.uniform(jax.random.PRNGKey(7), (s, d // 2), jnp.float32) * 10
        return jnp.repeat(jnp.cos(ph), 2, axis=-1), jnp.repeat(jnp.sin(ph), 2, axis=-1)

    def test_forward_matches_external_rotation(self):
        from finetrainers_tpu.ops.attention import _rotate_interleaved_4d

        q, k, v = _qkv(b=1, sq=128, skv=128, n=4, h=32)
        cos, sin = self._tables(128, 4 * 32)
        ref = flash_attention(
            _rotate_interleaved_4d(q, cos, sin), _rotate_interleaved_4d(k, cos, sin), v,
            block_q=64, block_kv=64,
        )
        fused = flash_attention(q, k, v, block_q=64, block_kv=64, rope_cos=cos, rope_sin=sin)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_grads_match_external_rotation(self):
        from finetrainers_tpu.ops.attention import _rotate_interleaved_4d

        q, k, v = _qkv(b=1, sq=128, skv=128, n=4, h=32)
        cos, sin = self._tables(128, 4 * 32)

        def loss_ref(q, k, v):
            out = flash_attention(
                _rotate_interleaved_4d(q, cos, sin), _rotate_interleaved_4d(k, cos, sin), v,
                block_q=64, block_kv=64,
            )
            return jnp.sum(jnp.cos(out))

        def loss_fused(q, k, v):
            out = flash_attention(q, k, v, block_q=64, block_kv=64, rope_cos=cos, rope_sin=sin)
            return jnp.sum(jnp.cos(out))

        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3)

    def test_dispatch_routes_rope_to_kernel_and_fallback(self):
        q, k, v = _qkv(b=1, sq=128, skv=128, n=4, h=32)
        cos, sin = self._tables(128, 4 * 32)
        out_flash = attention_dispatch(q, k, v, provider="flash", rope_freqs=(cos, sin))
        out_math_path = attention_dispatch(q, k, v, provider="_native_math", rope_freqs=(cos, sin))
        np.testing.assert_allclose(
            np.asarray(out_flash), np.asarray(out_math_path), atol=2e-4, rtol=1e-3
        )

    def test_rope_with_kv_lens(self):
        q, k, v = _qkv(b=2, sq=128, skv=128, n=4, h=32)
        cos, sin = self._tables(128, 4 * 32)
        kv_lens = jnp.asarray([128, 80], jnp.int32)
        out = attention_dispatch(q, k, v, provider="flash", kv_lens=kv_lens, rope_freqs=(cos, sin))
        ref = attention_dispatch(q, k, v, provider="_native_math", kv_lens=kv_lens,
                                 rope_freqs=(cos, sin))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


class TestIndivisibleSequenceLengths:
    """The CogVideoX joint stream is 226 text + video tokens — e.g. 20194 at
    49x512x768 — which has NO 128-multiple divisor. The auto provider must
    still route such shapes to the Pallas kernel (which pads to the block
    multiple internally and masks padded KV), not fall back to the XLA path
    that materializes the (B*N, S, S) score tensor (4.8 GB fp32 at that scale;
    regression for the floor-bench OOM)."""

    def test_padded_block_picker(self):
        from finetrainers_tpu.ops.attention import (
            _pick_flash_block,
            _pick_padded_flash_block,
        )

        # Divisible lengths keep their exact tuned block.
        assert _pick_padded_flash_block(2688) == _pick_flash_block(2688) == 896
        assert _pick_padded_flash_block(16384) == 1024
        # CogVideoX 49x512x768: 20194 -> 1024 blocks (20480 padded, 1.4% waste).
        assert _pick_padded_flash_block(20194) == 1024
        # Worst-case just over the kernel threshold: padding capped at 12.5%.
        blk = _pick_padded_flash_block(2049)
        assert -(-2049 // blk) * blk <= 2049 * 1.125
        # Always a usable block (kernel pads), never None.
        for s in (2049, 3001, 20194, 20195, 131071):
            assert _pick_padded_flash_block(s) % 128 == 0

    def test_flash_forward_and_grads_at_indivisible_length(self):
        # 2338 = 2 * 7 * 167: no 128-multiple divisor, >= 2048 kernel threshold.
        q, k, v = _qkv(b=1, sq=2338, skv=2338, n=2, h=32)
        ref = attention_dispatch(q, k, v, provider="_native_math")
        out = attention_dispatch(q, k, v, provider="flash")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)

        def loss(fn):
            def f(q, k, v):
                return jnp.sum(attention_dispatch(q, k, v, provider=fn) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        gr = loss("_native_math")
        gf = loss("flash")
        for a, b in zip(gr, gf):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3, rtol=1e-2)


class TestAutoRouting:
    """The `auto` provider's kernel-vs-XLA routing is TPU-only at runtime, so
    the CPU suite can't exercise the dispatch itself — the decision rule is a
    pure function tested here against every production shape (numerics of the
    routed kernel are covered on-chip by tools/wan_attn_bench.py check)."""

    def _route(self, sq, skv, nq=12, nkv=12, has_mask=False, backend="tpu"):
        from finetrainers_tpu.ops.attention import _auto_routes_to_kernel

        return _auto_routes_to_kernel(sq, skv, nq, nkv, has_mask, backend=backend)

    def test_production_shapes(self):
        assert self._route(2688, 2688)            # LTX self-attention
        assert not self._route(2688, 226)         # LTX caption cross -> XLA fused
        assert self._route(19968, 19968)          # Wan self-attention
        assert self._route(19968, 512)            # Wan text cross -> kernel (round 5)
        assert not self._route(19968, 257)        # Wan I2V image-KV (short) -> XLA
        assert self._route(20194, 20194)          # CogVideoX indivisible joint stream
        assert self._route(4320, 4320)            # CogView4 joint self-attention

    def test_gates(self):
        assert not self._route(19968, 512, backend="cpu")      # CPU mesh
        assert not self._route(19968, 512, nq=12, nkv=2)       # GQA -> XLA fused
        assert not self._route(19968, 19968, has_mask=True)    # dense mask
        assert not self._route(1024, 1024)                     # short q
        assert not self._route(19968, 384 - 1)                 # sub-threshold kv
        assert self._route(2048, 384)                          # boundary inclusive
