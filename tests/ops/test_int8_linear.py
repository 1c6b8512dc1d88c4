"""int8 frozen-weight matmul path (round-5 perf experiment).

Covers: the custom-VJP op numerics, the storage transform (sidecar scales,
skip patterns), LoRADense's int8 routing (incl. LoRA grads still flowing),
and merge_params' tolerance of the sidecar leaves. Reference analog: the
torch reference's layerwise-upcasting is storage-only
(trainer/sft_trainer/trainer.py:96-136); this path additionally moves the
frozen matmuls to the int8 MXU (docs/perf.md round 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finetrainers_tpu.ops.int8_linear import int8_linear, quantize_rows, quantize_weight
from finetrainers_tpu.utils.int8 import QSCALE_SUFFIX, apply_int8_storage


class TestInt8Linear:
    def test_quantize_roundtrip(self):
        rng = np.random.RandomState(0)
        w = jnp.asarray(rng.randn(64, 32) * 3.0, jnp.float32)
        wq, sw = quantize_weight(w)
        assert wq.dtype == jnp.int8 and sw.shape == (32,)
        deq = wq.astype(jnp.float32) * sw[None, :]
        np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=float(sw.max()) * 0.51)

    def test_fwd_matches_dequantized_reference(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(6, 64), jnp.bfloat16)
        w = jnp.asarray(rng.randn(64, 32), jnp.float32)
        wq, sw = quantize_weight(w)
        y = int8_linear(x, wq, sw).astype(jnp.float32)
        # Exact reference for the op itself: dequantized weight x quantized x.
        xq, sx = quantize_rows(x)
        ref = (xq.astype(jnp.float32) @ (wq.astype(jnp.float32) * sw[None, :])) * sx
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-2, atol=1e-2)
        # And close to the full-precision matmul (int8 quantization noise).
        full = np.asarray(x.astype(jnp.float32) @ w)
        rel = np.abs(np.asarray(y) - full).max() / np.abs(full).max()
        assert rel < 0.03

    @pytest.mark.parametrize("shape", [(4, 64), (2, 5, 64)])
    def test_grad_close_to_full_precision(self, shape):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        w = jnp.asarray(rng.randn(64, 48), jnp.float32)
        wq, sw = quantize_weight(w)
        g = jax.grad(lambda x: jnp.sum(int8_linear(x, wq, sw).astype(jnp.float32) ** 2))(x)
        gref = jax.grad(lambda x: jnp.sum((x.astype(jnp.float32) @ w) ** 2))(x)
        assert g.shape == x.shape and g.dtype == x.dtype
        rel = np.abs(np.asarray(g, np.float32) - np.asarray(gref, np.float32)).max()
        rel /= np.abs(np.asarray(gref, np.float32)).max()
        assert rel < 0.05


class TestInt8Storage:
    def _tree(self):
        rng = np.random.RandomState(3)
        return {
            "blocks_0": {
                "ff": {"kernel": jnp.asarray(rng.randn(16, 64), jnp.float32),
                       "bias": jnp.zeros((64,), jnp.float32)},
                "norm": {"kernel": jnp.asarray(rng.randn(16, 16), jnp.float32)},
            },
            "patch_embed": {"kernel": jnp.asarray(rng.randn(16, 16), jnp.float32)},
            "scale_shift_table": jnp.zeros((6, 16), jnp.float32),
        }

    def test_transform_adds_sidecars_and_skips(self):
        out = apply_int8_storage(self._tree())
        ff = out["blocks_0"]["ff"]
        assert ff["kernel"].dtype == jnp.int8
        assert ff["kernel" + QSCALE_SUFFIX].shape == (64,)
        assert ff["bias"].dtype == jnp.float32
        # skip patterns: norm / patch_embed / bare tables stay untouched
        assert out["blocks_0"]["norm"]["kernel"].dtype == jnp.float32
        assert out["patch_embed"]["kernel"].dtype == jnp.float32
        assert out["scale_shift_table"].dtype == jnp.float32

    def test_merge_params_tolerates_sidecars(self):
        from finetrainers_tpu.lora import merge_params

        frozen = apply_int8_storage(self._tree())
        trainable = {"blocks_0": {"ff": {"kernel": None, "bias": None}, "norm": {"kernel": None}},
                     "patch_embed": {"kernel": None},
                     "scale_shift_table": None,
                     "lora": {"lora_a": jnp.ones((2, 2))}}
        merged = merge_params(trainable, frozen)
        assert merged["blocks_0"]["ff"]["kernel"].dtype == jnp.int8
        assert merged["blocks_0"]["ff"]["kernel" + QSCALE_SUFFIX].shape == (64,)
        assert merged["lora"]["lora_a"].shape == (2, 2)


class TestInt8UnderScan:
    def test_scan_stacked_kernels_quantize_and_slice(self):
        """use_scan models stack block kernels to (L, in, F); the transform
        quantizes per (layer, out-channel) and flax's nn.scan slices the
        (L, F) qscale sidecar along axis 0 together with the kernel."""
        import flax.linen as nn

        from finetrainers_tpu.models.layers import LoRADense

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x, _):
                return x + LoRADense(16, use_bias=False, name="ff")(x), None

        class Stack(nn.Module):
            @nn.compact
            def __call__(self, x):
                scanned = nn.scan(
                    Block, variable_axes={"params": 0},
                    split_rngs={"params": True}, length=3,
                )
                y, _ = scanned(name="blocks")(x, None)
                return y

        m = Stack()
        x = jnp.ones((2, 16), jnp.bfloat16)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        assert p["blocks"]["ff"]["kernel"].shape == (3, 16, 16)
        y_ref = m.apply({"params": p}, x)
        q = apply_int8_storage(p, skip_patterns=["nothing_matches"])
        assert q["blocks"]["ff"]["kernel"].dtype == jnp.int8
        assert q["blocks"]["ff"]["kernel" + QSCALE_SUFFIX].shape == (3, 16)
        y_q = m.apply({"params": q}, x)
        rel = np.abs(np.asarray(y_q, np.float32) - np.asarray(y_ref, np.float32)).max()
        rel /= np.abs(np.asarray(y_ref, np.float32)).max()
        assert rel < 0.03
        g = jax.grad(lambda x: jnp.sum(m.apply({"params": q}, x).astype(jnp.float32) ** 2))(x)
        assert float(jnp.abs(g).max()) > 0.0


class TestLoRADenseInt8:
    def test_int8_kernel_routes_and_lora_grads_flow(self):
        from finetrainers_tpu.models.layers import LoRADense

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(3, 32), jnp.bfloat16)
        mod = LoRADense(features=48, rank=4, alpha=4.0, dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        params["kernel"] = jnp.asarray(rng.randn(32, 48) * 0.1, jnp.float32)
        y_ref = mod.apply({"params": params}, x)

        qparams = dict(params)
        qparams["kernel"], qparams["kernel" + QSCALE_SUFFIX] = quantize_weight(params["kernel"])
        y_q = mod.apply({"params": qparams}, x)
        rel = np.abs(np.asarray(y_q, np.float32) - np.asarray(y_ref, np.float32)).max()
        rel /= max(np.abs(np.asarray(y_ref, np.float32)).max(), 1e-6)
        assert rel < 0.03

        def loss(lora_b):
            # lora_b (zero-init) has nonzero grad iff dy flows through the sum
            # with the int8 base path; lora_a's grad is zero BY DESIGN at init.
            p = dict(qparams)
            p["lora_b"] = lora_b
            return jnp.sum(mod.apply({"params": p}, x).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(qparams["lora_b"])
        assert float(jnp.abs(g).max()) > 0.0  # grads flow through the int8 base sum

    def test_proj_params_dequantizes(self):
        from finetrainers_tpu.models.layers import LoRAProjParams

        rng = np.random.RandomState(5)
        mod = LoRAProjParams(in_features=16, features=24)
        params = mod.init(jax.random.PRNGKey(0))["params"]
        params["kernel"] = jnp.asarray(rng.randn(16, 24), jnp.float32)
        k_ref, *_ = mod.apply({"params": params})

        qparams = dict(params)
        qparams["kernel"], qparams["kernel" + QSCALE_SUFFIX] = quantize_weight(params["kernel"])
        k_q, *_ = mod.apply({"params": qparams})
        assert k_q.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(k_q), np.asarray(k_ref), atol=0.02)


class TestMaterializeZerosLike:
    def test_template_materialization(self):
        """Bench tools materialize quantized frozen trees from (1,)*ndim
        templates (quantizing a live multi-GB tree OOMs); shapes and dtypes
        must match what apply_int8_storage would have produced."""
        import jax

        from finetrainers_tpu.utils.int8 import materialize_zeros_like

        shapes = {
            "blocks": {"ff": {
                "kernel": jax.ShapeDtypeStruct((3, 16, 64), jnp.float32),
                "bias": jax.ShapeDtypeStruct((3, 64), jnp.float32),
            }},
            "proj": {"kernel": jax.ShapeDtypeStruct((16, 8), jnp.float32)},
            "lora": None,  # trainable placeholder survives as None
        }
        template = {
            "blocks": {"ff": {
                "kernel": jnp.zeros((1, 1, 1), jnp.bfloat16),
                "bias": jnp.zeros((1, 1), jnp.float32),
            }},
            "proj": {"kernel": jnp.zeros((1, 1), jnp.bfloat16)},
            "lora": None,
        }
        template = apply_int8_storage(template, skip_patterns=["nothing_matches"])
        out = materialize_zeros_like(shapes, template)
        assert out["blocks"]["ff"]["kernel"].shape == (3, 16, 64)
        assert out["blocks"]["ff"]["kernel"].dtype == jnp.int8
        assert out["blocks"]["ff"]["kernel" + QSCALE_SUFFIX].shape == (3, 64)
        assert out["proj"]["kernel" + QSCALE_SUFFIX].shape == (8,)
        assert out["blocks"]["ff"]["bias"].dtype == jnp.float32
        assert out["lora"] is None
