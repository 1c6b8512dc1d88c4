"""Pipeline-parallel equivalence tests.

The reference has no pp path to test against (it raises,
reference `trainer/sft_trainer/trainer.py:91-94`); the oracle here is the
sequential `lax.scan` over the full layer stack — `pipeline_blocks` must match
it in forward outputs AND in gradients w.r.t. both the stacked parameters and
the input, for several (stages, microbatches) shapes on the 8-device CPU mesh.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.parallel.pipeline import bubble_fraction, pipeline_blocks


D = 16


def _block(params, h):
    # Residual MLP block: enough structure (two matmuls, nonlinearity, bias,
    # residual) to catch transposition/masking mistakes in the schedule.
    y = jnp.tanh(h @ params["w1"] + params["b1"])
    return h + y @ params["w2"]


def _stacked_params(key, n_layers):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": jax.random.normal(k1, (n_layers, D, D), jnp.float32) * 0.2,
        "b1": jax.random.normal(k2, (n_layers, D), jnp.float32) * 0.1,
        "w2": jax.random.normal(k3, (n_layers, D, D), jnp.float32) * 0.2,
    }


def _sequential(params, x):
    def body(h, p):
        return _block(p, h), None

    out, _ = jax.lax.scan(body, x, params)
    return out


def _mesh(n_stages):
    devs = np.asarray(jax.devices()[:n_stages])
    return Mesh(devs, ("pp",))


class TestPipelineEquivalence:
    @pytest.mark.parametrize(
        "n_layers,n_stages,n_microbatches,batch",
        [(4, 4, 4, 8), (4, 2, 2, 4), (8, 4, 8, 8), (6, 2, 3, 6)],
    )
    def test_forward_matches_sequential(self, n_layers, n_stages, n_microbatches, batch):
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        key = jax.random.PRNGKey(0)
        params = _stacked_params(key, n_layers)
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, D), jnp.float32)
        want = _sequential(params, x)
        got = jax.jit(
            lambda p, z: pipeline_blocks(
                _block, p, z, mesh=_mesh(n_stages), n_microbatches=n_microbatches
            )
        )(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)

    def test_gradients_match_sequential(self):
        n_layers, n_stages, n_microbatches, batch = 4, 4, 4, 8
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        params = _stacked_params(jax.random.PRNGKey(2), n_layers)
        x = jax.random.normal(jax.random.PRNGKey(3), (batch, D), jnp.float32)
        tgt = jax.random.normal(jax.random.PRNGKey(4), (batch, D), jnp.float32)
        mesh = _mesh(n_stages)

        def loss_seq(p, z):
            return jnp.mean((_sequential(p, z) - tgt) ** 2)

        def loss_pp(p, z):
            out = pipeline_blocks(_block, p, z, mesh=mesh, n_microbatches=n_microbatches)
            return jnp.mean((out - tgt) ** 2)

        g_want, gx_want = jax.grad(loss_seq, argnums=(0, 1))(params, x)
        g_got, gx_got = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
        for name in ("w1", "b1", "w2"):
            np.testing.assert_allclose(
                np.asarray(g_got[name]), np.asarray(g_want[name]), rtol=5e-5, atol=5e-6
            )
        np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want), rtol=5e-5, atol=5e-6)

    def test_bf16_and_seq_dim(self):
        # 3-D activations (B, S, D) in bf16 — the shape/dtype class the DiT
        # block stacks actually run.
        n_layers, n_stages, n_microbatches, batch = 4, 2, 4, 8
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), _stacked_params(jax.random.PRNGKey(5), n_layers))
        x = jax.random.normal(jax.random.PRNGKey(6), (batch, 3, D), jnp.bfloat16)
        want = _sequential(params, x)
        got = pipeline_blocks(_block, params, x, mesh=_mesh(n_stages), n_microbatches=n_microbatches)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=3e-2, atol=3e-2
        )

    def test_validation_errors(self):
        x = jnp.zeros((4, D))
        params4 = _stacked_params(jax.random.PRNGKey(8), 4)
        with pytest.raises(ValueError, match="not divisible by n_microbatches"):
            pipeline_blocks(_block, params4, x, mesh=_mesh(2), n_microbatches=3)

    @pytest.mark.parametrize("n_layers,n_stages", [(3, 2), (5, 4), (7, 2)])
    def test_uneven_layer_split(self, n_layers, n_stages):
        """L % P != 0: the stack is padded with masked edge-replicated layers
        on the last stage; forward AND gradients must still match the
        sequential scan exactly."""
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        params = _stacked_params(jax.random.PRNGKey(7), n_layers)
        x = jax.random.normal(jax.random.PRNGKey(9), (8, D))
        mesh = _mesh(n_stages)

        def loss_pp(p, z):
            return jnp.sum(pipeline_blocks(_block, p, z, mesh=mesh, n_microbatches=4) ** 2)

        def loss_seq(p, z):
            return jnp.sum(_sequential(p, z) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.jit(loss_pp)(params, x)),
            np.asarray(jax.jit(loss_seq)(params, x)),
            rtol=1e-5,
        )
        g_got, gx_got = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
        g_want, gx_want = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(params, x)
        for name in g_want:
            np.testing.assert_allclose(
                np.asarray(g_got[name]), np.asarray(g_want[name]), rtol=5e-5, atol=5e-6
            )
        np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want), rtol=5e-5, atol=5e-6)

    def test_bubble_fraction(self):
        assert bubble_fraction(4, 4) == pytest.approx(3 / 7)
        assert bubble_fraction(1, 8) == 0.0
        assert bubble_fraction(4, 16) == pytest.approx(3 / 19)


def _dual_block(params, carry, cond):
    # Dual-stream block with per-microbatch conditioning — the structural
    # shape of the Flux/HunyuanVideo/CogVideoX joint blocks: two streams, a
    # shared modulation input, cross-mixing between streams.
    img, txt = carry
    mod = jnp.tanh(cond @ params["wc"])[:, None, :]
    i = jnp.tanh((img + mod) @ params["wi"]) + 0.5 * txt.mean(axis=1, keepdims=True)
    t = jnp.tanh((txt + mod) @ params["wt"]) + 0.5 * img.mean(axis=1, keepdims=True)
    return img + i, txt + t


def _dual_params(key, n_layers):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "wi": jax.random.normal(k1, (n_layers, D, D), jnp.float32) * 0.2,
        "wt": jax.random.normal(k2, (n_layers, D, D), jnp.float32) * 0.2,
        "wc": jax.random.normal(k3, (n_layers, D, D), jnp.float32) * 0.2,
    }


def _dual_sequential(params, carry, cond):
    def body(c, p):
        return _dual_block(p, c, cond), None

    out, _ = jax.lax.scan(body, carry, params)
    return out


class TestPipelineDualStreamAndConditioning:
    def test_tuple_carry_with_batched_conditioning(self):
        n_layers, n_stages, n_microbatches, batch = 4, 4, 4, 8
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        params = _dual_params(jax.random.PRNGKey(10), n_layers)
        img = jax.random.normal(jax.random.PRNGKey(11), (batch, 5, D), jnp.float32)
        txt = jax.random.normal(jax.random.PRNGKey(12), (batch, 3, D), jnp.float32)
        cond = jax.random.normal(jax.random.PRNGKey(13), (batch, D), jnp.float32)
        want_img, want_txt = _dual_sequential(params, (img, txt), cond)
        got_img, got_txt = jax.jit(
            lambda p, c, z: pipeline_blocks(
                _dual_block,
                p,
                c,
                mesh=_mesh(n_stages),
                n_microbatches=n_microbatches,
                batched_args=(z,),
            )
        )(params, (img, txt), cond)
        np.testing.assert_allclose(np.asarray(got_img), np.asarray(want_img), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_txt), np.asarray(want_txt), rtol=2e-5, atol=2e-5)

    def test_gradients_tuple_carry(self):
        n_layers, n_stages, n_microbatches, batch = 4, 2, 4, 8
        if len(jax.devices()) < n_stages:
            pytest.skip("not enough devices")
        params = _dual_params(jax.random.PRNGKey(14), n_layers)
        img = jax.random.normal(jax.random.PRNGKey(15), (batch, 4, D), jnp.float32)
        txt = jax.random.normal(jax.random.PRNGKey(16), (batch, 2, D), jnp.float32)
        cond = jax.random.normal(jax.random.PRNGKey(17), (batch, D), jnp.float32)
        mesh = _mesh(n_stages)

        def loss_seq(p, c):
            i, t = _dual_sequential(p, (img, txt), c)
            return jnp.mean(i**2) + jnp.mean(t**2)

        def loss_pp(p, c):
            i, t = pipeline_blocks(
                _dual_block, p, (img, txt), mesh=mesh, n_microbatches=n_microbatches,
                batched_args=(c,),
            )
            return jnp.mean(i**2) + jnp.mean(t**2)

        g_want, gc_want = jax.grad(loss_seq, argnums=(0, 1))(params, cond)
        g_got, gc_got = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, cond)
        for name in g_want:
            np.testing.assert_allclose(
                np.asarray(g_got[name]), np.asarray(g_want[name]), rtol=5e-5, atol=5e-6
            )
        np.testing.assert_allclose(np.asarray(gc_got), np.asarray(gc_want), rtol=5e-5, atol=5e-6)


class TestPipelineComposesWithDP:
    def test_dp_pp_mesh(self):
        # dp=2 x pp=4 on the 8-device CPU mesh: the microbatch dim stays
        # sharded over dp inside the pipeline (no gather of the global batch).
        if len(jax.devices()) < 8:
            pytest.skip("not enough devices")
        n_layers, n_microbatches, batch = 4, 4, 8
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("dp_shard", "pp"))
        params = _stacked_params(jax.random.PRNGKey(20), n_layers)
        x = jax.random.normal(jax.random.PRNGKey(21), (batch, 3, D), jnp.float32)
        want = _sequential(params, x)

        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sharded = jax.device_put(x, NamedSharding(mesh, P("dp_shard")))
        got = jax.jit(
            lambda p, z: pipeline_blocks(
                _block, p, z, mesh=mesh, n_microbatches=n_microbatches,
                batch_shard_axes=("dp_shard",),
            )
        )(params, x_sharded)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


class TestBlockStackPipeline:
    """`models.layers.block_stack(parent=...)` must route through
    `pipeline_blocks` when a PipelineContext is set (the trainer's
    --pp_degree > 1 path) and match the sequential scan in forward AND
    gradients, composed with both dp axes, per-sample + static broadcast
    args, and the "ops" remat policy."""

    def _model(self):
        import flax.linen as nn
        from finetrainers_tpu.models.layers import block_stack

        class Blk(nn.Module):
            dim: int = 32

            @nn.compact
            def __call__(self, x, ctx, freqs):
                h = nn.Dense(self.dim)(x) + nn.Dense(self.dim)(ctx).mean(axis=1, keepdims=True)
                return x + jnp.tanh(h) * freqs[None, : x.shape[1]]

        class Model(nn.Module):
            n_layers: int = 8

            @nn.compact
            def __call__(self, x, ctx, freqs):
                return block_stack(
                    Blk, dict(dim=32), self.n_layers, x,
                    broadcast_args=(ctx, freqs), use_scan=True,
                    broadcast_kinds=("batched", "static"),
                    checkpoint="ops", parent=self,
                )

        return Model()

    def _data(self):
        B, S, D_ = 8, 16, 32
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D_))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 4, D_))
        freqs = jax.random.normal(jax.random.PRNGKey(2), (S, D_))
        return x, ctx, freqs

    def test_parity_pp2_dp2x2(self):
        from finetrainers_tpu.parallel import (
            MeshEnv,
            ParallelDims,
            PipelineContext,
            make_param_shardings,
            set_pipeline_context,
        )

        model = self._model()
        x, ctx, freqs = self._data()
        params = model.init(jax.random.PRNGKey(3), x, ctx, freqs)["params"]

        def loss(p):
            return jnp.sum(model.apply({"params": p}, x, ctx, freqs) ** 2)

        ref_val, ref_grad = jax.value_and_grad(loss)(params)

        env = MeshEnv(ParallelDims(pp=2, dp_replicate=2, dp_shard=2))
        set_pipeline_context(
            PipelineContext(
                mesh=env.mesh, n_microbatches=0,
                batch_shard_axes=("dp_replicate", "dp_shard"),
            )
        )
        try:
            shardings = make_param_shardings(params, env.mesh)
            # The stacked block params must be layer-sharded over pp.
            stack_spec = shardings["transformer_blocks_scan"]["block"]["Dense_0"]["kernel"].spec
            assert stack_spec[0] == "pp", stack_spec
            p_sh = jax.tree_util.tree_map(jax.device_put, params, shardings)
            val, grad = jax.jit(jax.value_and_grad(loss))(p_sh, )
            np.testing.assert_allclose(float(val), float(ref_val), rtol=2e-5)
            for a, b in zip(jax.tree_util.tree_leaves(grad), jax.tree_util.tree_leaves(ref_grad)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)
        finally:
            env.destroy()
        from finetrainers_tpu.parallel import get_pipeline_context

        assert get_pipeline_context() is None  # destroy() cleared it

    def test_fallback_when_indivisible(self, recwarn):
        """7 microbatches don't divide batch 8 -> sequential-scan fallback,
        same numerics, one warning."""
        from finetrainers_tpu.parallel import (
            MeshEnv,
            ParallelDims,
            PipelineContext,
            set_pipeline_context,
        )
        import finetrainers_tpu.models.layers as layers_mod

        model = self._model()
        x, ctx, freqs = self._data()
        params = model.init(jax.random.PRNGKey(3), x, ctx, freqs)["params"]
        ref = model.apply({"params": params}, x, ctx, freqs)

        env = MeshEnv(ParallelDims(pp=2, dp_shard=4))
        layers_mod._PP_FALLBACK_WARNED.clear()
        set_pipeline_context(PipelineContext(mesh=env.mesh, n_microbatches=7))
        try:
            out = model.apply({"params": params}, x, ctx, freqs)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
            assert any("fallback" in str(w.message) for w in recwarn.list)
        finally:
            env.destroy()

    def test_dual_stream_tuple_carry(self):
        """Flux/HunyuanVideo-style (img, txt) tuple carries must round-trip the
        block_stack pipeline path with parity (the carry pytree hops stages)."""
        import flax.linen as nn
        from finetrainers_tpu.models.layers import block_stack
        from finetrainers_tpu.parallel import (
            MeshEnv,
            ParallelDims,
            PipelineContext,
            set_pipeline_context,
        )

        class DualBlk(nn.Module):
            dim: int = 16

            @nn.compact
            def __call__(self, img, txt, temb):
                m = nn.Dense(self.dim)(temb)[:, None, :]
                img = img + jnp.tanh(nn.Dense(self.dim)(img) + m)
                txt = txt + jnp.tanh(nn.Dense(self.dim)(txt) - m)
                return img, txt

        class Model(nn.Module):
            n_layers: int = 4

            @nn.compact
            def __call__(self, img, txt, temb):
                return block_stack(
                    DualBlk, dict(dim=16), self.n_layers, (img, txt),
                    broadcast_args=(temb,), use_scan=True, parent=self,
                    broadcast_kinds=("batched",),
                )

        B = 4
        img = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 16))
        txt = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 16))
        temb = jax.random.normal(jax.random.PRNGKey(2), (B, 16))
        model = Model()
        params = model.init(jax.random.PRNGKey(3), img, txt, temb)["params"]
        ref_img, ref_txt = model.apply({"params": params}, img, txt, temb)

        env = MeshEnv(ParallelDims(pp=4, dp_shard=2))
        set_pipeline_context(
            PipelineContext(mesh=env.mesh, batch_shard_axes=("dp_shard",))
        )
        try:
            out_img, out_txt = jax.jit(
                lambda p: model.apply({"params": p}, img, txt, temb)
            )(params)
            np.testing.assert_allclose(np.asarray(out_img), np.asarray(ref_img), rtol=2e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(out_txt), np.asarray(ref_txt), rtol=2e-5, atol=1e-5)
        finally:
            env.destroy()
