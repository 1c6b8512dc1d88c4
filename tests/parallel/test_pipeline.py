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
        params = _stacked_params(jax.random.PRNGKey(7), 3)
        x = jnp.zeros((4, D))
        with pytest.raises(ValueError, match="not divisible by 2 pipeline stages"):
            pipeline_blocks(_block, params, x, mesh=_mesh(2), n_microbatches=2)
        params4 = _stacked_params(jax.random.PRNGKey(8), 4)
        with pytest.raises(ValueError, match="not divisible by n_microbatches"):
            pipeline_blocks(_block, params4, x, mesh=_mesh(2), n_microbatches=3)

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
