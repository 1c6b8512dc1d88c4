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
