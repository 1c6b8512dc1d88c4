"""TP numerical-equivalence test (the reference's `tests/models/ltx_video/_test_tp.py`
analog): tp=2-sharded forward/grads must match the unsharded run bitwise-ish."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.autoencoders import AutoencoderConfig
from finetrainers_tpu.models.ltx_video import LTXVideoModelSpecification
from finetrainers_tpu.parallel import MeshEnv, ParallelDims, make_param_shardings, shard_pytree
from finetrainers_tpu.processors import HashEncoder


TINY = dict(in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
            cross_attention_dim=16, num_layers=2, caption_channels=32)
TINY_VAE = AutoencoderConfig(latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
                             spatial_downsample=(True,), temporal_downsample=(True,))


class TestTPEquivalence:
    def test_tp2_matches_unsharded(self):
        spec = LTXVideoModelSpecification(transformer_config=TINY, vae_config=TINY_VAE)
        spec.transformer_dtype = jnp.float32
        spec.vae_dtype = jnp.float32
        tr = spec.load_diffusion_models()["transformer"]
        vae = spec.load_latent_models()["vae"]
        enc = HashEncoder(hidden_size=32, max_length=8)
        conds = {k: jnp.asarray(v) for k, v in spec.prepare_conditions(caption="x", text_encoder=enc).items()}
        lats = {k: jnp.asarray(v) for k, v in
                spec.prepare_latents(vae, video=np.zeros((5, 3, 16, 16), np.float32)).items()}

        def loss_fn(params):
            from finetrainers_tpu.models.modeling_utils import ModelHandle

            handle = ModelHandle(tr.module, params, tr.config)
            pred, target, _ = spec.forward(handle, conds, lats, jnp.asarray([0.5]), jax.random.PRNGKey(3))
            return jnp.mean((pred - target) ** 2)

        # Reference (unsharded, single device)
        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(tr.params)

        # TP=2 (+ fsdp=2, dp=2) sharded
        env = MeshEnv(ParallelDims(dp_replicate=2, dp_shard=2, tp=2))
        shardings = make_param_shardings(tr.params, env.mesh, tp_rules=spec.tp_rules(), min_weight_size=1)
        params_sharded = shard_pytree(jax.tree_util.tree_map(np.asarray, tr.params), shardings)
        loss_tp, grads_tp = jax.jit(jax.value_and_grad(loss_fn))(params_sharded)

        np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(grads_tp), jax.tree_util.tree_leaves(grads_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_tp_rules_shard_expected_params(self):
        spec = LTXVideoModelSpecification(transformer_config=TINY, vae_config=TINY_VAE)
        spec.transformer_dtype = jnp.float32
        tr = spec.load_diffusion_models()["transformer"]
        env = MeshEnv(ParallelDims(dp_shard=4, tp=2))
        shardings = make_param_shardings(tr.params, env.mesh, tp_rules=spec.tp_rules(), min_weight_size=1)
        spec_q = shardings["transformer_blocks_0"]["attn1"]["to_q"]["kernel"].spec
        assert "tp" in str(spec_q), f"attention q kernel should be tp-sharded, got {spec_q}"
        spec_ff = shardings["transformer_blocks_0"]["ff_net_0_proj"]["kernel"].spec
        assert "tp" in str(spec_ff)
