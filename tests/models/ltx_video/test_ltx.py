"""LTX-Video family tests: transformer numerics, packing, weight conversion,
full trainer integration with a tiny spec (mirrors reference
tests/models/ltx_video/base_specification.py strategy)."""

import json
import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[3]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.autoencoders import AutoencoderConfig
from finetrainers_tpu.models.ltx_video import (
    LTXVideoModelSpecification,
    LTXVideoTransformer3DModel,
    export_ltx_transformer_state_dict,
    load_ltx_transformer_params,
    pack_latents,
    unpack_latents,
)
from finetrainers_tpu.processors import HashEncoder


TINY = dict(in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
            cross_attention_dim=16, num_layers=2, caption_channels=32)
TINY_VAE = AutoencoderConfig(latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
                             spatial_downsample=(True,), temporal_downsample=(True,))


def tiny_spec(**kwargs):
    spec = LTXVideoModelSpecification(transformer_config=TINY, vae_config=TINY_VAE, **kwargs)
    spec.transformer_dtype = jnp.float32
    spec.vae_dtype = jnp.float32
    return spec


class TestPacking:
    def test_pack_unpack_roundtrip(self):
        x = jnp.arange(2 * 4 * 2 * 4 * 6, dtype=jnp.float32).reshape(2, 4, 2, 4, 6)
        packed = pack_latents(x, 2, 1)
        assert packed.shape == (2, 2 * 2 * 3, 4 * 4)
        back = unpack_latents(packed, 2, 4, 6, 2, 1)
        np.testing.assert_array_equal(back, x)


class TestTransformer:
    def _build(self):
        module = LTXVideoTransformer3DModel(**TINY, dtype=jnp.float32)
        tokens = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 4))
        context = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
        params = module.init(jax.random.PRNGKey(0), tokens, context, jnp.zeros((1,)),
                             num_frames=3, height=2, width=2)["params"]
        return module, params, tokens, context

    def test_forward_shape(self):
        module, params, tokens, context = self._build()
        out = module.apply({"params": params}, tokens, context, jnp.asarray([500.0]),
                           num_frames=3, height=2, width=2)
        assert out.shape == (1, 12, 4)
        assert bool(jnp.isfinite(out).all())

    def test_per_token_timesteps_match_scalar(self):
        module, params, tokens, context = self._build()
        scalar = module.apply({"params": params}, tokens, context, jnp.asarray([500.0]),
                              num_frames=3, height=2, width=2)
        per_token = module.apply({"params": params}, tokens, context,
                                 jnp.full((1, 12), 500.0), num_frames=3, height=2, width=2)
        np.testing.assert_allclose(scalar, per_token, atol=1e-5)

    def test_encoder_mask_limits_attention(self):
        module, params, tokens, context = self._build()
        mask_full = jnp.ones((1, 8), jnp.int32)
        mask_half = jnp.concatenate([jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32)], axis=1)
        out_full = module.apply({"params": params}, tokens, context, jnp.asarray([500.0]),
                                encoder_attention_mask=mask_full, num_frames=3, height=2, width=2)
        context_tail_changed = context.at[:, 4:].set(99.0)
        out_masked = module.apply({"params": params}, tokens, context_tail_changed, jnp.asarray([500.0]),
                                  encoder_attention_mask=mask_half, num_frames=3, height=2, width=2)
        out_masked_ref = module.apply({"params": params}, tokens, context, jnp.asarray([500.0]),
                                      encoder_attention_mask=mask_half, num_frames=3, height=2, width=2)
        # masked-out tokens must not affect the output
        np.testing.assert_allclose(out_masked, out_masked_ref, atol=1e-5)
        assert not np.allclose(out_full, out_masked_ref, atol=1e-5)


class TestWeights:
    def test_roundtrip_exact(self):
        spec = tiny_spec()
        tr = spec.load_diffusion_models()["transformer"]
        sd = export_ltx_transformer_state_dict(tr.params)
        back = load_ltx_transformer_params(sd, tr.params)
        for a, b in zip(jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_diffusers_style_keys(self):
        spec = tiny_spec()
        tr = spec.load_diffusion_models()["transformer"]
        sd = export_ltx_transformer_state_dict(tr.params)
        assert "transformer_blocks.0.attn1.to_q.weight" in sd
        assert "transformer_blocks.0.attn1.norm_q.weight" in sd
        assert "transformer_blocks.0.ff.net.0.proj.weight" in sd
        assert "time_embed.emb.timestep_embedder.linear_1.weight" in sd
        assert "caption_projection.linear_1.weight" in sd
        assert "scale_shift_table" in sd
        # torch Linear layout: (out, in)
        q = sd["transformer_blocks.0.attn1.to_q.weight"]
        assert q.shape == (16, 16)

    def test_missing_key_raises(self):
        spec = tiny_spec()
        tr = spec.load_diffusion_models()["transformer"]
        sd = export_ltx_transformer_state_dict(tr.params)
        sd.pop("proj_out.weight")
        with pytest.raises(KeyError):
            load_ltx_transformer_params(sd, tr.params)


class TestSpecForward:
    def test_forward_and_grads(self):
        spec = tiny_spec(lora_rank=2, lora_alpha=2)
        tr = spec.load_diffusion_models()["transformer"]
        vae = spec.load_latent_models()["vae"]
        enc = HashEncoder(hidden_size=32, max_length=16)
        conds = {k: jnp.asarray(v) for k, v in spec.prepare_conditions(caption="x", text_encoder=enc).items()}
        lats = {k: jnp.asarray(v) for k, v in
                spec.prepare_latents(vae, video=np.zeros((5, 3, 16, 16), np.float32)).items()}
        pred, target, sigmas = spec.forward(tr, conds, lats, jnp.asarray([0.5]), jax.random.PRNGKey(0))
        assert pred.shape == target.shape
        assert bool(jnp.isfinite(pred).all())

    def test_first_frame_conditioning_branch(self):
        # With p=1 the first-frame sigma must be < the batch sigma.
        spec = tiny_spec()
        spec.first_frame_conditioning_p = 1.0
        tr = spec.load_diffusion_models()["transformer"]
        vae = spec.load_latent_models()["vae"]
        enc = HashEncoder(hidden_size=32, max_length=16)
        conds = {k: jnp.asarray(v) for k, v in spec.prepare_conditions(caption="x", text_encoder=enc).items()}
        lats = {k: jnp.asarray(v) for k, v in
                spec.prepare_latents(vae, video=np.zeros((5, 3, 16, 16), np.float32)).items()}
        pred, target, _ = spec.forward(tr, conds, lats, jnp.asarray([0.9]), jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(pred).all())


class TestPipeline:
    def test_t2v_generation(self):
        spec = tiny_spec()
        enc = HashEncoder(hidden_size=32, max_length=16)
        pipe = spec.load_pipeline(
            transformer=spec.load_diffusion_models()["transformer"],
            vae=spec.load_latent_models()["vae"],
            text_encoder=enc,
        )
        video = pipe(prompt="hi", height=16, width=16, num_frames=5, num_inference_steps=2,
                     guidance_scale=1.0)
        assert video.shape == (5, 16, 16, 3)
        assert video.dtype == np.uint8

    def test_cfg_path(self):
        spec = tiny_spec()
        enc = HashEncoder(hidden_size=32, max_length=16)
        pipe = spec.load_pipeline(
            transformer=spec.load_diffusion_models()["transformer"],
            vae=spec.load_latent_models()["vae"],
            text_encoder=enc,
        )
        video = pipe(prompt="hi", height=16, width=16, num_frames=3, num_inference_steps=2,
                     guidance_scale=3.0)
        assert video.shape == (3, 16, 16, 3)


class TestTrainerIntegration:
    def test_lora_training_runs(self, tmp_path):
        import csv

        import cv2

        from finetrainers_tpu.args import BaseArgs
        from finetrainers_tpu.trainer.sft_trainer import SFTTrainer

        root = tmp_path / "ds"
        root.mkdir()
        rng = np.random.RandomState(0)
        rows = []
        for i in range(2):
            path = root / f"v{i}.mp4"
            w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (32, 32))
            for _ in range(6):
                w.write((rng.rand(32, 32, 3) * 255).astype(np.uint8))
            w.release()
            rows.append({"file_name": f"v{i}.mp4", "caption": f"clip {i}"})
        with open(root / "metadata.csv", "w", newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=["file_name", "caption"])
            wtr.writeheader()
            [wtr.writerow(r) for r in rows]
        config_path = root / "config.json"
        config_path.write_text(json.dumps({"datasets": [{
            "data_root": str(root), "dataset_type": "video",
            "video_resolution_buckets": [[5, 16, 16]],
        }]}))

        args = BaseArgs().parse_args([
            "--model_name", "ltx_video", "--pretrained_model_name_or_path", "tiny",
            "--training_type", "lora",
            "--dataset_config", str(config_path),
            "--train_steps", "3", "--batch_size", "1", "--dp_shards", "8",
            "--checkpointing_steps", "3", "--precomputation_items", "2",
            "--transformer_dtype", "fp32",
            "--output_dir", str(tmp_path / "out"), "--seed", "7",
        ])
        args.rank = 2
        args.lora_alpha = 2
        args.target_modules = "to_q|to_k|to_v|to_out"

        spec = tiny_spec(lora_rank=2, lora_alpha=2)
        # Offline text encoding for the test
        spec.load_condition_models = lambda: {
            "tokenizer": None, "text_encoder": HashEncoder(hidden_size=32, max_length=16)
        }
        trainer = SFTTrainer(args, spec)
        trainer.run()
        assert (tmp_path / "out" / "lora_weights" / "000003").exists()
