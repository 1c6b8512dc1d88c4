"""Local diffusers-checkpoint loading path: synthetic checkpoint dir -> spec
picks up the converted weights (LoRA stays fresh)."""

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.autoencoders import AutoencoderConfig
from finetrainers_tpu.models.ltx_video import LTXVideoModelSpecification, export_ltx_transformer_state_dict
from finetrainers_tpu.utils.serialization import safetensors_save_dict


TINY = dict(in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
            cross_attention_dim=16, num_layers=2, caption_channels=32)
TINY_VAE = AutoencoderConfig(latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
                             spatial_downsample=(True,), temporal_downsample=(True,))


class TestLocalCheckpointLoading:
    def test_spec_loads_local_diffusers_dir(self, tmp_path):
        # Build a "checkpoint" from a randomly-initialized spec
        src_spec = LTXVideoModelSpecification(transformer_config=TINY, vae_config=TINY_VAE)
        src_spec.transformer_dtype = jnp.float32
        src = src_spec.load_diffusion_models()["transformer"]
        state = export_ltx_transformer_state_dict(src.params)

        ckpt = tmp_path / "model" / "transformer"
        ckpt.mkdir(parents=True)
        safetensors_save_dict(state, str(ckpt / "diffusion_pytorch_model.safetensors"))
        (ckpt / "config.json").write_text(json.dumps(TINY))

        dst_spec = LTXVideoModelSpecification(
            pretrained_model_name_or_path=str(tmp_path / "model"),
            transformer_config=TINY, vae_config=TINY_VAE, lora_rank=2,
        )
        dst_spec.transformer_dtype = jnp.float32
        dst = dst_spec.load_diffusion_models()["transformer"]

        # Base weights must equal the checkpoint; LoRA leaves must exist fresh.
        from finetrainers_tpu.models.modeling_utils import flatten_params

        src_flat = flatten_params(src.params)
        dst_flat = flatten_params(dst.params)
        for key, value in src_flat.items():
            np.testing.assert_array_equal(np.asarray(dst_flat[key]), np.asarray(value))
        assert any("lora_a" in k for k in dst_flat)

    def test_sharded_checkpoint_with_index(self, tmp_path):
        from finetrainers_tpu.models.weight_utils import load_diffusers_checkpoint_dir

        ckpt = tmp_path / "transformer"
        ckpt.mkdir()
        a = {"w1": np.ones((2, 2), np.float32)}
        b = {"w2": np.zeros((3,), np.float32)}
        safetensors_save_dict(a, str(ckpt / "diffusion_pytorch_model-00001-of-00002.safetensors"))
        safetensors_save_dict(b, str(ckpt / "diffusion_pytorch_model-00002-of-00002.safetensors"))
        (ckpt / "diffusion_pytorch_model.safetensors.index.json").write_text(json.dumps({
            "weight_map": {"w1": "diffusion_pytorch_model-00001-of-00002.safetensors",
                           "w2": "diffusion_pytorch_model-00002-of-00002.safetensors"}
        }))
        state = load_diffusers_checkpoint_dir(str(ckpt))
        assert set(state) == {"w1", "w2"}
