"""Faithful AutoencoderKLHunyuanVideo: independent diffusers key-set enumeration
vs the converter's export, exact round-trip, and compression semantics
(reference encodes through diffusers AutoencoderKLHunyuanVideo)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.hunyuan_video.vae import (
    AutoencoderKLHunyuanVideo,
    HunyuanVAEConfig,
    export_hunyuan_vae_state_dict,
    hunyuan_vae_key_map,
    load_hunyuan_vae_params,
)


CFG = HunyuanVAEConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, spatial_compression_ratio=2, temporal_compression_ratio=2,
)
REAL_CFG = HunyuanVAEConfig()


def _conv_keys(prefix):
    return {f"{prefix}.conv.weight", f"{prefix}.conv.bias"}


def _norm_keys(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias"}


def _res_keys(prefix, shortcut):
    keys = _norm_keys(f"{prefix}.norm1") | _norm_keys(f"{prefix}.norm2")
    keys |= _conv_keys(f"{prefix}.conv1") | _conv_keys(f"{prefix}.conv2")
    if shortcut:
        keys |= _conv_keys(f"{prefix}.conv_shortcut")
    return keys


def expected_hunyuan_keys(cfg: HunyuanVAEConfig):
    keys = set()
    n = len(cfg.block_out_channels)
    num_spatial = int(np.log2(cfg.spatial_compression_ratio))
    num_time = int(np.log2(cfg.temporal_compression_ratio))
    # ------------------------------------------------------------- encoder
    keys |= _conv_keys("encoder.conv_in")
    ch = cfg.block_out_channels[0]
    for i, out_ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            keys |= _res_keys(f"encoder.down_blocks.{i}.resnets.{j}", ch != out_ch)
            ch = out_ch
        is_final = i == n - 1
        if (i < num_spatial) or (i >= n - 1 - num_time and not is_final):
            keys |= _conv_keys(f"encoder.down_blocks.{i}.downsamplers.0.conv")
    keys |= _res_keys("encoder.mid_block.resnets.0", False)
    keys |= _res_keys("encoder.mid_block.resnets.1", False)
    keys |= _norm_keys("encoder.mid_block.attentions.0.group_norm")
    for proj in ("to_q", "to_k", "to_v", "to_out.0"):
        keys |= {f"encoder.mid_block.attentions.0.{proj}.weight",
                 f"encoder.mid_block.attentions.0.{proj}.bias"}
    keys |= _norm_keys("encoder.conv_norm_out") | _conv_keys("encoder.conv_out")
    keys |= {"quant_conv.weight", "quant_conv.bias",
             "post_quant_conv.weight", "post_quant_conv.bias"}
    # ------------------------------------------------------------- decoder
    channels = tuple(reversed(cfg.block_out_channels))
    keys |= _conv_keys("decoder.conv_in")
    keys |= _res_keys("decoder.mid_block.resnets.0", False)
    keys |= _res_keys("decoder.mid_block.resnets.1", False)
    keys |= _norm_keys("decoder.mid_block.attentions.0.group_norm")
    for proj in ("to_q", "to_k", "to_v", "to_out.0"):
        keys |= {f"decoder.mid_block.attentions.0.{proj}.weight",
                 f"decoder.mid_block.attentions.0.{proj}.bias"}
    ch = channels[0]
    for i, out_ch in enumerate(channels):
        for j in range(cfg.layers_per_block + 1):
            keys |= _res_keys(f"decoder.up_blocks.{i}.resnets.{j}", ch != out_ch)
            ch = out_ch
        is_final = i == n - 1
        add_time = i >= (n - 1 - num_time) and not is_final
        if (i < num_spatial or add_time) and not is_final:
            keys |= _conv_keys(f"decoder.up_blocks.{i}.upsamplers.0.conv")
    keys |= _norm_keys("decoder.conv_norm_out") | _conv_keys("decoder.conv_out")
    return keys


def _init(cfg, frames=1):
    module = AutoencoderKLHunyuanVideo(cfg, dtype=jnp.float32)
    r = cfg.spatial_compression_ratio
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, frames, 2 * r, 2 * r), jnp.float32)
    )["params"]
    return module, params


class TestHunyuanVAEKeys:
    def test_export_key_set_matches_diffusers(self):
        _, params = _init(CFG)
        exported = set(export_hunyuan_vae_state_dict(params))
        expected = expected_hunyuan_keys(CFG)
        assert exported == expected, (
            f"missing={sorted(expected - exported)[:6]} extra={sorted(exported - expected)[:6]}"
        )

    def test_real_config_key_set_and_shapes(self):
        module = AutoencoderKLHunyuanVideo(REAL_CFG, dtype=jnp.float32)
        abstract = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 16, 16)))["params"]
        )
        from finetrainers_tpu.models.modeling_utils import flatten_params

        flat = {hunyuan_vae_key_map(k): v.shape for k, v in flatten_params(abstract).items()}
        assert set(flat) == expected_hunyuan_keys(REAL_CFG)
        assert flat["encoder.conv_in.conv.weight"] == (3, 3, 3, 3, 128)
        assert flat["encoder.conv_out.conv.weight"] == (3, 3, 3, 512, 32)
        assert flat["quant_conv.weight"] == (1, 1, 1, 32, 32)
        assert flat["decoder.up_blocks.2.resnets.0.conv_shortcut.conv.weight"] == (1, 1, 1, 512, 256)

    def test_weight_roundtrip_exact(self):
        _, params = _init(CFG)
        state = export_hunyuan_vae_state_dict(params)
        restored = load_hunyuan_vae_params(state, jax.eval_shape(lambda: params))
        from finetrainers_tpu.models.modeling_utils import flatten_params

        a, b = flatten_params(params), flatten_params(restored)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


class TestHunyuanVAESemantics:
    def test_compression_shapes(self):
        module, params = _init(CFG, frames=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
        moments = module.apply({"params": params}, x, method=AutoencoderKLHunyuanVideo.encode)
        # one 2x spatial + one 2x temporal stage: 1+2/2 = 2 frames, 8/2 spatial
        assert moments.shape == (1, 8, 2, 4, 4)

    def test_decode_shapes(self):
        module, params = _init(CFG, frames=3)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 4, 4))
        out = module.apply({"params": params}, z, method=AutoencoderKLHunyuanVideo.decode)
        assert out.shape == (1, 3, 3, 8, 8)

    def test_spec_loads_faithful_vae(self, tmp_path):
        import json

        from finetrainers_tpu.models.hunyuan_video import HunyuanVideoModelSpecification
        from finetrainers_tpu.utils.serialization import safetensors_save_dict

        vae_dir = tmp_path / "vae"
        vae_dir.mkdir()
        hf_cfg = {
            "_class_name": "AutoencoderKLHunyuanVideo",
            "latent_channels": 4, "block_out_channels": [8, 16], "layers_per_block": 1,
            "norm_num_groups": 4, "spatial_compression_ratio": 2,
            "temporal_compression_ratio": 2, "scaling_factor": 0.476986,
        }
        (vae_dir / "config.json").write_text(json.dumps(hf_cfg))
        _, params = _init(HunyuanVAEConfig.from_hf(hf_cfg))
        safetensors_save_dict(
            export_hunyuan_vae_state_dict(params),
            str(vae_dir / "diffusion_pytorch_model.safetensors"),
        )
        spec = HunyuanVideoModelSpecification(
            transformer_config=dict(in_channels=4, out_channels=4, patch_size=2, patch_size_t=1,
                                    num_attention_heads=2, attention_head_dim=8, num_layers=1,
                                    num_single_layers=1, num_refiner_layers=1, text_embed_dim=32,
                                    pooled_projection_dim=16, guidance_embeds=True,
                                    rope_axes_dim=(2, 4, 2)),
            vae_id=str(vae_dir), lora_rank=2, lora_alpha=2,
        )
        spec.vae_dtype = jnp.float32
        vae = spec.load_latent_models()["vae"]
        assert isinstance(vae.module, AutoencoderKLHunyuanVideo)
        assert vae.config["scaling_factor"] == 0.476986
