"""Faithful AutoencoderKLCogVideoX: independent diffusers key-set enumeration vs
the converter's export, exact round-trip, zq-conditioned decoder norms, and
compression semantics (reference encodes through diffusers AutoencoderKLCogVideoX)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.cogvideox.vae import (
    AutoencoderKLCogVideoX,
    CogVideoXVAEConfig,
    cogvideox_vae_key_map,
    export_cogvideox_vae_state_dict,
    load_cogvideox_vae_params,
)


CFG = CogVideoXVAEConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
    norm_num_groups=4, temporal_compression_ratio=2,
)
REAL_CFG = CogVideoXVAEConfig()


def _cc(prefix):  # causal conv wrapped as .conv
    return {f"{prefix}.conv.weight", f"{prefix}.conv.bias"}


def _plain(prefix):  # weights directly on the module
    return {f"{prefix}.weight", f"{prefix}.bias"}


def _enc_res(prefix, shortcut):
    keys = _plain(f"{prefix}.norm1") | _plain(f"{prefix}.norm2")
    keys |= _cc(f"{prefix}.conv1") | _cc(f"{prefix}.conv2")
    if shortcut:
        keys |= _plain(f"{prefix}.conv_shortcut")
    return keys


def _spatial_norm(prefix):
    return _plain(f"{prefix}.norm_layer") | _cc(f"{prefix}.conv_y") | _cc(f"{prefix}.conv_b")


def _dec_res(prefix, shortcut):
    keys = _spatial_norm(f"{prefix}.norm1") | _spatial_norm(f"{prefix}.norm2")
    keys |= _cc(f"{prefix}.conv1") | _cc(f"{prefix}.conv2")
    if shortcut:
        keys |= _plain(f"{prefix}.conv_shortcut")
    return keys


def expected_cogvideox_keys(cfg: CogVideoXVAEConfig):
    keys = set()
    n = len(cfg.block_out_channels)
    # ------------------------------------------------------------- encoder
    keys |= _cc("encoder.conv_in")
    ch = cfg.block_out_channels[0]
    for i, out_ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            keys |= _enc_res(f"encoder.down_blocks.{i}.resnets.{j}", ch != out_ch)
            ch = out_ch
        if i < n - 1:
            keys |= _plain(f"encoder.down_blocks.{i}.downsamplers.0.conv")
    keys |= _enc_res("encoder.mid_block.resnets.0", False)
    keys |= _enc_res("encoder.mid_block.resnets.1", False)
    keys |= _plain("encoder.norm_out") | _cc("encoder.conv_out")
    # ------------------------------------------------------------- decoder
    channels = tuple(reversed(cfg.block_out_channels))
    keys |= _cc("decoder.conv_in")
    keys |= _dec_res("decoder.mid_block.resnets.0", False)
    keys |= _dec_res("decoder.mid_block.resnets.1", False)
    ch = channels[0]
    for i, out_ch in enumerate(channels):
        for j in range(cfg.layers_per_block + 1):
            keys |= _dec_res(f"decoder.up_blocks.{i}.resnets.{j}", ch != out_ch)
            ch = out_ch
        if i < n - 1:
            keys |= _plain(f"decoder.up_blocks.{i}.upsamplers.0.conv")
    keys |= _spatial_norm("decoder.norm_out") | _cc("decoder.conv_out")
    return keys


def _init(cfg, frames=1):
    module = AutoencoderKLCogVideoX(cfg, dtype=jnp.float32)
    r = cfg.spatial_compression_ratio
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, frames, 2 * r, 2 * r), jnp.float32)
    )["params"]
    return module, params


class TestCogVideoXVAEKeys:
    def test_export_key_set_matches_diffusers(self):
        _, params = _init(CFG)
        exported = set(export_cogvideox_vae_state_dict(params))
        expected = expected_cogvideox_keys(CFG)
        assert exported == expected, (
            f"missing={sorted(expected - exported)[:6]} extra={sorted(exported - expected)[:6]}"
        )

    def test_real_config_key_set_and_shapes(self):
        module = AutoencoderKLCogVideoX(REAL_CFG, dtype=jnp.float32)
        abstract = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 16, 16)))["params"]
        )
        from finetrainers_tpu.models.modeling_utils import flatten_params

        flat = {cogvideox_vae_key_map(k): v.shape for k, v in flatten_params(abstract).items()}
        assert set(flat) == expected_cogvideox_keys(REAL_CFG)
        assert flat["encoder.conv_in.conv.weight"] == (3, 3, 3, 3, 128)
        assert flat["encoder.conv_out.conv.weight"] == (3, 3, 3, 512, 32)
        # zq-conditioned decoder norm: conv_y maps 16 latent ch -> feature ch
        assert flat["decoder.norm_out.conv_y.conv.weight"] == (1, 1, 1, 16, 128)
        # CogVideoX channel change sits at encoder block 1 (128 -> 256)
        assert flat["encoder.down_blocks.1.resnets.0.conv_shortcut.weight"] == (1, 1, 1, 128, 256)

    def test_weight_roundtrip_exact(self):
        _, params = _init(CFG)
        state = export_cogvideox_vae_state_dict(params)
        restored = load_cogvideox_vae_params(state, jax.eval_shape(lambda: params))
        from finetrainers_tpu.models.modeling_utils import flatten_params

        a, b = flatten_params(params), flatten_params(restored)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


class TestCogVideoXVAESemantics:
    def test_compression_shapes(self):
        module, params = _init(CFG, frames=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
        moments = module.apply({"params": params}, x, method=AutoencoderKLCogVideoX.encode)
        # one downsample stage (2 blocks): /2 spatial, temporal 1+2/2 = 2 frames
        assert moments.shape == (1, 8, 2, 4, 4)

    def test_decode_shapes(self):
        module, params = _init(CFG, frames=3)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 4, 4))
        out = module.apply({"params": params}, z, method=AutoencoderKLCogVideoX.decode)
        assert out.shape == (1, 3, 3, 8, 8)

    def test_spec_loads_faithful_vae(self, tmp_path):
        import json

        from finetrainers_tpu.models.cogvideox import CogVideoXModelSpecification
        from finetrainers_tpu.utils.serialization import safetensors_save_dict

        vae_dir = tmp_path / "vae"
        vae_dir.mkdir()
        hf_cfg = {
            "_class_name": "AutoencoderKLCogVideoX",
            "latent_channels": 4, "block_out_channels": [8, 16], "layers_per_block": 1,
            "norm_num_groups": 4, "temporal_compression_ratio": 2,
            "scaling_factor": 1.15258426,
        }
        (vae_dir / "config.json").write_text(json.dumps(hf_cfg))
        _, params = _init(CogVideoXVAEConfig.from_hf(hf_cfg))
        safetensors_save_dict(
            export_cogvideox_vae_state_dict(params),
            str(vae_dir / "diffusion_pytorch_model.safetensors"),
        )
        spec = CogVideoXModelSpecification(
            transformer_config=dict(in_channels=4, out_channels=4, patch_size=2,
                                    num_attention_heads=2, attention_head_dim=8, num_layers=1,
                                    text_embed_dim=32, time_embed_dim=16,
                                    use_rotary_positional_embeddings=True,
                                    use_learned_positional_embeddings=False),
            vae_id=str(vae_dir), lora_rank=2, lora_alpha=2,
        )
        spec.vae_dtype = jnp.float32
        vae = spec.load_latent_models()["vae"]
        assert isinstance(vae.module, AutoencoderKLCogVideoX)
        assert abs(vae.config["scaling_factor"] - 1.15258426) < 1e-9
