"""Faithful AutoencoderKLLTXVideo: independent diffusers key-set enumeration vs
the converter's export, exact round-trip, compression ratios, the shared-logvar
quirk, and encoder causality (reference encodes through diffusers
AutoencoderKLLTXVideo, ltx_video/base_specification.py:260-280)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.ltx_video.vae import (
    AutoencoderKLLTXVideo,
    LTXVAEConfig,
    export_ltx_vae_state_dict,
    load_ltx_vae_params,
    ltx_vae_key_map,
)


# Tiny config covering all structural branches: channel change (conv_out /
# conv_in resnets + shortcuts), scaling on/off per block, patchify p=2.
CFG = LTXVAEConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    decoder_block_out_channels=(8, 16),
    layers_per_block=(1, 1, 1),
    decoder_layers_per_block=(1, 1, 1),
    spatio_temporal_scaling=(True, False),
    decoder_spatio_temporal_scaling=(True, False),
    patch_size=2, patch_size_t=1,
)
REAL_CFG = LTXVAEConfig()  # LTX-Video 0.9.0 defaults


def _conv_keys(prefix):
    return {f"{prefix}.conv.weight", f"{prefix}.conv.bias"}


def _res_keys(prefix, shortcut):
    keys = _conv_keys(f"{prefix}.conv1") | _conv_keys(f"{prefix}.conv2")
    if shortcut:
        keys |= _conv_keys(f"{prefix}.conv_shortcut")
    return keys  # RMSNorm(elementwise_affine=False): no norm params


def expected_ltx_keys(cfg: LTXVAEConfig):
    keys = set()
    # ------------------------------------------------------------- encoder
    keys |= _conv_keys("encoder.conv_in")
    n = len(cfg.block_out_channels)
    out_ch = cfg.block_out_channels[0]
    for i in range(n):
        in_ch = out_ch
        out_ch = cfg.block_out_channels[i + 1] if i + 1 < n else cfg.block_out_channels[-1]
        for j in range(cfg.layers_per_block[i]):
            keys |= _res_keys(f"encoder.down_blocks.{i}.resnets.{j}", False)
        if cfg.spatio_temporal_scaling[i]:
            keys |= _conv_keys(f"encoder.down_blocks.{i}.downsamplers.0")
        if in_ch != out_ch:
            keys |= _res_keys(f"encoder.down_blocks.{i}.conv_out", True)
    for j in range(cfg.layers_per_block[-1]):
        keys |= _res_keys(f"encoder.mid_block.resnets.{j}", False)
    keys |= _conv_keys("encoder.conv_out")
    # ------------------------------------------------------------- decoder
    channels = tuple(reversed(cfg.decoder_block_out_channels))
    scaling = tuple(reversed(cfg.decoder_spatio_temporal_scaling))
    layers = tuple(reversed(cfg.decoder_layers_per_block))
    keys |= _conv_keys("decoder.conv_in")
    for j in range(layers[0]):
        keys |= _res_keys(f"decoder.mid_block.resnets.{j}", False)
    out_ch = channels[0]
    for i in range(len(channels)):
        in_ch = out_ch
        out_ch = channels[i + 1] if i + 1 < len(channels) else channels[-1]
        if in_ch != out_ch:
            keys |= _res_keys(f"decoder.up_blocks.{i}.conv_in", True)
        if scaling[i]:
            keys |= _conv_keys(f"decoder.up_blocks.{i}.upsamplers.0.conv")
        for j in range(layers[i + 1]):
            keys |= _res_keys(f"decoder.up_blocks.{i}.resnets.{j}", False)
    keys |= _conv_keys("decoder.conv_out")
    return keys


def _init(cfg, frames=1):
    module = AutoencoderKLLTXVideo(cfg, dtype=jnp.float32)
    r = cfg.spatial_compression_ratio
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, frames, r, r), jnp.float32)
    )["params"]
    return module, params


class TestLTXVAEKeys:
    def test_export_key_set_matches_diffusers(self):
        _, params = _init(CFG)
        exported = set(export_ltx_vae_state_dict(params))
        expected = expected_ltx_keys(CFG)
        assert exported == expected, (
            f"missing={sorted(expected - exported)[:6]} extra={sorted(exported - expected)[:6]}"
        )

    def test_real_config_key_set_and_shapes(self):
        module = AutoencoderKLLTXVideo(REAL_CFG, dtype=jnp.float32)
        abstract = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 32, 32)))["params"]
        )
        from finetrainers_tpu.models.modeling_utils import flatten_params

        flat = {ltx_vae_key_map(k): v.shape for k, v in flatten_params(abstract).items()}
        assert set(flat) == expected_ltx_keys(REAL_CFG)
        # patchify: conv_in takes 3*4*4*1 = 48 channels (THWIO layout)
        assert flat["encoder.conv_in.conv.weight"] == (3, 3, 3, 48, 128)
        # shared-logvar: encoder emits latent+1 channels
        assert flat["encoder.conv_out.conv.weight"] == (3, 3, 3, 512, 129)
        # decoder unpatchify: 3*16 output channels
        assert flat["decoder.conv_out.conv.weight"] == (3, 3, 3, 128, 48)
        # upsampler conv: C -> 8C for (2,2,2) depth-to-space; block 1's conv_in
        # resnet already dropped 512 -> 256 before the upsampler
        assert flat["decoder.up_blocks.1.upsamplers.0.conv.conv.weight"] == (3, 3, 3, 256, 2048)

    def test_weight_roundtrip_exact(self):
        _, params = _init(CFG)
        state = export_ltx_vae_state_dict(params)
        restored = load_ltx_vae_params(state, jax.eval_shape(lambda: params))
        from finetrainers_tpu.models.modeling_utils import flatten_params

        a, b = flatten_params(params), flatten_params(restored)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


class TestLTXVAESemantics:
    def test_compression_and_shared_logvar(self):
        module, params = _init(CFG, frames=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 3, 8, 8))
        moments = module.apply({"params": params}, x, method=AutoencoderKLLTXVideo.encode)
        # p=2 x one 2x stage = 4x spatial; 1+2/2 = 2 latent frames; 2*4 channels
        assert moments.shape == (1, 8, 2, 2, 2)
        logvar = np.asarray(moments[:, 4:])
        # all logvar channels are copies of one channel
        np.testing.assert_allclose(logvar, np.broadcast_to(logvar[:, :1], logvar.shape), atol=1e-6)

    def test_real_ratios(self):
        assert REAL_CFG.spatial_compression_ratio == 32
        assert REAL_CFG.temporal_compression_ratio == 8

    def test_encoder_causality(self):
        module, params = _init(CFG, frames=5)
        x1 = jnp.zeros((1, 3, 5, 8, 8))
        x2 = x1.at[:, :, 3:].set(9.0)
        m1 = module.apply({"params": params}, x1, method=AutoencoderKLLTXVideo.encode)
        m2 = module.apply({"params": params}, x2, method=AutoencoderKLLTXVideo.encode)
        np.testing.assert_allclose(m1[:, :, 0], m2[:, :, 0], atol=1e-5)

    def test_decode_shapes(self):
        module, params = _init(CFG, frames=3)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 2, 2, 2))
        out = module.apply({"params": params}, z, method=AutoencoderKLLTXVideo.decode)
        assert out.shape == (1, 3, 3, 8, 8)

    def test_spec_loads_faithful_vae(self, tmp_path):
        import json

        from finetrainers_tpu.models.ltx_video import LTXVideoModelSpecification
        from finetrainers_tpu.utils.serialization import safetensors_save_dict

        vae_dir = tmp_path / "vae"
        vae_dir.mkdir()
        mean = list(np.linspace(-1, 1, 4))
        hf_cfg = {
            "_class_name": "AutoencoderKLLTXVideo",
            "latent_channels": 4, "block_out_channels": [8, 16],
            "decoder_block_out_channels": [8, 16],
            "layers_per_block": [1, 1, 1], "decoder_layers_per_block": [1, 1, 1],
            "spatio_temporal_scaling": [True, False],
            "decoder_spatio_temporal_scaling": [True, False],
            "patch_size": 2, "patch_size_t": 1,
            "latents_mean": mean, "latents_std": [1.5] * 4,
        }
        (vae_dir / "config.json").write_text(json.dumps(hf_cfg))
        _, params = _init(LTXVAEConfig.from_hf(hf_cfg))
        safetensors_save_dict(
            export_ltx_vae_state_dict(params),
            str(vae_dir / "diffusion_pytorch_model.safetensors"),
        )
        spec = LTXVideoModelSpecification(
            transformer_config=dict(in_channels=4, out_channels=4, num_attention_heads=2,
                                    attention_head_dim=8, cross_attention_dim=16, num_layers=1,
                                    caption_channels=32),
            vae_id=str(vae_dir), lora_rank=2, lora_alpha=2,
        )
        spec.vae_dtype = jnp.float32
        vae = spec.load_latent_models()["vae"]
        assert isinstance(vae.module, AutoencoderKLLTXVideo)
        np.testing.assert_allclose(vae.config["latents_mean"], mean)
        assert spec.vae_spatial_compression_ratio == 4
        assert spec.vae_temporal_compression_ratio == 2
