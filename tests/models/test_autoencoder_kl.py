"""Faithful 2D AutoencoderKL: exact diffusers key coverage, weight round-trip,
and spec integration (Flux/CogView4 image VAE; VERDICT r1 item 4 for the 2D
KL family)."""

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.autoencoder_kl import (  # noqa: E402
    AutoencoderKL,
    AutoencoderKLConfig,
    autoencoder_kl_key_map,
    export_autoencoder_kl_state_dict,
    load_autoencoder_kl_params,
)
from finetrainers_tpu.models.modeling_utils import flatten_params  # noqa: E402


TINY = AutoencoderKLConfig(
    latent_channels=4, block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
)


def _expected_diffusers_keys():
    """The exact state-dict keys diffusers' AutoencoderKL produces for TINY,
    enumerated independently of the implementation (from the diffusers module
    structure: DownEncoderBlock2D / UNetMidBlock2D / UpDecoderBlock2D)."""
    keys = set()

    def resnet(prefix, shortcut):
        for mod in ("norm1", "conv1", "norm2", "conv2") + (("conv_shortcut",) if shortcut else ()):
            keys.add(f"{prefix}.{mod}.weight")
            keys.add(f"{prefix}.{mod}.bias")

    def attention(prefix):
        for mod in ("group_norm", "to_q", "to_k", "to_v", "to_out.0"):
            keys.add(f"{prefix}.{mod}.weight")
            keys.add(f"{prefix}.{mod}.bias")

    def mid(prefix):
        resnet(f"{prefix}.resnets.0", False)
        attention(f"{prefix}.attentions.0")
        resnet(f"{prefix}.resnets.1", False)

    # encoder: blocks (8, 16), 1 resnet each, downsampler after block 0
    for mod in ("encoder.conv_in", "encoder.conv_norm_out", "encoder.conv_out",
                "decoder.conv_in", "decoder.conv_norm_out", "decoder.conv_out",
                "quant_conv", "post_quant_conv"):
        keys.add(f"{mod}.weight")
        keys.add(f"{mod}.bias")
    resnet("encoder.down_blocks.0.resnets.0", False)          # 8 -> 8
    keys.add("encoder.down_blocks.0.downsamplers.0.conv.weight")
    keys.add("encoder.down_blocks.0.downsamplers.0.conv.bias")
    resnet("encoder.down_blocks.1.resnets.0", True)           # 8 -> 16: shortcut
    mid("encoder.mid_block")
    mid("decoder.mid_block")
    # decoder: reversed channels (16, 8), layers_per_block+1 = 2 resnets
    resnet("decoder.up_blocks.0.resnets.0", False)            # 16 -> 16
    resnet("decoder.up_blocks.0.resnets.1", False)
    keys.add("decoder.up_blocks.0.upsamplers.0.conv.weight")
    keys.add("decoder.up_blocks.0.upsamplers.0.conv.bias")
    resnet("decoder.up_blocks.1.resnets.0", True)             # 16 -> 8: shortcut
    resnet("decoder.up_blocks.1.resnets.1", False)
    return keys


def _init_params():
    module = AutoencoderKL(TINY, dtype=jnp.float32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 8, 8)))["params"]
    return module, params


def test_key_map_covers_exact_diffusers_keys():
    _, params = _init_params()
    mapped = {autoencoder_kl_key_map(k) for k in flatten_params(params)}
    expected = _expected_diffusers_keys()
    assert mapped == expected, (
        f"missing={sorted(expected - mapped)[:5]} extra={sorted(mapped - expected)[:5]}"
    )


def test_weight_roundtrip_exact():
    module, params = _init_params()
    sd = export_autoencoder_kl_state_dict(params)
    # torch layouts in the export
    assert sd["encoder.conv_in.weight"].shape == (8, 3, 3, 3)
    assert sd["encoder.mid_block.attentions.0.to_q.weight"].shape == (16, 16)
    abstract = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    back = load_autoencoder_kl_params(sd, abstract)
    fa, fb = flatten_params(params), flatten_params(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def test_encode_decode_shapes_and_flux_quant_toggle():
    module, params = _init_params()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16, 16), jnp.float32)
    moments = module.apply({"params": params}, x, method=AutoencoderKL.encode)
    assert moments.shape == (1, 8, 8, 8)  # 2*latent, /2 spatial (1 downsample)
    img = module.apply({"params": params}, moments[:, :4], method=AutoencoderKL.decode)
    assert img.shape == (1, 3, 16, 16)
    assert bool(jnp.isfinite(moments).all()) and bool(jnp.isfinite(img).all())

    flux_like = AutoencoderKLConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
        use_quant_conv=False, use_post_quant_conv=False, shift_factor=0.1159,
        scaling_factor=0.3611,
    )
    m2 = AutoencoderKL(flux_like, dtype=jnp.float32)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 8, 8)))["params"]
    assert "quant_conv" not in p2 and "post_quant_conv" not in p2
    mapped = {autoencoder_kl_key_map(k) for k in flatten_params(p2)}
    assert not any(k.startswith("quant_conv") or k.startswith("post_quant_conv") for k in mapped)


def test_flux_spec_loads_checkpoint_vae(tmp_path):
    """Spec integration: a local diffusers-style vae/ dir (config.json +
    safetensors) is picked up with its latent statistics, and the latent path
    plus pipeline decode run through the 2D VAE."""
    from finetrainers_tpu.models.flux import FluxModelSpecification
    from finetrainers_tpu.utils.serialization import safetensors_save_dict

    vae_dir = tmp_path / "vae"
    vae_dir.mkdir()
    module, params = _init_params()
    hf_config = {
        "_class_name": "AutoencoderKL", "latent_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1, "norm_num_groups": 4,
        "scaling_factor": 0.3611, "shift_factor": 0.1159,
    }
    (vae_dir / "config.json").write_text(json.dumps(hf_config))
    safetensors_save_dict(
        export_autoencoder_kl_state_dict(params),
        str(vae_dir / "diffusion_pytorch_model.safetensors"),
    )

    spec = FluxModelSpecification(
        pretrained_model_name_or_path=str(tmp_path),
        transformer_config=dict(in_channels=16, num_layers=1, num_single_layers=1,
                                num_attention_heads=2, attention_head_dim=8,
                                pooled_projection_dim=16, joint_attention_dim=32,
                                guidance_embeds=True, axes_dims_rope=(2, 4, 2)),
    )
    spec.vae_dtype = jnp.float32
    vae = spec.load_latent_models()["vae"]
    assert isinstance(vae.module, AutoencoderKL)
    assert vae.config["scaling_factor"] == 0.3611
    assert vae.config["shift_factor"] == 0.1159
    assert vae.config["spatial_compression_ratio"] == 2
    lats = spec.prepare_latents(vae, image=np.zeros((3, 16, 16), np.float32))
    assert lats["latents"].shape == (1, 8, 8, 8)
