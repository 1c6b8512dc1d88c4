"""Faithful AutoencoderKLWan: the expected diffusers state-dict key set is
enumerated here INDEPENDENTLY from the config math and compared against the
converter's export; plus exact round-trip, compression ratios, and first-frame
causality (reference encodes through diffusers AutoencoderKLWan,
wan/base_specification.py:420-474)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.models.wan.vae import (
    AutoencoderKLWan,
    WanVAEConfig,
    export_wan_vae_state_dict,
    load_wan_vae_params,
)


# Tiny config with the full structural variety of the real one (channel change,
# 2d + 3d resamples, mid attention).
CFG = WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
    temperal_downsample=(False, True),
    latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4,
)
REAL_CFG = WanVAEConfig()  # Wan 2.1 defaults


def _conv_keys(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias"}


def _res_keys(prefix, shortcut):
    keys = {f"{prefix}.norm1.gamma", f"{prefix}.norm2.gamma"}
    keys |= _conv_keys(f"{prefix}.conv1") | _conv_keys(f"{prefix}.conv2")
    if shortcut:
        keys |= _conv_keys(f"{prefix}.conv_shortcut")
    return keys


def expected_wan_keys(cfg: WanVAEConfig):
    """Diffusers AutoencoderKLWan key set, built from the config alone."""
    keys = set()
    dims = [cfg.base_dim * u for u in (1,) + tuple(cfg.dim_mult)]
    # ------------------------------------------------------------- encoder
    keys |= _conv_keys("encoder.conv_in")
    idx = 0
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        cur = in_dim
        for _ in range(cfg.num_res_blocks):
            keys |= _res_keys(f"encoder.down_blocks.{idx}", cur != out_dim)
            idx += 1
            cur = out_dim
        if i != len(cfg.dim_mult) - 1:
            keys |= _conv_keys(f"encoder.down_blocks.{idx}.resample.1")
            if cfg.temperal_downsample[i]:
                keys |= _conv_keys(f"encoder.down_blocks.{idx}.time_conv")
            idx += 1
    keys |= _res_keys("encoder.mid_block.resnets.0", False)
    keys |= _res_keys("encoder.mid_block.resnets.1", False)
    keys |= {"encoder.mid_block.attentions.0.norm.gamma"}
    keys |= _conv_keys("encoder.mid_block.attentions.0.to_qkv")
    keys |= _conv_keys("encoder.mid_block.attentions.0.proj")
    keys |= {"encoder.norm_out.gamma"} | _conv_keys("encoder.conv_out")
    keys |= _conv_keys("quant_conv") | _conv_keys("post_quant_conv")
    # ------------------------------------------------------------- decoder
    mults = (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))
    ddims = [cfg.base_dim * u for u in mults]
    temperal_upsample = tuple(reversed(cfg.temperal_downsample))
    keys |= _conv_keys("decoder.conv_in")
    keys |= _res_keys("decoder.mid_block.resnets.0", False)
    keys |= _res_keys("decoder.mid_block.resnets.1", False)
    keys |= {"decoder.mid_block.attentions.0.norm.gamma"}
    keys |= _conv_keys("decoder.mid_block.attentions.0.to_qkv")
    keys |= _conv_keys("decoder.mid_block.attentions.0.proj")
    idx = 0
    for i, (in_dim, out_dim) in enumerate(zip(ddims[:-1], ddims[1:])):
        cur = in_dim // 2 if i > 0 else in_dim
        for _ in range(cfg.num_res_blocks + 1):
            keys |= _res_keys(f"decoder.up_blocks.{idx}", cur != out_dim)
            idx += 1
            cur = out_dim
        if i != len(cfg.dim_mult) - 1:
            keys |= _conv_keys(f"decoder.up_blocks.{idx}.resample.1")
            if temperal_upsample[i]:
                keys |= _conv_keys(f"decoder.up_blocks.{idx}.time_conv")
            idx += 1
    keys |= {"decoder.norm_out.gamma"} | _conv_keys("decoder.conv_out")
    return keys


def _init(cfg, frames=1):
    module = AutoencoderKLWan(cfg, dtype=jnp.float32)
    r = cfg.spatial_compression_ratio
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, frames, r, r), jnp.float32)
    )["params"]
    return module, params


class TestWanVAEKeys:
    def test_export_key_set_matches_diffusers(self):
        _, params = _init(CFG)
        exported = set(export_wan_vae_state_dict(params))
        expected = expected_wan_keys(CFG)
        assert exported == expected, (
            f"missing={sorted(expected - exported)[:6]} extra={sorted(exported - expected)[:6]}"
        )

    def test_real_config_key_set(self):
        """Real Wan 2.1 shape: 96 base, [1,2,4,4], 2 res blocks, [F,T,T]."""
        module = AutoencoderKLWan(REAL_CFG, dtype=jnp.float32)
        abstract = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 1, 8, 8)))["params"]
        )
        from finetrainers_tpu.models.modeling_utils import flatten_params
        from finetrainers_tpu.models.wan.vae import wan_vae_key_map

        exported = {wan_vae_key_map(k) for k in flatten_params(abstract)}
        assert exported == expected_wan_keys(REAL_CFG)
        # spot-check real shapes
        flat = {wan_vae_key_map(k): v.shape for k, v in flatten_params(abstract).items()}
        assert flat["encoder.conv_in.weight"] == (3, 3, 3, 3, 96)  # THWIO
        assert flat["encoder.conv_out.weight"] == (3, 3, 3, 384, 32)
        assert flat["encoder.mid_block.attentions.0.to_qkv.weight"] == (1, 1, 384, 1152)
        assert flat["decoder.up_blocks.4.conv_shortcut.weight"] == (1, 1, 1, 192, 384)
        assert flat["decoder.up_blocks.3.time_conv.weight"] == (3, 1, 1, 384, 768)

    def test_weight_roundtrip_exact(self):
        module, params = _init(CFG)
        state = export_wan_vae_state_dict(params)
        abstract = jax.eval_shape(lambda: params)
        restored = load_wan_vae_params(state, abstract)
        from finetrainers_tpu.models.modeling_utils import flatten_params

        a, b = flatten_params(params), flatten_params(restored)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


class TestWanVAESemantics:
    def test_compression_ratios(self):
        module, params = _init(CFG, frames=5)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 5, 16, 16))
        moments = module.apply({"params": params}, x, method=AutoencoderKLWan.encode)
        # 1 + 4/2 latent frames (one 3d downsample), /4 spatial (2 stages), 2*z ch
        assert moments.shape == (1, 8, 3, 4, 4)

    def test_real_ratios_properties(self):
        assert REAL_CFG.spatial_compression_ratio == 8
        assert REAL_CFG.temporal_compression_ratio == 4

    def test_first_frame_causality(self):
        module, params = _init(CFG, frames=5)
        x1 = jnp.zeros((1, 3, 5, 16, 16))
        x2 = x1.at[:, :, 3:].set(55.0)
        m1 = module.apply({"params": params}, x1, method=AutoencoderKLWan.encode)
        m2 = module.apply({"params": params}, x2, method=AutoencoderKLWan.encode)
        np.testing.assert_allclose(m1[:, :, 0], m2[:, :, 0], atol=1e-5)

    def test_decode_frame_count(self):
        module, params = _init(CFG, frames=5)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 3, 4, 4))
        out = module.apply({"params": params}, z, method=AutoencoderKLWan.decode)
        assert out.shape == (1, 3, 5, 16, 16)

    def test_spec_uses_faithful_vae_with_stats(self, tmp_path):
        """A local diffusers vae/ dir (config + weights) loads through the spec
        with its latent statistics."""
        import json

        from finetrainers_tpu.models.wan import WanModelSpecification
        from finetrainers_tpu.utils.serialization import safetensors_save_dict

        vae_dir = tmp_path / "vae"
        vae_dir.mkdir()
        mean = list(np.arange(4) * 0.1)
        hf_cfg = {
            "_class_name": "AutoencoderKLWan", "base_dim": 8, "z_dim": 4,
            "dim_mult": [1, 2, 2], "num_res_blocks": 1,
            "attn_scales": [], "temperal_downsample": [False, True],
            "latents_mean": mean, "latents_std": [2.0] * 4,
        }
        (vae_dir / "config.json").write_text(json.dumps(hf_cfg))
        _, params = _init(WanVAEConfig.from_hf(hf_cfg))
        safetensors_save_dict(
            export_wan_vae_state_dict(params),
            str(vae_dir / "diffusion_pytorch_model.safetensors"),
        )
        spec = WanModelSpecification(
            transformer_config=dict(in_channels=4, out_channels=4, patch_size=(1, 2, 2),
                                    num_attention_heads=2, attention_head_dim=12, num_layers=1,
                                    ffn_dim=32, text_dim=32, freq_dim=32, image_dim=None),
            vae_id=str(vae_dir), lora_rank=2, lora_alpha=2,
        )
        spec.vae_dtype = jnp.float32
        vae = spec.load_latent_models()["vae"]
        assert isinstance(vae.module, AutoencoderKLWan)
        np.testing.assert_allclose(vae.config["latents_mean"], mean)
        np.testing.assert_allclose(vae.config["latents_std"], [2.0] * 4)
        moments = vae.apply(jnp.zeros((1, 3, 5, 16, 16)), method=AutoencoderKLWan.encode)
        assert moments.shape == (1, 8, 3, 4, 4)


class TestUpsample3dCachedParity:
    """Resolve the upsample3d first-chunk alignment definitively (VERDICT r2
    item 5b): our monolithic WanResample(upsample3d) must match a NumPy
    frame-by-frame simulation of diffusers' feat_cache decode algorithm —
    first frame passes through WITHOUT the time conv ("Rep" marker) and is
    EXCLUDED from later conv windows; frames 2..T form an independent causal
    zero-padded sequence, each doubled channel-group-major."""

    def test_matches_cached_simulation(self):
        from finetrainers_tpu.models.wan.vae import WanResample

        T, HH, WW, C = 5, 4, 4, 6
        mod = WanResample(dim=C, mode="upsample3d", dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, T, HH, WW, C), jnp.float32)
        params = mod.init(jax.random.fold_in(rng, 1), x)["params"]
        got = np.asarray(mod.apply({"params": params}, x))

        w = np.asarray(params["time_conv"]["conv"]["kernel"], np.float64)  # (3,1,1,C,2C)
        bconv = np.asarray(params["time_conv"]["conv"]["bias"], np.float64)
        frames = np.asarray(x[0], np.float64)  # (T, H, W, C)

        def conv3(f0, f1, f2):
            stack = np.stack([f0, f1, f2])  # (3, H, W, C)
            return np.einsum("thwc,tcd->hwd", stack, w[:, 0, 0]) + bconv  # (H, W, 2C)

        # diffusers AutoencoderKLWan frame-by-frame cached decode
        cache = None
        temporal_out = []
        for i in range(T):
            f = frames[i]
            if cache is None:
                cache = "Rep"
                temporal_out.append(f)  # first chunk: no time conv, undoubled
                continue
            if isinstance(cache, str):  # "Rep": conv with internal zero padding
                y = conv3(np.zeros_like(f), np.zeros_like(f), f)
                cache = [np.zeros_like(f), f]
            else:
                y = conv3(cache[-2], cache[-1], f)
                cache = [cache[-1], f]
            temporal_out.append(y[..., :C])   # channel group 0 first
            temporal_out.append(y[..., C:])
        temporal = np.stack(temporal_out)  # (2T-1, H, W, C)

        # spatial stage: reuse the module's own conv per frame (per-frame op,
        # chunking-invariant) on the simulated temporal output
        import flax.linen as nn

        spatial = nn.Conv(C // 2, (3, 3), padding="SAME", param_dtype=jnp.float32)
        sp_params = {"kernel": params["resample_1"]["kernel"], "bias": params["resample_1"]["bias"]}
        up = jax.image.resize(jnp.asarray(temporal, jnp.float32),
                              (temporal.shape[0], HH * 2, WW * 2, C), "nearest")
        want = np.asarray(spatial.apply({"params": sp_params}, up))

        assert got.shape == (1, 2 * T - 1, HH * 2, WW * 2, C // 2)
        np.testing.assert_allclose(got[0], want, atol=1e-4, rtol=1e-4)
