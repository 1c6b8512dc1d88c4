"""Per-family SHARDED diffusers-checkpoint round-trips (VERDICT r3 item 4):
export a random-init spec's transformer to torch-layout state dict, write it as
a 2-shard safetensors checkpoint with a `*.safetensors.index.json` weight map
(the hub layout for every >10 GB real checkpoint), then load it back through
the spec's own `pretrained_model_name_or_path` path and require exact equality
on every base leaf (with fresh LoRA leaves on top).

Reference analog: every family's spec `from_pretrained`s real (sharded) hub
checkpoints, e.g. `/root/reference/finetrainers/models/wan/base_specification.py:269-295`.
"""

import json
import pathlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from finetrainers_tpu.utils.serialization import safetensors_save_dict  # noqa: E402

from test_model_zoo import FAMILIES  # noqa: E402


def _write_sharded(state, ckpt_dir):
    """Split a state dict across 2 shards + index.json (hub sharded layout)."""
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    keys = sorted(state)
    half = len(keys) // 2
    shards = {
        "diffusion_pytorch_model-00001-of-00002.safetensors": {k: state[k] for k in keys[:half]},
        "diffusion_pytorch_model-00002-of-00002.safetensors": {k: state[k] for k in keys[half:]},
    }
    weight_map = {}
    for fname, shard in shards.items():
        safetensors_save_dict(shard, str(ckpt_dir / fname))
        weight_map.update({k: fname for k in shard})
    (ckpt_dir / "diffusion_pytorch_model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map})
    )


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_sharded_roundtrip(family, tmp_path):
    spec_factory = FAMILIES[family]
    src_spec, export_fn, _load_fn, _kind = spec_factory()
    src_spec.transformer_dtype = jnp.float32
    src = src_spec.load_diffusion_models()["transformer"]
    state = export_fn(src.params)
    assert len(state) >= 4, "export produced suspiciously few tensors"

    ckpt = tmp_path / "model" / "transformer"
    _write_sharded(state, ckpt)
    (ckpt / "config.json").write_text(json.dumps(
        {k: v for k, v in src_spec.transformer_config.items()}
    ))

    dst_spec, _, _, _ = spec_factory()
    dst_spec.pretrained_model_name_or_path = str(tmp_path / "model")
    dst_spec.transformer_dtype = jnp.float32
    dst = dst_spec.load_diffusion_models()["transformer"]

    from finetrainers_tpu.models.modeling_utils import flatten_params

    src_flat = flatten_params(src.params)
    dst_flat = flatten_params(dst.params)
    for key, value in src_flat.items():
        if "lora_" in key:
            continue  # fresh adapters, not part of the checkpoint
        np.testing.assert_array_equal(
            np.asarray(dst_flat[key]), np.asarray(value),
            err_msg=f"{family}: leaf {key} did not round-trip through the sharded checkpoint",
        )
    assert any("lora_a" in k for k in dst_flat)
