"""Weight conversion between diffusers/PyTorch checkpoints and flax param trees.

The reference loads diffusers checkpoints directly; this framework stores params
as flax pytrees, so per-model converters map key names + transpose Linear kernels
(torch Linear weight is (out, in); flax Dense kernel is (in, out)).

Conventions used by every converter here:
  - flax block lists are suffixed modules: "transformer_blocks_0" <-> torch
    "transformer_blocks.0".
  - "kernel" <-> "weight" (transposed), "bias" <-> "bias",
    RMS/LayerNorm "scale" <-> "weight".
  - LoRA: flax "lora_a" (in, r) <-> peft "lora_A.weight" (r, in) transposed,
    "lora_b" (r, out) <-> "lora_B.weight" (out, r) transposed.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import numpy as np

from .modeling_utils import flatten_params, unflatten_params


def _is_linear_kernel(flax_key: str) -> bool:
    return flax_key.endswith(".kernel")


_BLOCK_LIST_NAMES = (
    "transformer_blocks", "single_transformer_blocks", "temporal_transformer_blocks",
    "blocks", "layers", "down_blocks", "up_blocks", "mid_blocks", "resnets",
)
_BLOCK_RE = re.compile(r"\b(" + "|".join(_BLOCK_LIST_NAMES) + r")_(\d+)\.")


def flax_key_to_torch(flax_key: str) -> str:
    """Generic name mapping: transformer_blocks_0.attn1.to_q.kernel ->
    transformer_blocks.0.attn1.to_q.weight. Only known block-list names get the
    `_N` -> `.N` treatment (plain module names like `linear_1` keep their
    underscore)."""
    key = _BLOCK_RE.sub(r"\1.\2.", flax_key)
    key = key.replace(".kernel", ".weight")
    key = re.sub(r"\.scale$", ".weight", key)
    return key


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    flax_params_abstract: Dict[str, Any],
    key_map: Optional[Callable[[str], str]] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax param tree from a torch state dict.

    flax_params_abstract: pytree (or eval_shape result) giving target keys/shapes.
    key_map: flax flat key -> torch key (default: `flax_key_to_torch`).
    """
    key_map = key_map or flax_key_to_torch
    flat_target = flatten_params(flax_params_abstract)
    out: Dict[str, np.ndarray] = {}
    missing = []
    for flax_key, target in flat_target.items():
        torch_key = key_map(flax_key)
        if torch_key not in state_dict:
            if ".lora_a" in flax_key or ".lora_b" in flax_key:
                # Fresh adapters: keep the initialized values (checkpoints don't
                # carry LoRA factors; they load separately via lora_peft_to_flax).
                try:
                    out[flax_key] = np.asarray(target)
                except TypeError:  # abstract target (ShapeDtypeStruct)
                    out[flax_key] = np.zeros(target.shape, _np_dtype(target))
                continue
            if strict:
                missing.append((flax_key, torch_key))
                continue
            out[flax_key] = np.zeros(target.shape, _np_dtype(target))
            continue
        value = np.asarray(state_dict[torch_key])
        if _is_linear_kernel(flax_key) and value.ndim == 2:
            value = value.T
        if tuple(value.shape) != tuple(target.shape):
            raise ValueError(
                f"Shape mismatch for {flax_key} <- {torch_key}: {value.shape} vs {target.shape}"
            )
        out[flax_key] = value.astype(_np_dtype(target))
    if missing:
        raise KeyError(f"{len(missing)} keys missing from checkpoint, e.g. {missing[:3]}")
    return unflatten_params(out)


def flax_params_to_torch_state_dict(
    params: Dict[str, Any], key_map: Optional[Callable[[str], str]] = None,
    include_lora: bool = False,
) -> Dict[str, np.ndarray]:
    """Inverse conversion for diffusers-format export. LoRA factors are excluded
    by default (they export separately in peft convention, or get merged)."""
    key_map = key_map or flax_key_to_torch
    flat = flatten_params(params)
    out = {}
    for flax_key, value in flat.items():
        if not include_lora and (".lora_a" in flax_key or ".lora_b" in flax_key):
            continue
        value = np.asarray(value)
        if _is_linear_kernel(flax_key) and value.ndim == 2:
            value = value.T
        out[key_map(flax_key)] = value
    return out


def lora_flax_to_peft(
    lora_state: Dict[str, np.ndarray], prefix: str = "transformer"
) -> Dict[str, np.ndarray]:
    """Our flat LoRA state -> peft/diffusers-convention keys
    (`transformer.transformer_blocks.0.attn1.to_q.lora_A.weight`)."""
    out = {}
    for key, value in lora_state.items():
        torch_key = re.sub(r"_(\d+)\.", r".\1.", key)
        torch_key = torch_key.replace(".lora_a", ".lora_A.weight").replace(".lora_b", ".lora_B.weight")
        out[f"{prefix}.{torch_key}"] = np.asarray(value).T
    return out


def lora_peft_to_flax(state_dict: Dict[str, np.ndarray], prefix: str = "transformer") -> Dict[str, np.ndarray]:
    out = {}
    for key, value in state_dict.items():
        k = key
        if k.startswith(prefix + "."):
            k = k[len(prefix) + 1 :]
        k = k.replace(".lora_A.weight", ".lora_a").replace(".lora_B.weight", ".lora_b")
        # re-suffix block indices: transformer_blocks.0. -> transformer_blocks_0.
        k = re.sub(r"\.(\d+)\.", lambda m: f"_{m.group(1)}.", k)
        out[k] = np.asarray(value).T
    return out


def load_diffusers_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Read a diffusers-format model directory: config.json + one or more
    safetensors shards (diffusion_pytorch_model*.safetensors), returning the merged
    state dict (the torch-side input to the per-model converters)."""
    import json
    import pathlib

    from ..utils.serialization import safetensors_load_dict

    root = pathlib.Path(path)
    index = root / "diffusion_pytorch_model.safetensors.index.json"
    state: Dict[str, np.ndarray] = {}
    if index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
        for shard in shards:
            state.update(safetensors_load_dict(str(root / shard)))
    else:
        shards = sorted(root.glob("diffusion_pytorch_model*.safetensors")) or sorted(
            root.glob("*.safetensors")
        )
        if not shards:
            raise FileNotFoundError(f"No safetensors shards found under {path}")
        for shard in shards:
            state.update(safetensors_load_dict(str(shard)))
    return state


def load_diffusers_config(path: str) -> Dict[str, Any]:
    import json
    import pathlib

    return json.loads((pathlib.Path(path) / "config.json").read_text())


def _np_dtype(target) -> np.dtype:
    dtype = getattr(target, "dtype", np.float32)
    try:
        return np.dtype(dtype)
    except TypeError:
        import jax.numpy as jnp

        return np.dtype(jnp.dtype(dtype))
