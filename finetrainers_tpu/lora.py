"""LoRA utilities: param-pytree partitioning, export/import, merging.

Replaces the reference's peft integration (`trainer/sft_trainer/trainer.py:107-136`
adapter injection, `:279-306` save hooks, `patches/dependencies/diffusers/peft.py:19-62`
metadata-aware loading): LoRA factors are ordinary leaves (`lora_a`/`lora_b`) inside
`LoRADense` params, so "adding an adapter" is a model-config flag and training only
them is a pytree mask.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from .models.modeling_utils import flatten_params, unflatten_params
from .utils.serialization import safetensors_load_dict, safetensors_load_metadata, safetensors_save_dict


LORA_KEYS = ("lora_a", "lora_b")


def path_matches(path_str: str, patterns: List[str]) -> bool:
    return any(re.search(p, path_str) for p in patterns)


def _leaf_path_str(path) -> str:
    return ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def trainable_mask(params, predicate: Callable[[str], bool]):
    """Boolean pytree: True where the param should be trained."""
    return jax.tree_util.tree_map_with_path(lambda p, x: predicate(_leaf_path_str(p)), params)


def lora_mask(params):
    """Mask selecting LoRA leaves only."""
    return trainable_mask(params, lambda s: any(k in s for k in LORA_KEYS))


def split_params(params, mask):
    """Split into (trainable, frozen) pytrees with None placeholders (for optax)."""
    trainable = jax.tree_util.tree_map(lambda x, m: x if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda x, m: None if m else x, params, mask)
    return trainable, frozen


def merge_params(trainable, frozen):
    """Union of the split trees. A dict-walk rather than tree_map: int8 frozen
    storage (utils/int8.py) adds `kernel_qscale` sidecar leaves to the frozen
    tree with no trainable counterpart, so the two treedefs may differ."""
    if isinstance(trainable, dict) or isinstance(frozen, dict):
        t = trainable if isinstance(trainable, dict) else {}
        f = frozen if isinstance(frozen, dict) else {}
        return {k: merge_params(t.get(k), f.get(k)) for k in {**f, **t}}
    return trainable if trainable is not None else frozen


def extract_lora_state_dict(params) -> Dict[str, np.ndarray]:
    """Flat {path: array} of LoRA leaves."""
    flat = flatten_params(params)
    return {k: _to_host(v) for k, v in flat.items() if any(lk in k for lk in LORA_KEYS)}


def _to_host(v) -> np.ndarray:
    """Fetch an array to host numpy, all-gathering leaves that span
    non-addressable devices (multi-process export paths)."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable and not v.is_fully_replicated:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(v, tiled=True))
    return np.asarray(v)


def save_lora_weights(directory: str, lora_params, lora_config: Dict[str, Any],
                      key_map=None) -> None:
    """Write inference-ready `pytorch_lora_weights.safetensors` in the
    peft/diffusers key convention
    (`transformer.transformer_blocks.0.attn1.to_q.lora_A.weight`, torch-layout
    transposed), with the LoRA config embedded in the safetensors metadata
    (reference trainer/sft_trainer/trainer.py:284-298). `key_map` is the
    per-family flax->torch key mapping (e.g. LTX's ff.net renames)."""
    from .models.weight_utils import lora_flax_to_peft

    os.makedirs(directory, exist_ok=True)
    if isinstance(lora_params, dict) and all(isinstance(v, np.ndarray) for v in lora_params.values()):
        state = lora_params  # already a flat state dict
    else:
        state = extract_lora_state_dict(lora_params)
    if not any(".lora_A." in k or ".lora_B." in k for k in state):
        state = lora_flax_to_peft(state, prefix="transformer", key_map=key_map)
    safetensors_save_dict(
        state,
        os.path.join(directory, "pytorch_lora_weights.safetensors"),
        metadata={"lora_config": json.dumps(lora_config)},
    )


def load_lora_weights(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load (state_dict, lora_config) from a safetensors file or directory."""
    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_lora_weights.safetensors")
    state = safetensors_load_dict(path)
    metadata = safetensors_load_metadata(path)
    config = json.loads(metadata.get("lora_config", "{}"))
    return state, config


def apply_auxiliary_weights(params, aux_path: str):
    """Overlay non-LoRA trained leaves exported next to an adapter (control
    qk-norm + full-rank injection weights, `control_aux_weights.safetensors`)
    onto a param tree by flat path. No-op if the file does not exist."""
    if not os.path.exists(aux_path):
        return params
    aux = safetensors_load_dict(aux_path)
    flat = flatten_params(params)
    for key, value in aux.items():
        if key not in flat:
            raise KeyError(f"Auxiliary weight {key!r} not found in target params")
        flat[key] = np.asarray(value).astype(np.asarray(flat[key]).dtype)
    return unflatten_params(flat)


def apply_lora_state_dict(params, state_dict: Dict[str, np.ndarray]):
    """Insert loaded LoRA leaves back into a param pytree by path."""
    flat = flatten_params(params)
    for key, value in state_dict.items():
        if key not in flat:
            raise KeyError(f"LoRA key {key!r} not found in target params")
        flat[key] = value.astype(np.asarray(flat[key]).dtype) if hasattr(flat[key], "dtype") else value
    return unflatten_params(flat)


def apply_lora_to_module_params(params, module, state_dict: Dict[str, np.ndarray], key_map=None):
    """Apply a loaded LoRA state dict (peft-convention or flax-flat keys) onto a
    module's param tree, handling scan-stacked layouts (reference analog:
    `patches/dependencies/diffusers/peft.py:19-62` metadata-aware loading)."""
    from .models.weight_utils import (
        lora_peft_to_flax,
        scan_stacks_of,
        stack_params_for_scan,
        unstack_params_from_scan,
    )

    stacks = scan_stacks_of(module)
    pb = unstack_params_from_scan(params, stacks) if stacks else params
    if any(".lora_A." in k or ".lora_B." in k for k in state_dict):
        lora_keys = [k for k in flatten_params(pb) if any(lk in k for lk in LORA_KEYS)]
        state_dict = lora_peft_to_flax(state_dict, key_map=key_map, abstract_lora_keys=lora_keys)
    pb = apply_lora_state_dict(pb, state_dict)
    return stack_params_for_scan(pb, stacks) if stacks else pb


def merge_lora_into_base(params, alpha_over_rank: Optional[float] = None):
    """Fold W += (alpha/r)·A@B for export of merged full weights."""
    flat = flatten_params(params)
    out = dict(flat)
    for key in list(flat):
        if key.endswith("lora_a"):
            stem = key[: -len("lora_a")]
            b_key = stem + "lora_b"
            w_key = stem + "kernel"
            if b_key in flat and w_key in flat:
                a = np.asarray(flat[key], dtype=np.float32)
                b = np.asarray(flat[b_key], dtype=np.float32)
                rank = a.shape[1]
                scale = alpha_over_rank if alpha_over_rank is not None else 1.0 / rank
                w = np.asarray(flat[w_key])
                out[w_key] = (w.astype(np.float32) + scale * (a @ b)).astype(w.dtype)
                del out[key], out[b_key]
    return unflatten_params(out)
