"""HunyuanVideo checkpoint key mapping (diffusers HunyuanVideoTransformer3DModel <-> flax)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..flux.weights import _RENAMES as _FLUX_RENAMES
from ..weight_utils import flax_key_to_torch, flax_params_to_torch_state_dict, torch_state_dict_to_flax


_RENAMES = [
    ("context_embedder_proj_in", "context_embedder.proj_in"),
    ("refiner_t_embedder_linear_1", "context_embedder.time_text_embed.timestep_embedder.linear_1"),
    ("refiner_t_embedder_linear_2", "context_embedder.time_text_embed.timestep_embedder.linear_2"),
    ("refiner_c_embedder_linear_1", "context_embedder.time_text_embed.text_embedder.linear_1"),
    ("refiner_c_embedder_linear_2", "context_embedder.time_text_embed.text_embedder.linear_2"),
    ("refiner_blocks", "context_embedder.token_refiner.refiner_blocks"),
] + list(_FLUX_RENAMES)


def hunyuan_key_map(flax_key: str) -> str:
    key = flax_key
    for ours, theirs in _RENAMES:
        key = key.replace(ours, theirs)
    return flax_key_to_torch(key)


def load_hunyuan_transformer_params(state_dict: Dict[str, np.ndarray], abstract_params: Dict[str, Any]):
    return torch_state_dict_to_flax(state_dict, abstract_params, key_map=hunyuan_key_map)


def export_hunyuan_transformer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return flax_params_to_torch_state_dict(params, key_map=hunyuan_key_map)
