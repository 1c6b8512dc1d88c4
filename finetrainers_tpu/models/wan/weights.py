"""Wan checkpoint key mapping (diffusers WanTransformer3DModel <-> flax)."""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..weight_utils import flax_key_to_torch, flax_params_to_torch_state_dict, torch_state_dict_to_flax


def wan_key_map(flax_key: str) -> str:
    key = flax_key
    key = key.replace("condition_embedder_time_embedder_linear_1", "condition_embedder.time_embedder.linear_1")
    key = key.replace("condition_embedder_time_embedder_linear_2", "condition_embedder.time_embedder.linear_2")
    key = key.replace("condition_embedder_time_proj", "condition_embedder.time_proj")
    key = key.replace("condition_embedder_text_embedder_linear_1", "condition_embedder.text_embedder.linear_1")
    key = key.replace("condition_embedder_text_embedder_linear_2", "condition_embedder.text_embedder.linear_2")
    key = key.replace("condition_embedder_image_embedder_norm1", "condition_embedder.image_embedder.norm1")
    key = key.replace("condition_embedder_image_embedder_norm2", "condition_embedder.image_embedder.norm2")
    key = key.replace("condition_embedder_image_embedder_ff_1", "condition_embedder.image_embedder.ff.net.0.proj")
    key = key.replace("condition_embedder_image_embedder_ff_2", "condition_embedder.image_embedder.ff.net.2")
    key = key.replace("ffn_net_0_proj", "ffn.net.0.proj")
    key = key.replace("ffn_net_2", "ffn.net.2")
    key = re.sub(r"\.to_out\.", ".to_out.0.", key)
    return flax_key_to_torch(key)


def load_wan_transformer_params(state_dict: Dict[str, np.ndarray], abstract_params: Dict[str, Any]):
    return torch_state_dict_to_flax(state_dict, abstract_params, key_map=wan_key_map)


def export_wan_transformer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return flax_params_to_torch_state_dict(params, key_map=wan_key_map)
