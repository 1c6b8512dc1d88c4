"""LTX-Video checkpoint key mapping (diffusers LTXVideoTransformer3DModel <-> flax).

Covers the naming deltas beyond the generic rules in `models/weight_utils.py`:
time_embed's nested AdaLayerNormSingle, PixArt caption projection, FeedForward's
`ff.net.0.proj` / `ff.net.2`, and `to_out.0`.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..weight_utils import flax_key_to_torch, flax_params_to_torch_state_dict, torch_state_dict_to_flax


def ltx_key_map(flax_key: str) -> str:
    key = flax_key
    key = key.replace("time_embed.timestep_embedder_linear_1", "time_embed.emb.timestep_embedder.linear_1")
    key = key.replace("time_embed.timestep_embedder_linear_2", "time_embed.emb.timestep_embedder.linear_2")
    key = key.replace("caption_projection_linear_1", "caption_projection.linear_1")
    key = key.replace("caption_projection_linear_2", "caption_projection.linear_2")
    key = key.replace("ff_net_0_proj", "ff.net.0.proj")
    key = key.replace("ff_net_2", "ff.net.2")
    key = re.sub(r"\.to_out\.", ".to_out.0.", key)
    return flax_key_to_torch(key)


def load_ltx_transformer_params(state_dict: Dict[str, np.ndarray], abstract_params: Dict[str, Any]):
    return torch_state_dict_to_flax(state_dict, abstract_params, key_map=ltx_key_map)


def export_ltx_transformer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return flax_params_to_torch_state_dict(params, key_map=ltx_key_map)
