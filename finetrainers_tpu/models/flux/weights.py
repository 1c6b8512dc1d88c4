"""Flux checkpoint key mapping (diffusers FluxTransformer2DModel <-> flax)."""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from ..weight_utils import flax_key_to_torch, flax_params_to_torch_state_dict, torch_state_dict_to_flax


_RENAMES = [
    ("timestep_embedder_linear_1", "time_text_embed.timestep_embedder.linear_1"),
    ("timestep_embedder_linear_2", "time_text_embed.timestep_embedder.linear_2"),
    ("guidance_embedder_linear_1", "time_text_embed.guidance_embedder.linear_1"),
    ("guidance_embedder_linear_2", "time_text_embed.guidance_embedder.linear_2"),
    ("text_embedder_linear_1", "time_text_embed.text_embedder.linear_1"),
    ("text_embedder_linear_2", "time_text_embed.text_embedder.linear_2"),
    ("norm_out_linear", "norm_out.linear"),
    ("attn_add_q_proj", "attn.add_q_proj"),
    ("attn_add_k_proj", "attn.add_k_proj"),
    ("attn_add_v_proj", "attn.add_v_proj"),
    ("attn_norm_added_q", "attn.norm_added_q"),
    ("attn_norm_added_k", "attn.norm_added_k"),
    ("attn_to_add_out", "attn.to_add_out"),
    ("attn_to_out", "attn.to_out.0"),
    ("attn_to_q", "attn.to_q"),
    ("attn_to_k", "attn.to_k"),
    ("attn_to_v", "attn.to_v"),
    ("attn_norm_q", "attn.norm_q"),
    ("attn_norm_k", "attn.norm_k"),
    ("norm_linear", "norm.linear"),
    ("ff_context_net_0_proj", "ff_context.net.0.proj"),
    ("ff_context_net_2", "ff_context.net.2"),
    ("ff_net_0_proj", "ff.net.0.proj"),
    ("ff_net_2", "ff.net.2"),
]


def flux_key_map(flax_key: str) -> str:
    key = flax_key
    for ours, theirs in _RENAMES:
        key = key.replace(ours, theirs)
    # single-block attention out proj in diffusers is `proj_out` (already matches).
    return flax_key_to_torch(key)


def load_flux_transformer_params(state_dict: Dict[str, np.ndarray], abstract_params: Dict[str, Any]):
    return torch_state_dict_to_flax(state_dict, abstract_params, key_map=flux_key_map)


def export_flux_transformer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return flax_params_to_torch_state_dict(params, key_map=flux_key_map)
