"""CogVideoX checkpoint key mapping (diffusers CogVideoXTransformer3DModel <-> flax)."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..weight_utils import flax_key_to_torch, flax_params_to_torch_state_dict, torch_state_dict_to_flax


_RENAMES = [
    ("patch_embed_text_proj", "patch_embed.text_proj"),
    ("patch_embed_proj", "patch_embed.proj"),
    ("pos_embedding", "patch_embed.pos_embedding"),
    ("time_embedding_linear_1", "time_embedding.linear_1"),
    ("time_embedding_linear_2", "time_embedding.linear_2"),
    ("ofs_embedding_linear_1", "ofs_embedding.linear_1"),
    ("ofs_embedding_linear_2", "ofs_embedding.linear_2"),
    ("norm1.norm_enc", "norm1.norm"),  # shared LN in diffusers? kept distinct; see note
    ("attn1_to_q", "attn1.to_q"),
    ("attn1_to_k", "attn1.to_k"),
    ("attn1_to_v", "attn1.to_v"),
    ("attn1_norm_q", "attn1.norm_q"),
    ("attn1_norm_k", "attn1.norm_k"),
    ("attn1_to_out", "attn1.to_out.0"),
    ("ff_net_0_proj", "ff.net.0.proj"),
    ("ff_net_2", "ff.net.2"),
    ("norm_out_linear", "norm_out.linear"),
    ("norm_out_ln", "norm_out.norm"),
]


def cogvideox_key_map(flax_key: str) -> str:
    key = flax_key
    for ours, theirs in _RENAMES:
        key = key.replace(ours, theirs)
    return flax_key_to_torch(key)


def load_cogvideox_transformer_params(state_dict: Dict[str, np.ndarray], abstract_params: Dict[str, Any]):
    return torch_state_dict_to_flax(state_dict, abstract_params, key_map=cogvideox_key_map)


def export_cogvideox_transformer_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return flax_params_to_torch_state_dict(params, key_map=cogvideox_key_map)
