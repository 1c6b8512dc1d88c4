"""Loadable handles for the flax text/vision towers.

Each handle = (tokenizer?, flax module, params) loading an HF checkpoint
directory (config.json + *.safetensors) through the generic converter
machinery, and exposing the duck-typed `encode*` API the condition processors
consume (`processors/text_encoders.py`). HashEncoder remains the offline
fallback when no checkpoint directory is present.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...logging import get_logger
from ..modeling_utils import flatten_params, unflatten_params
from ..weight_utils import flax_key_to_torch, torch_state_dict_to_flax
from .towers import (
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    DecoderConfig,
    DecoderTextModel,
)


logger = get_logger(__name__)


def _load_dir(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """(config dict, merged state dict) from an HF model directory."""
    from ...utils.serialization import safetensors_load_dict

    root = pathlib.Path(path)
    config = json.loads((root / "config.json").read_text())
    index = root / "model.safetensors.index.json"
    state: Dict[str, np.ndarray] = {}
    if index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
    else:
        shards = sorted(p.name for p in root.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"No safetensors shards under {path}")
    for shard in shards:
        state.update(safetensors_load_dict(str(root / shard)))
    return config, state


def _strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    if any(k.startswith(prefix) for k in state):
        return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in state.items()}
    return state


def _decoder_key_map(flax_key: str) -> str:
    key = flax_key_to_torch(flax_key)
    return key.replace(".embedding", ".weight") if key.endswith(".embedding") else key


def _maybe_tokenizer(model_dir: str, tokenizer_id: Optional[str]):
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(tokenizer_id or model_dir)
    except Exception as e:
        logger.warning(f"No tokenizer available for {model_dir} ({e}); encode() requires one")
        return None


def _init_and_load(module, init_fn, state, key_map, extra_transform=None):
    abstract = jax.eval_shape(init_fn)
    if extra_transform:
        state = extra_transform(state, abstract)
    return torch_state_dict_to_flax(state, abstract, key_map=key_map)


class FlaxLlamaHandle:
    """Llama decoder (HunyuanVideo text tower; reference processors/llama.py).

    encode(templated_captions, max_sequence_length, num_layers_to_skip=2)
    returns `hidden_states[-(skip+1)]` and the attention mask (the processor
    crops the prompt-template prefix)."""

    supports_template_crop = True

    def __init__(self, model_dir: str, tokenizer_id: Optional[str] = None, dtype=jnp.float32):
        config, state = _load_dir(model_dir)
        state = _strip_prefix(state, "model.")
        self.config = DecoderConfig.llama(config)
        self.module = DecoderTextModel(self.config, dtype=dtype)
        ids = jnp.zeros((1, 8), jnp.int32)
        self.params = _init_and_load(
            self.module, lambda: self.module.init(jax.random.PRNGKey(0), ids)["params"],
            state, _decoder_key_map,
        )
        self.tokenizer = _maybe_tokenizer(model_dir, tokenizer_id)
        self.num_layers_to_skip = 2

    def encode(self, captions: List[str], max_sequence_length: int = 256) -> Tuple[np.ndarray, np.ndarray]:
        batch = self.tokenizer(
            captions, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        mask = jnp.asarray(batch["attention_mask"], jnp.int32)
        hidden = self.module.apply({"params": self.params}, ids, attention_mask=mask)
        embeds = hidden[-(self.num_layers_to_skip + 1)]
        return np.asarray(embeds), np.asarray(mask)


class FlaxGlmHandle:
    """GLM decoder (CogView4 text tower; reference processors/glm.py): encode
    left-pads to a multiple of 16 and returns `hidden_states[-2]` — causal
    attention only, no padding mask, matching the reference call exactly."""

    def __init__(self, model_dir: str, tokenizer_id: Optional[str] = None, dtype=jnp.float32):
        config, state = _load_dir(model_dir)
        state = _strip_prefix(state, "model.")
        self.config = DecoderConfig.glm(config)
        self.module = DecoderTextModel(self.config, dtype=dtype)
        ids = jnp.zeros((1, 8), jnp.int32)
        self.params = _init_and_load(
            self.module, lambda: self.module.init(jax.random.PRNGKey(0), ids)["params"],
            state, _decoder_key_map,
        )
        self.tokenizer = _maybe_tokenizer(model_dir, tokenizer_id)

    def encode(self, captions: List[str], max_sequence_length: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
        batch = self.tokenizer(
            captions, padding="longest", max_length=max_sequence_length,
            truncation=True, add_special_tokens=True, return_tensors="np",
        )
        ids = np.asarray(batch["input_ids"], np.int32)
        pad_length = 16 - ids.shape[1] % 16
        if pad_length > 0:
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.concatenate(
                [np.full((ids.shape[0], pad_length), pad_id, np.int32), ids], axis=1
            )
        hidden = self.module.apply({"params": self.params}, jnp.asarray(ids))
        embeds = hidden[-2]
        return np.asarray(embeds), np.ones(ids.shape, np.int32)


class FlaxCLIPTextHandle:
    """CLIP text tower (Flux/HunyuanVideo pooled conditioning; reference
    processors/clip.py): encode_pooled returns the EOS-position embedding."""

    def __init__(self, model_dir: str, tokenizer_id: Optional[str] = None, dtype=jnp.float32,
                 with_projection: bool = False):
        config, state = _load_dir(model_dir)
        state = _strip_prefix(state, "text_model.")
        # text_projection lives outside the text_model scope in HF checkpoints.
        self.config = CLIPTextConfig.from_hf(config, with_projection=with_projection)
        self.module = CLIPTextTower(self.config, dtype=dtype)
        ids = jnp.zeros((1, 8), jnp.int32)
        self.params = _init_and_load(
            self.module, lambda: self.module.init(jax.random.PRNGKey(0), ids)["params"],
            state, _decoder_key_map,
        )
        self.tokenizer = _maybe_tokenizer(model_dir, tokenizer_id)

    def encode(self, captions: List[str], max_sequence_length: int = 77) -> Tuple[np.ndarray, np.ndarray]:
        batch = self.tokenizer(
            captions, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        last, _ = self.module.apply({"params": self.params}, ids)
        return np.asarray(last), np.asarray(batch["attention_mask"], np.int32)

    def encode_pooled(self, captions: List[str]) -> np.ndarray:
        batch = self.tokenizer(
            captions, padding="max_length", max_length=77, truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(batch["input_ids"], jnp.int32)
        _, pooled = self.module.apply({"params": self.params}, ids)
        return np.asarray(pooled)


def _conv_transform(state: Dict[str, np.ndarray], abstract) -> Dict[str, np.ndarray]:
    """torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    out = dict(state)
    for key, value in state.items():
        if key.endswith("patch_embedding.weight") and value.ndim == 4:
            out[key] = np.transpose(value, (2, 3, 1, 0))
    return out


class FlaxCLIPVisionHandle:
    """CLIP vision tower (Wan I2V image conditioning; reference
    models/wan/base_specification.py:183-206): encode_image returns
    hidden_states[-2] over (B, 3, H, W) pixel values preprocessed to the CLIP
    normalization."""

    def __init__(self, model_dir: str, dtype=jnp.float32):
        config, state = _load_dir(model_dir)
        state = _strip_prefix(state, "vision_model.")
        self.config = CLIPVisionConfig.from_hf(
            config.get("vision_config", config)
        )
        self.module = CLIPVisionTower(self.config, dtype=dtype)
        px = jnp.zeros((1, self.config.num_channels, self.config.image_size, self.config.image_size))
        self.params = _init_and_load(
            self.module, lambda: self.module.init(jax.random.PRNGKey(0), px)["params"],
            state, _decoder_key_map, extra_transform=_conv_transform,
        )

    def encode_image(self, pixel_values: np.ndarray) -> np.ndarray:
        hidden, _ = self.module.apply({"params": self.params}, jnp.asarray(pixel_values))
        return np.asarray(hidden[-2])
