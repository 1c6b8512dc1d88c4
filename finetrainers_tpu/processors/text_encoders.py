"""Text-encoder condition processors.

Parity with reference `processors/t5.py`, `processors/clip.py`, `processors/llama.py`,
`processors/glm.py`: caption -> embeddings (+ attention mask / kv lens).

Encoders are duck-typed handles exposing `encode(captions, max_sequence_length)
-> (embeds, mask)`. `FlaxT5Handle` wraps transformers' FlaxT5EncoderModel (JAX-
native, loads HF torch checkpoints via from_pt). Offline tests use `HashEncoder`.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..logging import get_logger
from .base import ProcessorMixin


logger = get_logger(__name__)


class HashEncoder:
    """Deterministic offline stand-in for any text encoder (tests / smoke runs)."""

    def __init__(self, hidden_size: int = 32, max_length: int = 16, pooled_dim: Optional[int] = None):
        self.hidden_size = hidden_size
        self.max_length = max_length
        self.pooled_dim = pooled_dim

    def encode(self, captions: List[str], max_sequence_length: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        max_len = max_sequence_length or self.max_length
        embeds, masks = [], []
        for caption in captions:
            seed = int.from_bytes(hashlib.sha256(caption.encode()).digest()[:4], "little")
            rng = np.random.RandomState(seed)
            n_tokens = min(max(len(caption.split()), 1), max_len)
            e = np.zeros((max_len, self.hidden_size), np.float32)
            e[:n_tokens] = rng.randn(n_tokens, self.hidden_size) * 0.02
            m = np.zeros((max_len,), np.int32)
            m[:n_tokens] = 1
            embeds.append(e)
            masks.append(m)
        return np.stack(embeds), np.stack(masks)

    def encode_pooled(self, captions: List[str]) -> np.ndarray:
        dim = self.pooled_dim or self.hidden_size
        out = []
        for caption in captions:
            seed = int.from_bytes(hashlib.sha256(("pool" + caption).encode()).digest()[:4], "little")
            out.append(np.random.RandomState(seed).randn(dim).astype(np.float32) * 0.02)
        return np.stack(out)


class FlaxT5Handle:
    """T5/UMT5 encoder via transformers Flax (JAX-native compute)."""

    def __init__(self, model_id: str, tokenizer_id: Optional[str] = None, dtype=None, umt5: bool = False):
        import os

        from transformers import AutoTokenizer, FlaxT5EncoderModel

        # Diffusers checkpoint layouts keep the tower under `text_encoder/`
        # (reference passes subfolder="text_encoder" to T5EncoderModel); accept
        # either a direct T5 dir/id or a pipeline root. For hub ids the
        # subfolder kwarg does the same redirection from_pretrained-side.
        kwargs = {}
        tok_kwargs = {}
        if os.path.isdir(model_id):
            sub = os.path.join(model_id, "text_encoder")
            if os.path.isdir(sub) and not os.path.exists(os.path.join(model_id, "config.json")):
                model_id = sub
        elif not os.path.exists(model_id):  # hub pipeline id (no local path)
            kwargs["subfolder"] = "text_encoder"
            tok_kwargs["subfolder"] = "tokenizer"
        self.model = FlaxT5EncoderModel.from_pretrained(model_id, from_pt=True, **kwargs)
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                tokenizer_id or model_id, **({} if tokenizer_id else tok_kwargs))
        except Exception as e:  # tokenizer assets missing (offline tiny dirs)
            logger.warning(f"T5 weights loaded but tokenizer unavailable ({e}); set .tokenizer before encode()")
            self.tokenizer = None
            self._tokenizer_error = e

    def encode(self, captions: List[str], max_sequence_length: int = 128) -> Tuple[np.ndarray, np.ndarray]:
        if self.tokenizer is None:
            raise RuntimeError(
                "FlaxT5Handle has no tokenizer (loading failed at construction; "
                "see the warning above). Assign `.tokenizer` before encoding."
            ) from getattr(self, "_tokenizer_error", None)
        batch = self.tokenizer(
            captions, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        out = self.model(input_ids=batch["input_ids"], attention_mask=batch["attention_mask"])
        return np.asarray(out.last_hidden_state), np.asarray(batch["attention_mask"])


class T5Processor(ProcessorMixin):
    """(reference processors/t5.py:9-87) -> {embeds, attention mask}."""

    def __init__(self, output_names: List[str], use_attention_mask: bool = True,
                 input_names: Optional[Dict[str, str]] = None):
        self.output_names = output_names
        self.use_attention_mask = use_attention_mask
        self.input_names = input_names
        assert len(output_names) == 2

    def forward(self, text_encoder, caption: Union[str, List[str]], max_sequence_length: int = 128, **kwargs):
        captions = [caption] if isinstance(caption, str) else list(caption)
        embeds, mask = text_encoder.encode(captions, max_sequence_length=max_sequence_length)
        if self.use_attention_mask:
            embeds = embeds * mask[..., None]
        return {self.output_names[0]: embeds, self.output_names[1]: mask.astype(np.int32)}


class CLIPPooledProcessor(ProcessorMixin):
    """(reference processors/clip.py:9) -> pooled projection embeds."""

    def __init__(self, output_names: List[str], input_names: Optional[Dict[str, str]] = None):
        self.output_names = output_names
        self.input_names = input_names
        assert len(output_names) == 1

    def forward(self, text_encoder, caption: Union[str, List[str]], **kwargs):
        captions = [caption] if isinstance(caption, str) else list(caption)
        pooled = text_encoder.encode_pooled(captions)
        return {self.output_names[0]: pooled}


DEFAULT_HUNYUAN_PROMPT_TEMPLATE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)


class LlamaProcessor(ProcessorMixin):
    """HunyuanVideo's Llama prompt-template processor (reference processors/llama.py:23):
    wraps the caption in the system template before encoding; the template prefix's
    hidden states are cropped out."""

    def __init__(self, output_names: List[str], prompt_template: Optional[str] = None, crop_start: int = 95):
        self.output_names = output_names
        self.prompt_template = prompt_template or DEFAULT_HUNYUAN_PROMPT_TEMPLATE
        self.crop_start = crop_start
        assert len(output_names) == 2

    def forward(self, text_encoder, caption: Union[str, List[str]], max_sequence_length: int = 256, **kwargs):
        captions = [caption] if isinstance(caption, str) else list(caption)
        templated = [self.prompt_template.format(c) for c in captions]
        crop = self.crop_start if getattr(text_encoder, "supports_template_crop", True) else 0
        embeds, mask = text_encoder.encode(templated, max_sequence_length=max_sequence_length + crop)
        embeds = embeds[:, crop:]
        mask = mask[:, crop:]
        return {self.output_names[0]: embeds, self.output_names[1]: mask.astype(np.int32)}


class CogView4GLMProcessor(ProcessorMixin):
    """(reference processors/glm.py:9) GLM hidden-state embeddings."""

    def __init__(self, output_names: List[str]):
        self.output_names = output_names
        assert len(output_names) == 1

    def forward(self, text_encoder, caption: Union[str, List[str]], max_sequence_length: int = 1024, **kwargs):
        captions = [caption] if isinstance(caption, str) else list(caption)
        embeds, _ = text_encoder.encode(captions, max_sequence_length=max_sequence_length)
        return {self.output_names[0]: embeds}
