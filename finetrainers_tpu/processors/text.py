"""Caption dropout processors. Parity with reference `processors/text.py:10-23`."""

from __future__ import annotations

from typing import Any, Dict, List

from ..functional.text import dropout_caption, dropout_embeddings_to_zero
from .base import ProcessorMixin


class CaptionTextDropoutProcessor(ProcessorMixin):
    def __init__(self, dropout_p: float = 0.0):
        self.dropout_p = dropout_p
        self.output_names = ["caption"]

    def forward(self, caption, **kwargs) -> Dict[str, Any]:
        return {"caption": dropout_caption(caption, self.dropout_p)}


class CaptionEmbeddingDropoutProcessor(ProcessorMixin):
    def __init__(self, dropout_p: float = 0.0):
        self.dropout_p = dropout_p
        self.output_names = ["embedding"]

    def forward(self, embedding, **kwargs) -> Dict[str, Any]:
        return {"embedding": dropout_embeddings_to_zero(embedding, self.dropout_p)}
