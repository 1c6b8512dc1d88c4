"""Caption string ops. Parity with reference `finetrainers/functional/text.py`."""

from __future__ import annotations

import random
from typing import List, Union

import numpy as np


def convert_byte_str_to_str(s: str, encoding: str = "utf-8") -> str:
    """Extract the string from a stringified bytes literal, e.g. "b'hi'" -> "hi".
    Plain strings pass through untouched."""
    if not (len(s) >= 3 and s[0] == "b" and s[1] in ("'", '"') and s[-1] == s[1]):
        return s
    try:
        inner = s[2:-1]
        return inner.encode("utf-8").decode(encoding)
    except (UnicodeDecodeError, UnicodeEncodeError, IndexError):
        return s


def dropout_caption(caption: Union[str, List[str]], dropout_p: float = 0) -> Union[str, List[str]]:
    if random.random() >= dropout_p:
        return caption
    if isinstance(caption, str):
        return ""
    return [""] * len(caption)


def dropout_embeddings_to_zero(embed, dropout_p: float = 0):
    if random.random() >= dropout_p:
        return embed
    if isinstance(embed, np.ndarray):
        return np.zeros_like(embed)
    import jax.numpy as jnp

    return jnp.zeros_like(embed)


def remove_prefix(text: str, prefixes) -> str:
    for prefix in prefixes:
        if text.startswith(prefix):
            return text.removeprefix(prefix).strip()
    return text
