"""Optional-dependency gates. Parity with reference `utils/import_utils.py`
(flash-attn/sage/xformers gates become the TPU stack's optional deps)."""

from __future__ import annotations

import functools
import importlib
from typing import Optional


@functools.lru_cache(maxsize=None)
def _available(module: str) -> bool:
    try:
        importlib.import_module(module)
        return True
    except ImportError:
        return False


def is_wandb_available() -> bool:
    return _available("wandb")


def is_transformers_available() -> bool:
    return _available("transformers")


def is_datasets_available() -> bool:
    return _available("datasets")


def is_cv2_available() -> bool:
    return _available("cv2")


def is_native_media_ops_available() -> bool:
    from ..native import get_media_ops

    return get_media_ops() is not None


@functools.lru_cache(maxsize=None)
def get_version(module: str) -> Optional[str]:
    try:
        return importlib.import_module(module).__version__
    except (ImportError, AttributeError):
        return None
