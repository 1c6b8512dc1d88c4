"""Device memory statistics. Parity with reference `utils/memory.py` (CUDA stats
become per-device TPU memory_stats)."""

from __future__ import annotations

import gc
from typing import Any, Dict


def bytes_to_gigabytes(x: int) -> float:
    return round(x / 1024**3, 3) if x is not None else None


def get_memory_statistics(precision: int = 3) -> Dict[str, Any]:
    import jax

    stats: Dict[str, Any] = {}
    try:
        device = jax.local_devices()[0]
        mem = device.memory_stats() or {}
        stats = {
            "memory_allocated": bytes_to_gigabytes(mem.get("bytes_in_use", 0)),
            "memory_reserved": bytes_to_gigabytes(mem.get("bytes_reserved", mem.get("bytes_in_use", 0))),
            "max_memory_allocated": bytes_to_gigabytes(mem.get("peak_bytes_in_use", 0)),
            "memory_limit": bytes_to_gigabytes(mem.get("bytes_limit", 0)),
        }
    except Exception:
        stats = {"memory_allocated": None}
    return stats


def free_memory() -> None:
    gc.collect()


def make_contiguous(x):
    import numpy as np

    if isinstance(x, np.ndarray):
        return np.ascontiguousarray(x)
    return x
