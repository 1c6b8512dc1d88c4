"""Safetensors save/load with metadata.

Parity with reference `utils/serialization.py:6-10` (safetensors with embedded
metadata — used for LoRA export with `lora_config` JSON in the header).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def safetensors_save_dict(tensors: Dict[str, np.ndarray], path: str, metadata: Optional[Dict[str, str]] = None) -> None:
    from safetensors.numpy import save_file

    # ascontiguousarray is load-bearing: safetensors serializes raw buffers, and
    # transposed (non-contiguous) views would round-trip corrupted.
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, path, metadata=metadata)


def safetensors_load_dict(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def safetensors_load_metadata(path: str) -> Dict[str, str]:
    import json
    import struct

    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    return header.get("__metadata__", {}) or {}
