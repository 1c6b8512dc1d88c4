"""Min-max normalization working on both numpy arrays and JAX arrays.

Parity with reference `finetrainers/functional/normalization.py:7`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def normalize(x, min: float = -1.0, max: float = 1.0, dim: Optional[int] = None):
    """Normalize to [min, max]; degenerate (constant) inputs map to `min`."""
    xp = np if isinstance(x, np.ndarray) else __import__("jax.numpy", fromlist=["numpy"])
    if dim is None:
        x_min, x_max = x.min(), x.max()
        if bool(np.isclose(float(x_min), float(x_max))):
            return xp.full_like(x, min)
        return min + (max - min) * (x - x_min) / (x_max - x_min)
    x_min = x.min(axis=dim, keepdims=True)
    x_max = x.max(axis=dim, keepdims=True)
    if bool(np.any(np.isclose(np.asarray(x_min), np.asarray(x_max)))):
        return xp.full_like(x, min)
    return min + (max - min) * (x - x_min) / (x_max - x_min)
