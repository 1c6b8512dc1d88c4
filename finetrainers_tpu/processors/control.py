"""Control-signal processors. Parity with reference `processors/canny.py:15-78`
(kornia canny -> cv2 native edges here) and `CopyProcessor` (processors/__init__.py:13-25)."""

from __future__ import annotations

from typing import Any, Dict, List, Union

import cv2
import numpy as np

from .base import ProcessorMixin


def _canny_frame(frame_chw: np.ndarray, low: float = 100, high: float = 200) -> np.ndarray:
    """(C,H,W) float [-1,1] -> canny edges (C,H,W) float [-1,1] (3-channel replicated)."""
    hwc = np.moveaxis(frame_chw, 0, -1)
    u8 = ((hwc + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    gray = cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY)
    edges = cv2.Canny(gray, low, high)
    out = np.repeat(edges[..., None], 3, axis=-1).astype(np.float32) / 127.5 - 1.0
    return np.moveaxis(out, -1, 0)


class CannyProcessor(ProcessorMixin):
    """Canny edge maps for control conditioning; handles image (C,H,W) and video
    (T,C,H,W) float arrays in [-1,1]."""

    def __init__(self, output_names: List[str], low: float = 100, high: float = 200,
                 input_names: Dict[str, str] = None):
        self.output_names = output_names
        self.input_names = input_names
        self.low = low
        self.high = high
        assert len(output_names) == 1

    def forward(self, input: np.ndarray = None, **kwargs) -> Dict[str, Any]:
        x = input
        if x is None:
            raise ValueError("CannyProcessor requires an input array")
        if x.ndim == 3:
            out = _canny_frame(x, self.low, self.high)
        elif x.ndim == 4:
            out = np.stack([_canny_frame(f, self.low, self.high) for f in x])
        else:
            raise ValueError(f"Expected 3D/4D array, got {x.ndim}D")
        return {self.output_names[0]: out}


class CopyProcessor(ProcessorMixin):
    """Pass the target media through as its own control signal."""

    def __init__(self, output_names: List[str], input_names: Dict[str, str] = None):
        self.output_names = output_names
        self.input_names = input_names
        assert len(output_names) == 1

    def forward(self, input: np.ndarray = None, **kwargs) -> Dict[str, Any]:
        return {self.output_names[0]: np.copy(input)}
