"""Host-side media IO: image/video decode & encode via PIL/cv2 (native C++ codecs).

Replaces the reference's decord/torchvision decode (reference data/dataset.py:1010-1040
`_preprocess_image` / `_preprocess_video`). Layouts: image (C, H, W), video
(T, C, H, W), float32 in [-1, 1].
"""

from __future__ import annotations

import os
from typing import List, Optional

import cv2
import numpy as np
from PIL import Image

from ..native import get_media_ops


def _u8_hwc_to_float_chw(arr: np.ndarray) -> np.ndarray:
    """uint8 (...,H,W,C) -> float32 (...,C,H,W) in [-1,1]; fused native kernel
    when the C++ extension is available (multithreaded, zero intermediates)."""
    ops = get_media_ops()
    if ops is not None:
        return ops.to_float_chw(np.ascontiguousarray(arr))
    out = arr.astype(np.float32) / 127.5 - 1.0
    return np.moveaxis(out, -1, -3)


def load_image(path_or_pil, to_float: bool = True) -> np.ndarray:
    """-> (C, H, W) float32 in [-1,1] (or uint8 HWC if to_float=False)."""
    if isinstance(path_or_pil, Image.Image):
        img = np.asarray(path_or_pil.convert("RGB"))
    else:
        img = cv2.imread(str(path_or_pil), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"Could not read image: {path_or_pil}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if not to_float:
        return img
    return _u8_hwc_to_float_chw(img)


def load_video(path, max_frames: Optional[int] = None, to_float: bool = True) -> np.ndarray:
    """-> (T, C, H, W) float32 in [-1,1]."""
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"Could not open video: {path}")
    frames: List[np.ndarray] = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"Video has no frames: {path}")
    video = np.stack(frames)
    if not to_float:
        return video
    return _u8_hwc_to_float_chw(video)


def save_video(frames: np.ndarray, path: str, fps: int = 8) -> None:
    """frames: (T, H, W, 3) uint8."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def save_image(image: np.ndarray, path: str) -> None:
    """image: (H, W, 3) uint8."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
