"""Control data augmentation.

Parity with reference `trainer/control_trainer/data.py`:
  - `IterableControlDataset` synthesizes control_image/control_video via Canny or
    passthrough, resized to the target's shape (:18-122);
  - `apply_frame_conditioning_on_latents` masks/pads control latents per frame
    conditioning type (:202-268).
"""

from __future__ import annotations

import random
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ...processors import CannyProcessor, CopyProcessor
from .config import ControlType, FrameConditioningType


class IterableControlDataset:
    """Wraps the preprocessed dataset, adding control_image / control_video."""

    def __init__(self, dataset, control_type: str = ControlType.CANNY.value) -> None:
        self.dataset = dataset
        self.control_type = control_type
        self._canny = CannyProcessor(["control"])
        self._copy = CopyProcessor(["control"])
        self._precomputable_once = getattr(dataset, "_precomputable_once", False)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        for sample in self.dataset:
            yield self._process(sample)

    def _process(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(sample)
        if self.control_type == ControlType.NONE.value:
            return out
        processor = self._canny if self.control_type == ControlType.CANNY.value else self._copy
        if "image" in out and "control_image" not in out:
            out["control_image"] = processor(input=out["image"])["control"]
        if "video" in out and "control_video" not in out:
            out["control_video"] = processor(input=out["video"])["control"]
        return out

    def state_dict(self):
        return self.dataset.state_dict() if hasattr(self.dataset, "state_dict") else {}

    def load_state_dict(self, state):
        if hasattr(self.dataset, "load_state_dict"):
            self.dataset.load_state_dict(state)


def apply_frame_conditioning_on_latents(
    latents: np.ndarray,
    expected_num_frames: int,
    channel_dim: int,
    frame_dim: int,
    frame_conditioning_type: str,
    frame_conditioning_index: Optional[int] = None,
    concatenate_mask: bool = False,
) -> np.ndarray:
    """Host-side (numpy) masking of control latents per conditioning type
    (semantics of reference data.py:202-268)."""
    num_frames = latents.shape[frame_dim]
    mask = np.zeros_like(latents)

    def frame_slice(idx):
        s = [slice(None)] * latents.ndim
        s[frame_dim] = idx
        return tuple(s)

    ftype = FrameConditioningType(frame_conditioning_type)
    if ftype == FrameConditioningType.INDEX:
        mask[frame_slice(min(frame_conditioning_index or 0, num_frames - 1))] = 1
        latents = latents * mask
    elif ftype == FrameConditioningType.PREFIX:
        keep = random.randint(1, num_frames)
        mask[frame_slice(slice(0, keep))] = 1
        latents = latents * mask
    elif ftype == FrameConditioningType.RANDOM:
        keep = random.randint(1, num_frames)
        idx = random.sample(range(num_frames), keep)
        mask[frame_slice(idx)] = 1
        latents = latents * mask
    elif ftype == FrameConditioningType.FIRST_AND_LAST:
        mask[frame_slice(0)] = 1
        mask[frame_slice(num_frames - 1)] = 1
        latents = latents * mask
    elif ftype == FrameConditioningType.FULL:
        mask[frame_slice(slice(0, num_frames))] = 1

    if num_frames >= expected_num_frames:
        latents = latents[frame_slice(slice(0, expected_num_frames))]
        mask = mask[frame_slice(slice(0, expected_num_frames))]
    else:
        pad_shape = list(latents.shape)
        pad_shape[frame_dim] = expected_num_frames - num_frames
        pad = np.zeros(pad_shape, latents.dtype)
        latents = np.concatenate([latents, pad], axis=frame_dim)
        mask = np.concatenate([mask, pad], axis=frame_dim)

    if concatenate_mask:
        # Reference concatenates the full mask tensor along channels (data.py:263-266).
        latents = np.concatenate([latents, mask], axis=channel_dim)
    return latents


def apply_frame_conditioning_on_latents_jax(
    latents,
    rng,
    frame_dim: int,
    channel_dim: int,
    frame_conditioning_type: str,
    frame_conditioning_index: int = 0,
    concatenate_mask: bool = False,
):
    """Traced (jittable) variant used inside spec.forward: stochastic types draw
    from `rng` instead of Python random."""
    import jax
    import jax.numpy as jnp

    num_frames = latents.shape[frame_dim]
    shape = [1] * latents.ndim
    shape[frame_dim] = num_frames
    frame_idx = jnp.arange(num_frames).reshape(shape)

    ftype = FrameConditioningType(frame_conditioning_type)
    if ftype == FrameConditioningType.INDEX:
        frame_mask = (frame_idx == min(frame_conditioning_index, num_frames - 1))
    elif ftype == FrameConditioningType.PREFIX:
        keep = jax.random.randint(rng, (), 1, num_frames + 1)
        frame_mask = frame_idx < keep
    elif ftype == FrameConditioningType.RANDOM:
        keep = jax.random.randint(rng, (), 1, num_frames + 1)
        scores = jax.random.uniform(jax.random.fold_in(rng, 1), (num_frames,))
        ranks = jnp.argsort(jnp.argsort(scores))
        frame_mask = (ranks < keep).reshape(shape)
    elif ftype == FrameConditioningType.FIRST_AND_LAST:
        frame_mask = (frame_idx == 0) | (frame_idx == num_frames - 1)
    else:  # FULL
        frame_mask = jnp.ones_like(frame_idx, dtype=bool)

    mask = jnp.broadcast_to(frame_mask, latents.shape).astype(latents.dtype)
    if ftype != FrameConditioningType.FULL:
        latents = latents * mask
    if concatenate_mask:
        latents = jnp.concatenate([latents, mask], axis=channel_dim)
    return latents
