"""Shared type aliases (reference typing.py:1-11 exposes ArtifactType and
SchedulerType; here the scheduler classes are this repo's JAX implementations)."""

from typing import Any, Callable, Dict, Tuple, Union

from .data import ImageArtifact, VideoArtifact
from .schedulers import CogVideoXDDIMScheduler, FlowMatchEulerScheduler

ArtifactType = Union[ImageArtifact, VideoArtifact]
SchedulerType = Union[CogVideoXDDIMScheduler, FlowMatchEulerScheduler]

#: Flat pytree of model parameters (flax params subtree).
ParamsType = Dict[str, Any]

#: `cp_plan()` result: pytree-path -> sequence dim to shard over the cp axis.
ContextParallelPlan = Dict[str, int]

#: Weight key-map: flax param path -> diffusers state-dict key.
KeyMapType = Callable[[str], str]

#: `ModelSpecification.forward` result: (prediction, target, auxiliary dict).
ForwardResult = Tuple[Any, Any, Dict[str, Any]]
