"""Experiment trackers.

Parity with reference `finetrainers/trackers.py:14-145`: `BaseTracker` no-op with a
`timed()` context accumulating `timing/*` metrics, `DummyTracker` for non-main
processes, `WandbTracker` (import-gated), `JSONLTracker` (local fallback so runs are
observable without wandb), and `SequentialTracker` fan-out.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from enum import Enum
from typing import Any, Dict, List, Optional, Union

from .constants import FINETRAINERS_ENABLE_TIMING
from .logging import get_logger


logger = get_logger(__name__)


class Trackers(str, Enum):
    NONE = "none"
    WANDB = "wandb"
    JSONL = "jsonl"


class BaseTracker:
    """No-op tracker base."""

    def __init__(self) -> None:
        self._timed_metrics: Dict[str, float] = {}

    @contextlib.contextmanager
    def timed(self, name: str):
        if not FINETRAINERS_ENABLE_TIMING:
            yield
            return
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            key = name if name.startswith("timing/") else f"timing/{name}"
            self._timed_metrics[key] = self._timed_metrics.get(key, 0.0) + elapsed

    def _consume_timed(self) -> Dict[str, float]:
        metrics, self._timed_metrics = self._timed_metrics, {}
        return metrics

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        pass

    def log_artifacts(self, artifacts: List[Dict[str, Any]], step: int) -> None:
        """Log validation media. `artifacts`: [{"type": "image"|"video",
        "path": str, "caption": str}] (reference logs wandb.Image/Video panels,
        trainer/sft_trainer/trainer.py:702-712)."""
        pass

    def finish(self) -> None:
        pass


class DummyTracker(BaseTracker):
    pass


class JSONLTracker(BaseTracker):
    """Append metrics to a local JSONL file (scalars only)."""

    def __init__(self, experiment_name: str, log_dir: str) -> None:
        super().__init__()
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{experiment_name}.jsonl")
        self._file = open(self._path, "a")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        metrics = dict(metrics)
        metrics.update(self._consume_timed())
        scalars = {k: v for k, v in metrics.items() if isinstance(v, (int, float, str))}
        self._file.write(json.dumps({"step": step, **scalars}) + "\n")
        self._file.flush()

    def log_artifacts(self, artifacts: List[Dict[str, Any]], step: int) -> None:
        entry = {
            f"validation/artifact_{i}": a.get("path", "")
            for i, a in enumerate(artifacts)
        }
        entry.update({
            f"validation/caption_{i}": a["caption"]
            for i, a in enumerate(artifacts) if a.get("caption")
        })
        if entry:
            self._file.write(json.dumps({"step": step, **entry}) + "\n")
            self._file.flush()

    def finish(self) -> None:
        self._file.close()


class WandbTracker(BaseTracker):
    def __init__(self, experiment_name: str, log_dir: str, config: Optional[Dict[str, Any]] = None) -> None:
        super().__init__()
        import wandb  # gated: not part of the baked image

        self.wandb = wandb
        os.makedirs(log_dir, exist_ok=True)
        self.run = wandb.init(project=experiment_name, dir=log_dir, config=config)

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        metrics = dict(metrics)
        metrics.update(self._consume_timed())
        self.run.log(metrics, step=step)

    def log_artifacts(self, artifacts: List[Dict[str, Any]], step: int) -> None:
        """Image/video panels like the reference (wandb.Image / wandb.Video lists
        under a single "validation" key)."""
        images, videos = [], []
        for a in artifacts:
            caption = a.get("caption")
            if a.get("type") == "video":
                videos.append(self.wandb.Video(a["path"], caption=caption))
            elif a.get("type") == "image":
                images.append(self.wandb.Image(a["path"], caption=caption))
        panel = {}
        if images:
            panel["validation/images"] = images
        if videos:
            panel["validation/videos"] = videos
        if panel:
            self.run.log(panel, step=step)

    def finish(self) -> None:
        self.run.finish()


class SequentialTracker(BaseTracker):
    def __init__(self, trackers: List[BaseTracker]) -> None:
        super().__init__()
        self.trackers = trackers

    @contextlib.contextmanager
    def timed(self, name: str):
        with contextlib.ExitStack() as stack:
            for tracker in self.trackers:
                stack.enter_context(tracker.timed(name))
            yield

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        for tracker in self.trackers:
            tracker.log(metrics, step)

    def log_artifacts(self, artifacts: List[Dict[str, Any]], step: int) -> None:
        for tracker in self.trackers:
            tracker.log_artifacts(artifacts, step)

    def finish(self) -> None:
        for tracker in self.trackers:
            tracker.finish()


def initialize_trackers(
    trackers: Union[str, List[str]],
    experiment_name: str,
    config: Optional[Dict[str, Any]] = None,
    log_dir: str = "logs",
    is_main_process: bool = True,
) -> BaseTracker:
    """Instantiate trackers on the main process only (reference parallel/base.py:47-57)."""
    if not is_main_process:
        return DummyTracker()
    if isinstance(trackers, str):
        trackers = [trackers]
    instances: List[BaseTracker] = []
    for name in trackers:
        if name in (Trackers.NONE, "none", None):
            continue
        if name == Trackers.WANDB or name == "wandb":
            try:
                instances.append(WandbTracker(experiment_name, log_dir, config))
            except ImportError:
                logger.warning("wandb is not installed; falling back to JSONL tracker.")
                instances.append(JSONLTracker(experiment_name, log_dir))
        elif name == Trackers.JSONL or name == "jsonl":
            instances.append(JSONLTracker(experiment_name, log_dir))
        else:
            raise ValueError(f"Unsupported tracker: {name}")
    if not instances:
        return BaseTracker()
    if len(instances) == 1:
        return instances[0]
    return SequentialTracker(instances)
