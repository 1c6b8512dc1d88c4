"""Wall-clock timers with device synchronization.

Parity with reference `utils/timing.py:28-108` (CUDA-event timing becomes
`block_until_ready`-bracketed wall-clock on TPU; `jax.profiler` covers deep traces).
"""

from __future__ import annotations

import time
from typing import Optional

from ..constants import FINETRAINERS_ENABLE_TIMING


class Timer:
    """Context manager measuring wall-clock seconds, optionally synchronizing the
    device so that async dispatch doesn't hide compute time."""

    def __init__(self, name: str = "", device_sync: bool = False) -> None:
        self.name = name
        self.device_sync = device_sync
        self.elapsed: Optional[float] = None
        self._start: Optional[float] = None

    def _sync(self) -> None:
        if not self.device_sync:
            return
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()

    def __enter__(self) -> "Timer":
        if FINETRAINERS_ENABLE_TIMING:
            self._sync()
            self._start = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        if FINETRAINERS_ENABLE_TIMING and self._start is not None:
            self._sync()
            self.elapsed = time.perf_counter() - self._start


class ProfilerTrace:
    """XPlane trace capture (SURVEY §5: the TPU analog of the reference's
    CUDA-event timing is `jax.profiler`). View the output with TensorBoard or
    xprof. Usage:

        with ProfilerTrace("traces/step100"):
            train_step(...)
    """

    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir

    def __enter__(self) -> "ProfilerTrace":
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc) -> None:
        import jax

        self._sync_all()
        jax.profiler.stop_trace()

    @staticmethod
    def _sync_all() -> None:
        import jax

        (jax.device_put(0.0) + 0).block_until_ready()
