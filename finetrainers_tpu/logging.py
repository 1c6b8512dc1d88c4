"""Process-aware logging.

Capability parity with the reference's rank-aware logger adapter
(reference `finetrainers/logging.py:15-139`): `main_process_only`,
`local_main_process_only`, `in_order`, and frequency-limited messages.

On TPU/JAX the process identity comes from `jax.process_index()` instead of
torch.distributed ranks.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

from .constants import FINETRAINERS_LOG_LEVEL


_FORMAT = "%(asctime)s [%(levelname)s] p%(process)d %(name)s: %(message)s"


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


class _LoggerAdapter(logging.LoggerAdapter):
    """Adds process-awareness and per-name frequency limiting on top of stdlib logging."""

    def __init__(self, logger: logging.Logger) -> None:
        super().__init__(logger, {})
        self._log_freq: Dict[str, int] = {}
        self._log_freq_counter: Dict[str, int] = {}

    def log(
        self,
        level: int,
        msg,
        *args,
        main_process_only: bool = False,
        local_main_process_only: bool = True,
        in_order: bool = False,
        frequency: Optional[int] = None,
        frequency_key: Optional[str] = None,
        **kwargs,
    ) -> None:
        if not self.isEnabledFor(level):
            return

        if frequency is not None:
            key = frequency_key or str(msg)
            count = self._log_freq_counter.get(key, 0)
            self._log_freq_counter[key] = count + 1
            if count % max(frequency, 1) != 0:
                return

        index = _process_index()
        if main_process_only or local_main_process_only:
            # Single-controller JAX: process 0 is both main and local-main on host 0.
            if index == 0:
                self.logger.log(level, msg, *args, **kwargs)
            return
        if in_order:
            # Without a torch-style barrier per rank we simply tag the process index.
            self.logger.log(level, f"[process {index}] {msg}", *args, **kwargs)
            return
        self.logger.log(level, msg, *args, **kwargs)

    def debug(self, msg, *args, **kwargs):
        self.log(logging.DEBUG, msg, *args, **kwargs)

    def info(self, msg, *args, **kwargs):
        self.log(logging.INFO, msg, *args, **kwargs)

    def warning(self, msg, *args, **kwargs):
        self.log(logging.WARNING, msg, *args, **kwargs)

    def error(self, msg, *args, **kwargs):
        self.log(logging.ERROR, msg, *args, **kwargs)


def get_logger(name: str = "finetrainers_tpu") -> _LoggerAdapter:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("FINETRAINERS_LOG_LEVEL", FINETRAINERS_LOG_LEVEL))
        logger.propagate = False
    return _LoggerAdapter(logger)


def set_dependency_log_level(verbose: int = 0) -> None:
    """Map `--verbose` 0-3 onto dependency loggers (reference logging.py:set_dependency_log_level)."""
    level = {0: logging.ERROR, 1: logging.WARNING, 2: logging.INFO, 3: logging.DEBUG}.get(verbose, logging.ERROR)
    for dep in ("jax", "flax", "orbax", "transformers", "datasets"):
        logging.getLogger(dep).setLevel(level)


logger = get_logger()
