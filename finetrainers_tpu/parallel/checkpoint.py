"""Distributed checkpointing via Orbax.

Parity with the reference's `PTDCheckpointer` (reference `parallel/ptd.py:282-429`):
step-indexed directories with the `finetrainers_step_` prefix, `checkpointing_limit`
purge, resume restores model params / optimizer state / TrainState counters /
**dataloader position**, and a post-save callback for exporting inference-ready
weights (LoRA safetensors / merged model).

Orbax replaces torch DCP: sharded array saves are written directly from each
device's shards (no rank-0 CPU gather needed for the resume path; the export
callback materializes full arrays only for the small LoRA state)."""

from __future__ import annotations

import pathlib
from typing import Any, Callable, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..logging import get_logger


logger = get_logger(__name__)

CHECKPOINT_PREFIX = "finetrainers_step_"


class OrbaxCheckpointer:
    def __init__(
        self,
        output_dir: str,
        checkpointing_steps: int = 500,
        checkpointing_limit: Optional[int] = None,
        callback_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
        enable: bool = True,
    ) -> None:
        self.output_dir = pathlib.Path(output_dir).absolute()
        self.checkpointing_steps = checkpointing_steps
        self.checkpointing_limit = checkpointing_limit
        self._callback_fn = callback_fn
        self._enable = enable
        options = ocp.CheckpointManagerOptions(
            max_to_keep=checkpointing_limit,
            step_prefix=CHECKPOINT_PREFIX.rstrip("_"),
            create=True,
            enable_async_checkpointing=True,
        )
        self.manager = ocp.CheckpointManager(self.output_dir, options=options)

    def save(
        self,
        step: int,
        state: Dict[str, Any],
        metadata: Optional[Dict[str, Any]] = None,
        force: bool = False,
        run_callback: bool = True,
    ) -> bool:
        """state: {"params": pytree, "opt_state": pytree, ...}; metadata: JSON-able
        dict (train_state counters, dataloader position)."""
        if not self._enable:
            return False
        if not force and (self.checkpointing_steps <= 0 or step % self.checkpointing_steps != 0):
            return False
        composite = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            composite["metadata"] = ocp.args.JsonSave(metadata)
        self.manager.save(step, args=ocp.args.Composite(**composite), force=True)
        if run_callback and self._callback_fn is not None:
            self._callback_fn(state)
        logger.info(f"Saved checkpoint at step {step} to {self.output_dir}")
        return True

    def load(self, step: int = -1, abstract_state: Optional[Dict[str, Any]] = None):
        """Returns (step, state, metadata) or None if no checkpoint exists.
        step=-1 loads the latest (reference `resume_from_checkpoint latest`)."""
        if step == -1:
            step = self.latest_step() or -1
        if step < 0 or step not in (self.manager.all_steps() or []):
            return None
        composite = {}
        if abstract_state is not None:
            composite["state"] = ocp.args.StandardRestore(abstract_state)
        else:
            composite["state"] = ocp.args.StandardRestore()
        composite["metadata"] = ocp.args.JsonRestore()
        try:
            restored = self.manager.restore(step, args=ocp.args.Composite(**composite))
            metadata = restored.get("metadata") or {}
        except (FileNotFoundError, KeyError):
            restored = self.manager.restore(
                step, args=ocp.args.Composite(state=composite["state"])
            )
            metadata = {}
        logger.info(f"Restored checkpoint from step {step}")
        return step, restored["state"], metadata

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait_until_finished(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.wait_until_finished()
        self.manager.close()
