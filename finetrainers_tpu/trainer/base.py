"""Trainer base: distributed init, determinism, attention-provider contexts.

Parity with reference `finetrainers/trainer/base.py:22-188`. The reference installs
per-module forward hooks to lazily switch attention providers mid-forward
(`LatestActiveModuleHook`); here providers are explicit arguments flowing through
`attention_provider_ctx`, because we own every forward.
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Tuple

import jax

from ..args import BaseArgs
from ..logging import get_logger
from ..ops.attention import _AttentionProviderRegistry, attention_provider
from ..parallel import MeshEnv, ParallelDims
from ..state import State


logger = get_logger(__name__)


class Trainer:
    def __init__(self, args: BaseArgs, model_specification) -> None:
        self.args = args
        self.model_specification = model_specification
        self.state = State()

        self.attn_provider_training = self._parse_attention_providers(
            getattr(args, "attn_provider_training", [])
        )
        self.attn_provider_inference = self._parse_attention_providers(
            getattr(args, "attn_provider_inference", [])
        )

        self._init_distributed()
        self._init_determinism()
        self._init_config_options()

    # ------------------------------------------------------------------ setup
    def _init_distributed(self) -> None:
        import os

        # Multi-host: single-controller JAX discovers peers via the coordinator
        # (the analog of the reference's torchrun + init_process_group("nccl"),
        # parallel/ptd.py:80). Single-host runs skip this entirely.
        if os.environ.get("COORDINATOR_ADDRESS") and jax.process_count() == 1:
            try:
                jax.distributed.initialize()
                logger.info(
                    f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}"
                )
            except Exception as e:
                logger.warning(f"jax.distributed.initialize failed: {e}")
        dims = ParallelDims.from_args(self.args)
        n = jax.device_count()
        if dims.world_size == 1 and n > 1:
            # Single-degree args on a multi-chip host: default to FSDP over all
            # devices (the reference requires torchrun world sizing; JAX sees all
            # local chips automatically).
            dims = ParallelDims(dp_shard=n)
        self.mesh_env = MeshEnv(dims)
        logger.info(
            f"Initialized mesh: {dict(self.mesh_env.mesh.shape)} over {self.mesh_env.world_size} device(s)"
        )
        if self.mesh_env.pipeline_parallel_enabled:
            # Route every model's scanned block stack through the GPipe
            # primitive (models/layers.block_stack reads this at trace time).
            from ..parallel.pipeline import PipelineContext, set_pipeline_context
            from ..parallel.mesh import BATCH_AXES

            set_pipeline_context(
                PipelineContext(
                    mesh=self.mesh_env.mesh,
                    axis="pp",
                    n_microbatches=getattr(self.args, "pp_microbatches", 0),
                    batch_shard_axes=BATCH_AXES,
                )
            )
            logger.info(
                f"Pipeline parallelism enabled: {dims.pp} stages, "
                f"microbatches={getattr(self.args, 'pp_microbatches', 0) or 'auto'}"
            )

    def _init_determinism(self) -> None:
        seed = self.args.seed if self.args.seed is not None else 0
        self.rng = jax.random.PRNGKey(seed)

    def _init_config_options(self) -> None:
        """Matmul precision knobs (reference trainer/base.py:127-131 sets TF32/
        matmul precision; the TPU analog is the default matmul precision)."""
        mapping = {"highest": "float32", "high": "bfloat16_3x", "medium": "bfloat16"}
        precision = mapping.get(getattr(self.args, "float32_matmul_precision", "highest"))
        if getattr(self.args, "allow_tf32", False) and precision == "float32":
            precision = "bfloat16_3x"  # TF32-ish: 3-pass bf16 accumulation
        if precision and precision != "float32":
            jax.config.update("jax_default_matmul_precision", precision)

    @staticmethod
    def _parse_attention_providers(mapping: Optional[List[str]]) -> Dict[str, str]:
        """["transformer:flash", "vae:native"] -> {"transformer": "flash"}
        (reference trainer/base.py:148-159)."""
        out: Dict[str, str] = {}
        for entry in mapping or []:
            if ":" in entry:
                module, provider = entry.rsplit(":", 1)
            else:
                module, provider = "transformer", entry
            out[module] = provider
        return out

    @contextlib.contextmanager
    def attention_provider_ctx(self, training: bool = True, module: str = "transformer"):
        """Activate the configured provider for a module scope, and the CP mesh
        axis when context parallelism is on (reference trainer/base.py:37-90)."""
        mapping = self.attn_provider_training if training else self.attn_provider_inference
        provider = mapping.get(module)
        registry = _AttentionProviderRegistry
        if self.mesh_env.context_parallel_enabled and module == "transformer":
            registry._set_context_parallel(mesh=self.mesh_env.mesh, axis="cp")
        try:
            if provider is not None:
                with attention_provider(provider):
                    yield
            else:
                yield
        finally:
            registry._set_context_parallel(None, None)
