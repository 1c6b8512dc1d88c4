"""FP8 layerwise weight storage.

Parity with the reference's layerwise-upcasting (fp8 param storage with high-
precision compute, reference `trainer/sft_trainer/trainer.py:96-136` + diffusers
layerwise-casting hooks; SURVEY.md §2.9.4). On TPU this is purely a storage-dtype
decision: frozen params are stored as float8_e4m3fn/e5m2 in HBM (halving weight
memory vs bf16) and upcast to the compute dtype at use — XLA fuses the upcast
into the consuming matmul, so there is no separate "hook" machinery.
"""

from __future__ import annotations

import re
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp


DEFAULT_SKIP_PATTERNS = [
    "patch_embed", "pos_embed", "x_embedder", "context_embedder", "time_embed",
    r"^proj_in$", r"^proj_out$", "norm",
    # Bare (non-module) parameters: diffusers' layerwise-casting hooks
    # Linear/Conv modules, so nn.Parameter tables like the LTX/Wan per-block
    # scale_shift_table are never cast there — and they are consumed by raw
    # fp32 adds here (wan/transformer.py:111), where fp8 has no promotion path.
    "scale_shift_table",
]


def _path_str(path) -> str:
    return ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def apply_layerwise_storage_dtype(
    params,
    storage_dtype: Any = jnp.float8_e4m3fn,
    skip_patterns: Sequence[str] = tuple(DEFAULT_SKIP_PATTERNS),
):
    """Cast eligible 2D+ weight leaves to the fp8 storage dtype. Norm scales,
    embeddings and the in/out projections stay high-precision (the reference's
    skip-module patterns, args.py layerwise_upcasting_skip_modules_pattern)."""

    def _cast(path, leaf):
        path_s = _path_str(path)
        if any(re.search(p, part) for p in skip_patterns for part in path_s.split(".")):
            return leaf
        if getattr(leaf, "ndim", 0) < 2:
            return leaf  # biases / scales stay high precision
        return leaf.astype(storage_dtype)

    return jax.tree_util.tree_map_with_path(_cast, params)


def count_fp8_bytes(params) -> int:
    return sum(
        x.size for x in jax.tree_util.tree_leaves(params)
        if x.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)
    )
