"""Parameter sharding rules (FSDP / TP) for arbitrary param pytrees.

Replaces the reference's imperative `apply_fsdp2` / `apply_tensor_parallel`
(`parallel/ptd.py:466-499`, `models/ltx_video/base_specification.py:415-504`) with
declarative `NamedSharding` rules: GSPMD derives the all-gather / reduce-scatter
(FSDP) and head/ffn-dim collectives (TP) automatically.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import AXIS_DP_SHARD, AXIS_PP, AXIS_TP


# Matches params under a scan-over-layers stack ("<list>_scan.block[_j].<param>",
# see models/layers.block_stack) whose dim 0 is the stacked layer axis.
SCAN_STACK_RE = re.compile(r"_scan\.block(_\d+)?\.")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def infer_fsdp_spec(
    shape: Sequence[int],
    fsdp_size: int,
    taken_dims: Sequence[int] = (),
    min_weight_size: int = 2**14,
) -> Optional[int]:
    """Pick the dimension to shard for FSDP: the largest dim divisible by
    `fsdp_size`, skipping dims already taken by TP. Returns None to replicate
    (small params aren't worth the all-gather latency)."""
    if fsdp_size <= 1:
        return None
    size = 1
    for s in shape:
        size *= s
    if size < min_weight_size:
        return None
    candidates = [
        (s, i) for i, s in enumerate(shape) if i not in taken_dims and s % fsdp_size == 0
    ]
    if not candidates:
        return None
    # Largest dim wins; ties break toward the first dim (embedding-friendly).
    best = max(candidates, key=lambda t: (t[0], -t[1]))
    return best[1]


def make_param_shardings(
    params,
    mesh: Mesh,
    tp_rules: Optional[List[Tuple[str, PartitionSpec]]] = None,
    fsdp_axis: str = AXIS_DP_SHARD,
    min_weight_size: int = 2**14,
):
    """Build a pytree of NamedShardings matching `params`.

    tp_rules: list of (path_regex, PartitionSpec) applied first; any dim the TP
    spec leaves free may additionally be sharded on the FSDP axis.
    """
    tp_rules = tp_rules or []
    fsdp_size = mesh.shape.get(fsdp_axis, 1)

    def _rule(path, leaf):
        path_s = _path_str(path)
        shape = getattr(leaf, "shape", ())
        spec = [None] * len(shape)
        taken = []
        # scan-stacked params carry a leading layer axis. Under pipeline
        # parallelism it IS the pp shard axis (each stage holds a contiguous
        # layer slab — `parallel/pipeline.pipeline_blocks`); otherwise never
        # shard it (a sharded layer axis would force a collective per scan
        # iteration). TP specs (written for the unstacked shape) shift right.
        stacked = SCAN_STACK_RE.search(path_s) is not None
        offset = 1 if stacked else 0
        pp_size = mesh.shape.get(AXIS_PP, 1)
        if stacked:
            taken.append(0)
            if pp_size > 1 and shape and shape[0] % pp_size == 0:
                # pp-sharded stacks stay un-FSDP'd: inside the shard_map stage
                # program only the pp axis is mapped onto the layer dim, and an
                # extra dp_shard dim-sharding would just all-gather at entry.
                spec[0] = AXIS_PP
                return NamedSharding(mesh, PartitionSpec(*spec))
        for pattern, tp_spec in tp_rules:
            if re.search(pattern, path_s):
                for i, axis in enumerate(tuple(tp_spec)):
                    j = i + offset
                    if axis is not None and j < len(shape) and shape[j] % mesh.shape.get(AXIS_TP, 1) == 0:
                        spec[j] = axis
                        taken.append(j)
                break
        fsdp_dim = infer_fsdp_spec(shape, fsdp_size, taken_dims=taken, min_weight_size=min_weight_size)
        if fsdp_dim is not None:
            existing = spec[fsdp_dim]
            if existing is None:
                spec[fsdp_dim] = fsdp_axis
            elif isinstance(existing, str):
                spec[fsdp_dim] = (existing, fsdp_axis)
        return NamedSharding(mesh, PartitionSpec(*spec))

    return jax.tree_util.tree_map_with_path(_rule, params)


def shard_pytree(params, shardings):
    """Place a host pytree onto the mesh according to a sharding pytree."""
    return jax.tree_util.tree_map(lambda x, s: jax.device_put(x, s), params, shardings)


def derive_opt_state_shardings(opt_state_abstract, param_shardings, mesh: Mesh,
                               min_weight_size: int = 2**14):
    """Shardings for an optax state pytree: optimizer moments (mu/nu/acc_grads)
    mirror the param tree, so each state leaf whose path *suffix* matches a param
    path inherits that param's sharding; scalars are replicated; anything else
    falls back to the shape-driven FSDP rule."""
    flat_params: dict = {}

    def _collect(path, sharding):
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat_params[keys] = sharding

    jax.tree_util.tree_map_with_path(_collect, param_shardings)
    replicated = NamedSharding(mesh, PartitionSpec())
    fsdp_size = mesh.shape.get(AXIS_DP_SHARD, 1)

    def _rule(path, leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0:
            return replicated
        keys = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        # 8-bit moments (optim8bit._Quantized) nest the param path under a
        # trailing "codes" field with the param's exact shape; "scales" leaves
        # ((..., 1)-shaped) fall through to the shape-driven rule.
        if keys and keys[-1] == "codes":
            keys = keys[:-1]
        for i in range(len(keys)):
            suffix = keys[i:]
            sh = flat_params.get(suffix)
            if sh is not None:
                return sh
        dim = infer_fsdp_spec(shape, fsdp_size, min_weight_size=min_weight_size)
        spec = [None] * len(shape)
        if dim is not None:
            spec[dim] = AXIS_DP_SHARD
        return NamedSharding(mesh, PartitionSpec(*spec))

    return jax.tree_util.tree_map_with_path(_rule, opt_state_abstract)
