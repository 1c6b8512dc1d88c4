"""int8 frozen-weight storage: the 2x-MXU-rate sibling of fp8 layerwise storage.

`apply_int8_storage` rewrites a FROZEN param tree in place of
`fp8.apply_layerwise_storage_dtype`: every eligible 2D Dense kernel becomes an
int8 tensor plus a `kernel_qscale` sibling (f32 per-output-channel symmetric
scales). `models.layers.LoRADense` detects the int8 dtype at trace time and
routes through `ops.int8_linear` (dynamic per-row activation quantization,
int8 MXU matmuls in forward AND input-gradient). Skip patterns match the fp8
path (embeddings, norms, in/out projections stay high precision — the
reference's layerwise_upcasting_skip_modules_pattern, args.py).

Memory: int8 weights are the same size as fp8 but the compute runs the int8
MXU path (measured 214 vs 139 TFLOP/s at the CogView4 ff1 shape,
tools/int8_bench.py / docs/perf.md round 5). Quality: ~1% relative error per
matmul on the frozen base — the same order as fp8-e4m3 storage; the LoRA
branch and all trainable math stay full precision. Opt-in.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax.numpy as jnp

from .fp8 import DEFAULT_SKIP_PATTERNS


QSCALE_SUFFIX = "_qscale"


def apply_int8_storage(
    params,
    skip_patterns: Sequence[str] = tuple(DEFAULT_SKIP_PATTERNS),
):
    """Quantize eligible 2D `kernel` leaves to int8 + `kernel_qscale` siblings.

    Returns a NEW tree (dicts rebuilt; unquantized leaves shared)."""
    from ..ops.int8_linear import quantize_weight

    def _walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            child_path = path + [name]
            if isinstance(child, dict):
                out[name] = _walk(child, child_path)
                continue
            path_s = ".".join(str(p) for p in child_path)
            skip = any(
                re.search(p, part) for p in skip_patterns for part in path_s.split(".")
            )
            if (
                not skip
                and name == "kernel"
                # 2D Dense kernels and 3D scan-stacked (L, in, F) block kernels
                # (use_scan=True layers; flax's nn.scan slices the qscale
                # sidecar along axis 0 together with the kernel).
                and getattr(child, "ndim", 0) in (2, 3)
                and child.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
            ):
                if child.ndim == 3:
                    import jax

                    wq, sw = jax.vmap(quantize_weight)(child)
                else:
                    wq, sw = quantize_weight(child)
                out[name] = wq
                out[name + QSCALE_SUFFIX] = sw
            else:
                out[name] = child
        return out

    return _walk(params, [])


def materialize_zeros_like(shapes, template):
    """Full-size zeros in the template's (post-transform) dtypes.

    For bench tools that must materialize a quantized frozen tree WITHOUT
    first building the bf16 original (quantizing 10+ GB live OOMs a 16 GB
    chip on the f32 absmax temporaries): run `apply_int8_storage` over a
    (1,)*ndim dummy-template first, then call this with the real
    ShapeDtypeStruct tree (None placeholders allowed). qscale sidecar shapes
    derive from the base kernel shape ((L, F) for scan-stacked 3D kernels,
    (F,) for 2D)."""
    import jax.numpy as jnp

    def _mat(sn, tn):
        if not isinstance(tn, dict):
            if tn is None or sn is None:
                return None
            return jnp.zeros(sn.shape, tn.dtype)
        out = {}
        for name, t in tn.items():
            if name.endswith(QSCALE_SUFFIX):
                base = sn[name[: -len(QSCALE_SUFFIX)]].shape
                qs = (base[0], base[2]) if len(base) == 3 else (base[1],)
                out[name] = jnp.full(qs, 1e-8, jnp.float32)
            else:
                out[name] = _mat(sn.get(name) if isinstance(sn, dict) else None, t)
        return out

    return _mat(shapes, template)


def count_int8_bytes(params) -> int:
    import jax

    return sum(
        x.size for x in jax.tree_util.tree_leaves(params)
        if x.dtype == jnp.int8
    )
