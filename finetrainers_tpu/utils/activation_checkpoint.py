"""Activation checkpointing (rematerialization) policies.

Parity with reference `utils/activation_checkpoint.py:20-71` (types full / ops /
block_skip). On TPU these map to `jax.checkpoint` policies instead of module
wrappers:

  - "full":       save nothing — recompute everything in backward
                  (reference: checkpoint_wrapper on every block).
  - "ops":        save matmul/attention outputs, recompute cheap elementwise ops
                  (reference's selective op-save policy: mm every 2nd, SDPA).
  - "block_skip": checkpoint only every Nth block (callers wrap alternate blocks;
                  `should_checkpoint_block` gives the skip pattern).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax


CHECKPOINT_TYPES = ("full", "ops", "ops_attn", "ops_narrow", "block_skip")


def _dot_out_minor_dim(prim, args, params) -> Optional[int]:
    """Minor output dim of a dot_general eqn, or None if not a no-batch dot."""
    if str(prim) != "dot_general":
        return None
    (c_lhs, c_rhs), (b_lhs, b_rhs) = params["dimension_numbers"]
    if b_lhs or b_rhs:
        return None
    rhs = args[1]
    free = [d for i, d in enumerate(rhs.shape) if i not in c_rhs]
    return free[-1] if free else 1


def get_checkpoint_policy(checkpoint_type: str = "full") -> Optional[Callable]:
    """jax.checkpoint `policy` for a reference checkpointing type."""
    if checkpoint_type == "full":
        return jax.checkpoint_policies.nothing_saveable
    if checkpoint_type == "ops":
        # Save the FLOPs-heavy results — projection/MLP matmuls (dots without
        # batch dims) AND attention outputs (tagged "attn_out" by
        # ops.attention_dispatch; an attention forward is a fused kernel whose
        # recompute costs far more than the 11MB/layer it saves) — recompute
        # cheap elementwise/norm ops. The analog of the reference's
        # "save mm every 2nd + SDPA" selective policy.
        # "norm_stat": f32 per-row norm statistics (rstd/mean) — ~10KB each;
        # saving them removes the full-width reduction re-runs from backward.
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            jax.checkpoint_policies.save_only_these_names("attn_out", "norm_stat"),
        )
    if checkpoint_type == "ops_attn":
        # Save ONLY the attention kernel residuals (+ tiny norm stats) and
        # recompute every projection/MLP matmul: the long-sequence middle
        # ground between "full" (replays the flash forward inside the remat
        # backward — the single most expensive recompute at S >= 16k, where
        # attention dominates step FLOPs) and "ops" (whose saved ff1/qkv
        # stacks cost ~300-400 MB/block at Wan scale and OOM). Memory: block
        # input stack + ~65 MB/block of attention outputs at Wan-1.3B scale.
        return jax.checkpoint_policies.save_only_these_names("attn_out", "norm_stat")
    if checkpoint_type == "ops_narrow":
        # Like "ops" but WIDE dot outputs (minor dim > 4096 — the MLP hidden)
        # are recomputed in the backward instead of saved: trades one extra
        # ff1 matmul per block for ~44MB/block of activation-stack traffic.
        names = jax.checkpoint_policies.save_only_these_names("attn_out", "norm_stat")

        def policy(prim, *args, **params):
            minor = _dot_out_minor_dim(prim, args, params)
            if minor is not None:
                return minor <= 4096
            return names(prim, *args, **params)

        return policy
    if checkpoint_type == "block_skip":
        return jax.checkpoint_policies.nothing_saveable
    raise ValueError(f"Unknown checkpoint type {checkpoint_type!r}; choose from {CHECKPOINT_TYPES}")


def should_checkpoint_block(block_index: int, checkpoint_type: str = "full", skip_every: int = 2) -> bool:
    """block_skip: remat alternate blocks only (reference block_skip semantics)."""
    if checkpoint_type == "block_skip":
        return block_index % skip_every == 0
    return True


def apply_activation_checkpointing(forward_fn: Callable, checkpoint_type: str = "full") -> Callable:
    """Wrap a forward function with the requested remat policy."""
    policy = get_checkpoint_policy(checkpoint_type)
    return jax.checkpoint(forward_fn, policy=policy)
