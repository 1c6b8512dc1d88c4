"""Shared flax building blocks for the DiT model zoo.

TPU-first notes:
  - All matmul-bearing layers keep a bf16 compute path with fp32 norm statistics
    (matches the reference's fp32-safe RMSNorm patch, reference
    `patches/dependencies/diffusers/rms_norm.py:7`).
  - LoRA lives directly in the param pytree as `lora_a`/`lora_b` leaves of
    `LoRADense` (reference injects peft adapters; here trainability is a path
    predicate over the pytree — see trainer._prepare_trainable_parameters).
  - Attention goes through `ops.attention_dispatch` explicitly (the reference
    monkey-patches torch SDPA; we own the forward).
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops import attention_dispatch


def is_lora_param(path: Tuple) -> bool:
    """Path predicate selecting LoRA leaves in a param pytree."""
    keys = [getattr(p, "key", getattr(p, "idx", str(p))) for p in path]
    return any(str(k) in ("lora_a", "lora_b") for k in keys)


class LoRADense(nn.Module):
    """Dense layer with optional fused LoRA path: y = xW + b + (alpha/r)·(xA)B.

    rank=0 disables LoRA (pure Dense). The LoRA branch computes (xA)B separately
    (never materializes W + BA), keeping the base matmul on the MXU at full size
    and the LoRA matmuls skinny.
    """

    features: int
    use_bias: bool = True
    rank: int = 0
    alpha: float = 1.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_features, self.features), self.param_dtype)
        if kernel.dtype == jnp.int8:
            # Frozen weight quantized by utils.int8.apply_int8_storage: the
            # per-output-channel scales ride a `kernel_qscale` sibling leaf
            # (extra params entries are ignored by flax's scope lookup, so the
            # sidecar is invisible to every non-quantized path), and both the
            # forward and dx matmuls run the 2x-rate int8 MXU path.
            from ..ops.int8_linear import int8_linear

            sw = self.get_variable("params", "kernel_qscale")
            y = int8_linear(x.astype(self.dtype), kernel, sw)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        if self.rank > 0:
            lora_a = self.param(
                "lora_a", nn.initializers.normal(1.0 / max(self.rank, 1)), (in_features, self.rank), self.param_dtype
            )
            lora_b = self.param("lora_b", nn.initializers.zeros_init(), (self.rank, self.features), self.param_dtype)
            scaling = self.alpha / self.rank
            # LoRA params stored fp32 (optimizer-state precision, like the
            # reference's fp32 LoRA under FSDP, trainer/sft_trainer/trainer.py:130-136)
            # but the matmuls run in the module compute dtype: fp32 MXU passes are
            # several times slower than bf16 and peft's adapters also run in the
            # wrapped module's dtype.
            delta = jnp.dot(jnp.dot(x.astype(self.dtype), lora_a.astype(self.dtype)), lora_b.astype(self.dtype))
            y = y + (scaling * delta).astype(y.dtype)
        return y


class LoRAProjParams(nn.Module):
    """Declares the SAME param tree as `LoRADense` (kernel/bias/lora_a/lora_b —
    identical names, shapes, dtypes, initializers) but returns the raw params
    instead of computing, so a parent can fuse several projections into one
    matmul (e.g. q/k/v) while keeping checkpoint compatibility."""

    in_features: int
    features: int
    use_bias: bool = True
    rank: int = 0
    alpha: float = 1.0
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, (self.in_features, self.features), self.param_dtype)
        if kernel.dtype == jnp.int8:
            # Fused consumers concatenate raw kernels into one matmul; an int8
            # leaf there would be read as raw quantized integers. Dequantize
            # with the sidecar scale — under int8 storage the fused path gets
            # the fp8-style memory benefit, not the int8-MXU compute path.
            sw = self.get_variable("params", "kernel_qscale")
            kernel = kernel.astype(jnp.float32) * sw[None, :]
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
        lora_a = lora_b = None
        if self.rank > 0:
            lora_a = self.param(
                "lora_a", nn.initializers.normal(1.0 / max(self.rank, 1)), (self.in_features, self.rank), self.param_dtype
            )
            lora_b = self.param("lora_b", nn.initializers.zeros_init(), (self.rank, self.features), self.param_dtype)
        return kernel, bias, lora_a, lora_b


class RMSNorm(nn.Module):
    """RMSNorm with fp32 statistics; optional learnable scale."""

    eps: float = 1e-6
    elementwise_affine: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        # Tagged so the "ops" remat policy can save the tiny f32 stat and skip
        # re-running the full-width reduction in the backward (the multiply
        # that follows is cheap and fuses into consumers).
        rstd = checkpoint_name(jax.lax.rsqrt(var + self.eps), "norm_stat")
        y = x32 * rstd
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32)
            y = y * scale
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, optionally without affine params (DiT
    blocks use affine-free LN followed by adaLN modulation)."""

    eps: float = 1e-6
    elementwise_affine: bool = False
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = checkpoint_name(jnp.mean(x32, axis=-1, keepdims=True), "norm_stat")
        var = jnp.var(x32, axis=-1, keepdims=True)
        rstd = checkpoint_name(jax.lax.rsqrt(var + self.eps), "norm_stat")
        y = (x32 - mean) * rstd
        if self.elementwise_affine:
            scale = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],), jnp.float32)
            y = y * scale
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros_init(), (x.shape[-1],), jnp.float32)
                y = y + bias
        return y.astype(self.dtype)


def sinusoidal_timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0, scale: float = 1.0,
) -> jax.Array:
    """Standard DDPM sinusoidal embedding; fp32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Sinusoidal embedding -> 2-layer MLP."""

    embedding_dim: int
    freq_dim: int = 256
    dtype: Any = jnp.bfloat16
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = sinusoidal_timestep_embedding(
            timesteps, self.freq_dim, flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )
        emb = LoRADense(self.embedding_dim, dtype=self.dtype, name="linear_1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = LoRADense(self.embedding_dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


def apply_rotary_emb(x: jax.Array, freqs_cos: jax.Array, freqs_sin: jax.Array, interleaved: bool = True) -> jax.Array:
    """Apply RoPE to (B, S, N, H) tensors. freqs: (S, H/2) or broadcastable.

    interleaved=True pairs (x0,x1),(x2,x3)… (diffusers' rotate-interleaved
    convention used by most DiTs); False pairs first/second halves.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    fc = freqs_cos[None, :, None, :] if freqs_cos.ndim == 2 else freqs_cos
    fs = freqs_sin[None, :, None, :] if freqs_sin.ndim == 2 else freqs_sin
    if interleaved:
        x1 = x32[..., 0::2]
        x2 = x32[..., 1::2]
        out1 = x1 * fc - x2 * fs
        out2 = x2 * fc + x1 * fs
        out = jnp.stack([out1, out2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1, x2 = x32[..., :half], x32[..., half:]
        out = jnp.concatenate([x1 * fc - x2 * fs, x2 * fc + x1 * fs], axis=-1)
    return out.astype(orig_dtype)


class Attention(nn.Module):
    """Multi-head attention (self or cross) with optional QK-norm, RoPE, LoRA.

    Layout: (B, S, D) in, heads split to BTNH for `attention_dispatch`.
    """

    num_heads: int
    head_dim: int
    out_features: Optional[int] = None
    qk_norm: Optional[str] = None  # None | "rms_norm" | "layer_norm"
    use_bias: bool = True
    out_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_targets: Sequence[str] = ("to_q", "to_k", "to_v", "to_out")
    dtype: Any = jnp.bfloat16
    cross_attention_dim: Optional[int] = None
    eps: float = 1e-6

    def _rank(self, name: str) -> int:
        return self.lora_rank if any(t in name for t in self.lora_targets) else 0

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        freqs: Optional[Tuple[jax.Array, jax.Array]] = None,
        kv_lens: Optional[jax.Array] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.num_heads * self.head_dim
        out_features = self.out_features or hidden_states.shape[-1]
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        q = LoRADense(inner, use_bias=self.use_bias, rank=self._rank("to_q"), alpha=self.lora_alpha,
                      dtype=self.dtype, name="to_q")(hidden_states)
        k = LoRADense(inner, use_bias=self.use_bias, rank=self._rank("to_k"), alpha=self.lora_alpha,
                      dtype=self.dtype, name="to_k")(ctx)
        v = LoRADense(inner, use_bias=self.use_bias, rank=self._rank("to_v"), alpha=self.lora_alpha,
                      dtype=self.dtype, name="to_v")(ctx)

        b, sq = q.shape[0], q.shape[1]
        skv = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, skv, self.num_heads, self.head_dim)
        v = v.reshape(b, skv, self.num_heads, self.head_dim)

        if self.qk_norm == "rms_norm":
            q = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_q")(q)
            k = RMSNorm(eps=self.eps, dtype=self.dtype, name="norm_k")(k)
        elif self.qk_norm == "layer_norm":
            q = LayerNorm(eps=self.eps, elementwise_affine=True, dtype=self.dtype, name="norm_q")(q)
            k = LayerNorm(eps=self.eps, elementwise_affine=True, dtype=self.dtype, name="norm_k")(k)

        if freqs is not None:
            q = apply_rotary_emb(q, *freqs)
            k = apply_rotary_emb(k, *freqs)

        out = attention_dispatch(q, k, v, kv_lens=kv_lens, attn_mask=attn_mask)
        out = out.reshape(b, sq, inner)
        out = LoRADense(out_features, use_bias=self.out_bias, rank=self._rank("to_out"),
                        alpha=self.lora_alpha, dtype=self.dtype, name="to_out")(out)
        return out


class FeedForward(nn.Module):
    """MLP with gelu / geglu / silu activation."""

    inner_dim: int
    out_dim: Optional[int] = None
    activation: str = "gelu-approximate"
    use_bias: bool = True
    lora_rank: int = 0
    lora_alpha: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_dim = self.out_dim or x.shape[-1]
        if self.activation == "geglu":
            h = LoRADense(self.inner_dim * 2, use_bias=self.use_bias, rank=self.lora_rank,
                          alpha=self.lora_alpha, dtype=self.dtype, name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate)
        else:
            h = LoRADense(self.inner_dim, use_bias=self.use_bias, rank=self.lora_rank,
                          alpha=self.lora_alpha, dtype=self.dtype, name="proj_in")(x)
            if self.activation in ("gelu", "gelu-approximate"):
                h = nn.gelu(h, approximate=self.activation == "gelu-approximate")
            elif self.activation == "silu":
                h = nn.silu(h)
            else:
                raise ValueError(f"Unknown activation {self.activation}")
        h = LoRADense(out_dim, use_bias=self.use_bias, rank=self.lora_rank,
                      alpha=self.lora_alpha, dtype=self.dtype, name="proj_out")(h)
        return h


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """adaLN modulation; shift/scale (B, D) broadcast over sequence."""
    return x * (1.0 + scale[:, None]) + shift[:, None]


# --------------------------------------------------------------- scan-over-blocks

SCAN_DEPTH_THRESHOLD = 8  # default-on for deep stacks (VERDICT r1 item 3)
SCAN_SUFFIX = "_scan"  # param path marker: "<list_name>_scan.block[_j].<param>"


def resolve_use_scan(use_scan: Optional[bool], num_layers: int) -> bool:
    """None = auto: scan when the stack is deep enough that per-block HLO
    duplication dominates compile time."""
    if use_scan is None:
        return num_layers > SCAN_DEPTH_THRESHOLD
    return bool(use_scan)


def scan_group_size(checkpoint: Optional[str]) -> int:
    """block_skip scans PAIRS of blocks with the pair body rematted: the scan
    carry is saved only at every 2nd block boundary — exactly the reference's
    skip-alternate-blocks checkpointing (`utils/activation_checkpoint.py:20-71`)."""
    return 2 if checkpoint == "block_skip" else 1


def block_stack(
    block_cls,
    block_kwargs: dict,
    length: int,
    carry,
    broadcast_args: Tuple = (),
    use_scan: Optional[bool] = None,
    checkpoint: Optional[str] = None,
    list_name: str = "transformer_blocks",
    parent=None,
    broadcast_kinds: Optional[Tuple[str, ...]] = None,
):
    """Run `length` identical blocks over `carry`, either as a Python loop
    (per-block params "<list_name>_<i>") or via nn.scan with stacked params
    ("<list_name>_scan.block[_j]" with a leading layer axis).

    `parent` (the calling flax module) enables the pipeline-parallel path:
    when `parallel.pipeline.get_pipeline_context()` is set (trainer started
    with --pp_degree > 1), the scanned stack is applied through the GPipe
    primitive (`parallel.pipeline_blocks`) over the "pp" mesh axis instead of
    a sequential scan — the stacked params (read from `parent`'s bound scope,
    identical checkpoint layout) are layer-sharded over pp and microbatched
    activations hop stages via ppermute. Falls back to the sequential scan
    (with a one-time warning) when depth/batch aren't divisible.

    The TPU analog of the reference's regional compile + block-wise
    checkpoint_wrapper (`utils/torch.py:44-65`, `utils/activation_checkpoint.py`):
    scan gives O(1)-in-depth HLO (one compiled block body), remat bounds
    activation memory per block instead of per whole-forward.

    carry may be a single array or a tuple (dual-stream blocks); the block must
    accept (*carry, *broadcast_args) positionally and return the same carry
    structure. checkpoint: None | "full" | "ops" | "block_skip".

    broadcast_kinds explicitly tags each broadcast arg for the pipeline path:
    "batched" = per-sample conditioning with a leading batch dim (sliced into
    microbatches alongside the carry); "static" = replicated to every stage
    verbatim (RoPE tables, python scalars, None). Required whenever a
    PipelineContext is active — per-sample vs static is NOT inferable from
    shapes (a static (S, D) table with S == B would be silently mis-sliced).
    """
    from ..utils.activation_checkpoint import get_checkpoint_policy

    tuple_carry = isinstance(carry, tuple)

    def _apply(blk, c):
        out = blk(*(c if tuple_carry else (c,)), *broadcast_args)
        return out

    group = scan_group_size(checkpoint)
    if not resolve_use_scan(use_scan, length) or length < group:
        if parent is not None and not parent.is_initializing():
            from ..parallel.pipeline import get_pipeline_context

            if get_pipeline_context() is not None:
                _pp_fallback_warn(
                    list_name,
                    f"stack of {length} blocks takes the non-scan path (use_scan="
                    f"{use_scan}, auto threshold {SCAN_DEPTH_THRESHOLD}) — pipeline "
                    f"parallelism is INACTIVE for this stack; every pp rank runs the "
                    f"full depth redundantly. Set use_scan=True to pipeline it.",
                )
        for i in range(length):
            cls = block_cls
            if checkpoint is not None and (checkpoint != "block_skip" or i % 2 == 0):
                policy = get_checkpoint_policy("full" if checkpoint == "block_skip" else checkpoint)
                cls = nn.remat(block_cls, policy=policy, prevent_cse=False)
            carry = _apply(cls(**block_kwargs, name=f"{list_name}_{i}"), carry)
        return carry

    n_scan = length // group
    rem = length - n_scan * group

    class _Body(nn.Module):
        @nn.compact
        def __call__(self, c, *bc):
            for j in range(group):
                name = "block" if group == 1 else f"block_{j}"
                blk = block_cls(**block_kwargs, name=name)
                c = blk(*(c if tuple_carry else (c,)), *bc)
            return c, None

    if parent is not None and not parent.is_initializing():
        from ..parallel.pipeline import get_pipeline_context

        pp_ctx = get_pipeline_context()
        if pp_ctx is not None:
            done, out = _pipeline_apply_stack(
                parent, _Body, pp_ctx, list_name, carry, broadcast_args, checkpoint, n_scan,
                broadcast_kinds,
            )
            if done:
                for i in range(length - rem, length):
                    out = _apply(block_cls(**block_kwargs, name=f"{list_name}_{i}"), out)
                return out

    body = _Body
    if checkpoint is not None:
        policy = get_checkpoint_policy("full" if checkpoint == "block_skip" else checkpoint)
        body = nn.remat(_Body, policy=policy, prevent_cse=False)
    # Loop unrolling trades executable size for cross-iteration overlap of the
    # scan's activation-stack DMA with the next block's compute (the profiled
    # ~25 ms/step stall tail lives at iteration boundaries). Default 1; bench
    # experiments via env.
    unroll = int(os.environ.get("FINETRAINERS_SCAN_UNROLL", "1"))
    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=n_scan,
        in_axes=nn.broadcast,
        unroll=max(1, unroll),
    )(name=f"{list_name}{SCAN_SUFFIX}")
    carry, _ = scanned(carry, *broadcast_args)
    # Trailing remainder blocks (odd depth under block_skip) stay per-block.
    for i in range(length - rem, length):
        carry = _apply(block_cls(**block_kwargs, name=f"{list_name}_{i}"), carry)
    return carry


_PP_FALLBACK_WARNED: set = set()


def _pp_fallback_warn(list_name: str, reason: str) -> None:
    import warnings

    key = (list_name, reason)
    if key not in _PP_FALLBACK_WARNED:
        _PP_FALLBACK_WARNED.add(key)
        warnings.warn(
            f"pipeline-parallel fallback to sequential execution for '{list_name}': {reason}"
        )


def _pipeline_apply_stack(parent, body_cls, ctx, list_name, carry, broadcast_args, checkpoint, n_scan,
                          broadcast_kinds=None):
    """Apply a scanned block stack through the GPipe primitive
    (`parallel.pipeline_blocks`): stacked params read from `parent`'s bound
    scope (same checkpoint layout the nn.scan path creates), each stage
    applying its layer slab functionally with the same remat policy the scan
    path would use. Returns (True, carry_out), or (False, None) to fall back
    to the sequential scan when the shape constraints don't hold."""
    from ..parallel.pipeline import pipeline_blocks
    from ..utils.activation_checkpoint import get_checkpoint_policy

    def _warn(reason):
        _pp_fallback_warn(list_name, reason)

    n_stages = ctx.mesh.shape.get(ctx.axis, 1)
    if n_stages <= 1:
        return False, None
    if n_scan % n_stages != 0:
        # Supported via edge-padded stage slabs; flag the idle compute once.
        pad = (-(-n_scan // n_stages)) * n_stages - n_scan
        _warn(
            f"{n_scan} scanned layers split unevenly over {n_stages} stages: "
            f"{pad} padded no-op layer slot(s) run on the last stage each step"
        )

    batch = jax.tree_util.tree_leaves(carry)[0].shape[0]
    dp_axes = tuple(ax for ax in ctx.batch_shard_axes if ctx.mesh.shape.get(ax, 1) > 1)
    dp_size = 1
    for ax in dp_axes:
        dp_size *= ctx.mesh.shape[ax]
    # Auto microbatching: one microbatch per data-parallel batch slice.
    n_mb = ctx.n_microbatches or (batch // dp_size if batch % dp_size == 0 else 0)
    if n_mb < 1 or batch % n_mb != 0 or (batch // n_mb) % dp_size != 0:
        _warn(f"batch {batch} not divisible into {n_mb or '?'} microbatches over dp={dp_size}")
        return False, None

    name = f"{list_name}{SCAN_SUFFIX}"
    try:
        stacked = parent.variables["params"][name]
    except KeyError:
        _warn(f"no stacked params '{name}' in parent scope")
        return False, None

    # Split broadcast args into per-sample conditioning (microbatched alongside
    # the carry) and static tensors (rope tables etc., replicated to every
    # stage). The split is EXPLICIT (caller-tagged): per-sample vs static is
    # not inferable from shapes — a static (S, D) table whose S happens to
    # equal the batch would be silently sliced along the wrong axis.
    if broadcast_kinds is None:
        raise ValueError(
            f"block_stack('{list_name}'): pipeline parallelism is active but "
            f"broadcast_kinds was not provided. Tag every broadcast arg as "
            f"'batched' (per-sample, leading batch dim) or 'static' (replicated)."
        )
    if len(broadcast_kinds) != len(broadcast_args):
        raise ValueError(
            f"block_stack('{list_name}'): broadcast_kinds has {len(broadcast_kinds)} "
            f"entries for {len(broadcast_args)} broadcast args."
        )
    templates = []
    mb_leaves = []
    for a, kind in zip(broadcast_args, broadcast_kinds):
        if kind not in ("batched", "static"):
            raise ValueError(f"broadcast_kinds entries must be 'batched' or 'static', got {kind!r}")
        leaves, treedef = jax.tree_util.tree_flatten(a)
        if kind == "batched" and leaves:
            bad = [leaf.shape for leaf in leaves if getattr(leaf, "ndim", 0) < 1 or leaf.shape[0] != batch]
            if bad:
                raise ValueError(
                    f"block_stack('{list_name}'): arg tagged 'batched' has leaves with "
                    f"leading dim != batch {batch}: {bad}"
                )
            templates.append(("batched", treedef, len(leaves)))
            mb_leaves.extend(leaves)
        else:
            templates.append(("static", a, None))

    def block_fn(layer_params, c, *sliced):
        it = iter(sliced)
        args = []
        for kind, t, n in templates:
            if kind == "batched":
                args.append(jax.tree_util.tree_unflatten(t, [next(it) for _ in range(n)]))
            else:
                args.append(t)
        out, _ = body_cls().apply({"params": layer_params}, c, *args)
        return out

    if checkpoint is not None:
        policy = get_checkpoint_policy("full" if checkpoint == "block_skip" else checkpoint)
        block_fn = jax.checkpoint(block_fn, policy=policy, prevent_cse=False)

    out = pipeline_blocks(
        block_fn,
        stacked,
        carry,
        mesh=ctx.mesh,
        axis=ctx.axis,
        n_microbatches=n_mb,
        batched_args=tuple(mb_leaves),
        batch_shard_axes=dp_axes,
    )
    from ..parallel.pipeline import note_stack_routed

    note_stack_routed(list_name)
    return True, out


def axial_rope_freqs(
    head_dim: int,
    sizes: Sequence[int],
    fractions: Sequence[float],
    theta: float = 10000.0,
    position_scales: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """N-axis RoPE with exact frequency-slot allocation.

    Allocates the head_dim/2 frequency slots across axes proportionally to
    `fractions` (last axis takes the remainder, so the total is always exact —
    avoids the odd-dim breakage of naive per-axis dim splits). Token order is
    row-major over `sizes`. Returns (cos, sin) of shape (prod(sizes), head_dim/2).
    """
    total_slots = head_dim // 2
    slots = []
    for frac in fractions[:-1]:
        slots.append(max(int(total_slots * frac), 1))
    slots.append(total_slots - sum(slots))
    position_scales = position_scales or [1.0] * len(sizes)

    parts = []
    n = len(sizes)
    for axis_idx, (size, n_slots, pscale) in enumerate(zip(sizes, slots, position_scales)):
        inv = 1.0 / (theta ** (jnp.arange(n_slots, dtype=jnp.float32) / max(n_slots, 1)))
        pos = jnp.arange(size, dtype=jnp.float32) * pscale
        freq = pos[:, None] * inv[None, :]  # (size, slots)
        reps_before = 1
        for s in sizes[:axis_idx]:
            reps_before *= s
        reps_after = 1
        for s in sizes[axis_idx + 1 :]:
            reps_after *= s
        freq = jnp.tile(jnp.repeat(freq, reps_after, axis=0), (reps_before, 1))
        parts.append(freq)
    freqs = jnp.concatenate(parts, axis=-1)
    return jnp.cos(freqs), jnp.sin(freqs)
