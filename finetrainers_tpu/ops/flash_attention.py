"""Pallas TPU flash attention (forward + backward).

This is the framework's hot kernel — the TPU-native replacement for the reference's
external flash-attn/cudnn/efficient kernels (dispatch surface at reference
`finetrainers/models/attention_dispatch.py`; see SURVEY.md §2.9).

Design (canonical TPU blockwise attention):
  - Layout **BNTH** inside the kernel (batch, heads, seq, head_dim): the (seq, head)
    trailing dims tile cleanly onto (sublane, lane) = (block, 128).
  - Forward grid (B, N, num_q_blocks, num_kv_blocks), kv innermost. Running
    max/denominator in VMEM scratch persists across the sequential kv iterations
    (TPU grid execution is sequential per core), giving the online-softmax
    recurrence without any HBM round-trips.
  - Backward = two kernels: dKdV with grid (B, N, num_kv_blocks, num_q_blocks)
    and dQ with grid (B, N, num_q_blocks, num_kv_blocks), both re-computing P from
    the saved logsumexp (flash-attention-2 style; no S×S materialization).
  - Variable KV length via a (B,) `kv_lens` array (TPU-friendly padding mask:
    index comparison instead of a materialized S×S mask).
  - Packed varlen batching via `q_segment_ids`/`kv_segment_ids` (B, S) arrays —
    tokens attend only within their segment (block-diagonal mask), covering the
    reference's `flash_varlen` cu_seqlens packing
    (`/root/reference/finetrainers/models/attention_dispatch.py:793-872`).
    Layout follows the proven Mosaic tiling: q ids broadcast over 128 lanes,
    kv ids over 8 sublanes.
  - GQA: handled by head-broadcasting outside the custom_vjp boundary, so the
    repeat's transpose (a sum over the group) is derived by autodiff.

Interface layout is **BTNH** (batch, seq, heads, head_dim) to match the rest of
the framework; transposes at the boundary fuse into the surrounding projections.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 256
_NEG_INF = -1e30
# The softmax runs in base 2: q tiles are pre-scaled by scale*log2(e) so the
# logits land directly in exp2 space. This removes two full-tile (bq, bkv) VPU
# multiplies per grid cell — the explicit `s * scale` and the log2(e) multiply
# hidden inside the exp lowering — from the VPU-bound softmax chain. The
# emitted LSE stays in natural log (m*ln2 + log(l)) so ring/CP consumers and
# saved residuals are unaffected.
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jax.Array, target: int, axis: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# -------------------------------------------------------------- in-kernel RoPE
#
# Interleaved-pair rotation fused into the attention kernels: raw q/k tiles are
# rotated in VMEM right after load (VPU work overlapped with the MXU matmuls),
# and the backward kernels apply the TRANSPOSE rotation to dq/dk before the
# final write. Rotated q/k therefore never exist in HBM — the profile showed the
# XLA-level interleave (reshape->stack->reshape in fp32) costing more per step
# than the flash forward itself (pathological T(1,128)/T(2,128) layouts).


def _rope_rotate_pairs(x: jax.Array) -> jax.Array:
    """rotate(x)[2i] = -x[2i+1]; rotate(x)[2i+1] = x[2i]  (lane-dim pairs)."""
    h = x.shape[1]
    rolled_m = pltpu.roll(x, h - 1, 1)  # x[j+1] at j (shift must be >= 0)
    rolled_p = pltpu.roll(x, 1, 1)  # x[j-1] at j
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane % 2 == 0, -rolled_m, rolled_p)


def _rope_fwd(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """out[2i] = c*x[2i] - s*x[2i+1]; out[2i+1] = c*x[2i+1] + s*x[2i]."""
    return x * cos + _rope_rotate_pairs(x) * sin


def _rope_bwd(g: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Transpose rotation: d(raw x) = R^T g = g*cos - rotate(g)*sin."""
    return g * cos - _rope_rotate_pairs(g) * sin


# ---------------------------------------------------------------------- forward


def _fwd_kernel(
    kv_lens_ref,  # scalar prefetch: (B,) int32
    blockmap_ref,  # scalar prefetch: (B, nq, nkv) int32 block occupancy (or (1,1,1))
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H)
    v_ref,  # (1, 1, bkv, H)
    *rest,  # [q_seg_ref (1, bq, 128), kv_seg_ref (1, 8, bkv),] [mask_ref (1, bq, bkv),]
    #         [cos_q, sin_q, cos_k, sin_k (1, blk, H),] o_ref, lse_ref, scratch x3
    scale: float,
    causal: bool,
    has_segments: bool,
    has_mask: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    fuse_rowsum: bool,
    two_level: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    rest = list(rest)
    q_seg_ref = kv_seg_ref = mask_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    if cache_rope:
        # rope caches declared last in scratch_shapes
        *rest, qrot_scr, krot_scr = rest
    if fuse_rowsum:
        o_ref, lse_ref, m_scr, acc_scr = rest
        l_scr = None
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        if l_scr is not None:
            l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qscale = scale * _LOG2E  # folded into the q tile; see _LOG2E note

    if cache_rope:
        # Rotation is VPU work worth ~20% of a grid cell at head_dim 64: cache
        # rotated q per q-row (computed at kj==0) and rotated k per kv block
        # (computed on the first q-row), reused by every later grid cell.
        @pl.when(kj == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[:] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(qi == 0)
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[pl.ds(kj * block_kv, block_kv), :] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _compute():
        # Keep MXU operands in the INPUT dtype (bf16 in training) with fp32
        # accumulation — casting to fp32 first forces fp32 MXU passes, measured
        # ~3x slower at the flagship shape.
        if cache_rope:
            q = qrot_scr[:]
            k = krot_scr[pl.ds(kj * block_kv, block_kv), :]
        else:
            q = q_ref[0, 0]  # (bq, H)
            k = k_ref[0, 0]  # (bkv, H)
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32, base-2 logit space

        # Masking is STATIC where possible: the unmasked self-attention fast
        # path (no kv_lens, no causal, no segments, no dense mask — e.g. the
        # LTX flagship shape) skips every per-tile iota/compare/where sweep;
        # the softmax VPU chain, not the MXU, bounds this kernel at short S.
        mask = None
        if has_kv_lens:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if causal:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cm = col <= row + (kv_seq_len - q_seq_len)
            mask = cm if mask is None else jnp.logical_and(mask, cm)
        if q_seg_ref is not None:
            seg_q = q_seg_ref[0, :, :1]  # (bq, 1)
            seg_kv = kv_seg_ref[0, :1, :]  # (1, bkv)
            sm = seg_q == seg_kv
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        if mask_ref is not None:
            # Additive fold of the loaded mask tile: Mosaic cannot relayout i1
            # vectors derived from loaded data, so avoid boolean ops on it.
            # Fully-masked rows self-correct in the online-softmax recurrence
            # (their junk l/acc get rescaled by alpha=0 at the first live block).
            s = s + (mask_ref[0].astype(jnp.float32) - 1.0) * 1e30

        m_prev = m_scr[:, :1]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        v = v_ref[0, 0]  # (bkv, H) — or (bkv, 128) ones-augmented (fuse_rowsum)
        if two_level and fuse_rowsum:
            # Two-level online softmax (round-4 verdict experiment): exponentiate
            # against the BLOCK-LOCAL max, so the full-tile exp2 sweep and the
            # P@V matmul depend only on this tile's scores — the cross-tile
            # running max enters via per-row scalars (alpha on acc, beta on pv)
            # after the matmul. Sweep count: same full-tile exp2 + rowmax, PLUS
            # one extra (bq, 128) beta multiply — the win, if any, must come
            # from the shortened serial dependency, not fewer sweeps.
            p = jnp.exp2((s - m_cur).astype(v.dtype))
            if mask is not None:
                p = jnp.where(mask, p, jnp.zeros_like(p))
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            beta = jnp.exp2(m_cur - m_new)
            acc_scr[:] = acc_scr[:] * alpha + pv * beta
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
            return
        if fuse_rowsum:
            # Every full-tile VPU pass here is an issue-slot pass the MXU
            # cannot hide (the kernels are vector-issue-bound at short S):
            #   - exp2 lands DIRECTLY in the matmul dtype (one fused traversal;
            #     no separate f32 p materialization + cast pass),
            #   - the softmax denominator comes out of the PV matmul itself:
            #     v carries a ones column at lane H, so acc[:, H] accumulates
            #     rowsum(p) under the same alpha rescales as the output — the
            #     separate sum(p) pass and the l scratch update disappear.
            p = jnp.exp2((s - m_new).astype(v.dtype))  # (bq, bkv)
            if mask is not None:
                # Fully-invalid rows keep p=exp2(_NEG_INF-_NEG_INF)=1: re-mask.
                p = jnp.where(mask, p, jnp.zeros_like(p))
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # (bq, 128) f32: [:H] = P@V, [H] = rowsum(P)
            acc_scr[:] = acc_scr[:] * alpha + pv
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
            return
        if two_level:
            # Two-level online softmax, no-rowsum-fusion variant (head_dim 128
            # — the Wan/Flux regime): exponentiate against the BLOCK-LOCAL max
            # so the exp2 sweep, the rowsum, and the P@V matmul depend only on
            # this tile's scores; the cross-tile running max enters via the
            # per-row alpha/beta scalars afterwards. Shortens the serial
            # m_prev -> exp2 dependency the straight recurrence carries.
            p = jnp.exp2(s - m_cur)
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            beta = jnp.exp2(m_cur - m_new)
            l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True) * beta
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[:] = acc_scr[:] * alpha + pv * beta
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
            l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
            return
        p = jnp.exp2(s - m_new)  # (bq, bkv)
        if mask is not None:
            # Rows that are entirely invalid keep p≈exp(_NEG_INF-_NEG_INF)=1: re-mask.
            p = jnp.where(mask, p, 0.0)

        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, H) f32
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    block_needed = None
    if causal:
        # Skip fully-masked kv blocks (query rows all above the diagonal).
        first_row = qi * block_q + (kv_seq_len - q_seq_len)
        block_needed = kj * block_kv <= first_row + block_q - 1
    if has_mask:
        # flex block sparsity: skip tiles whose block mask is all-zero.
        occupied = blockmap_ref[b, qi, kj] > 0
        block_needed = occupied if block_needed is None else jnp.logical_and(block_needed, occupied)
    if block_needed is not None:
        @pl.when(block_needed)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(kj == num_kv - 1)
    def _emit():
        if fuse_rowsum:
            head_dim = o_ref.shape[-1]
            l = acc_scr[:, head_dim:head_dim + 1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[:, :head_dim] / l_safe).astype(o_ref.dtype)
        else:
            l = l_scr[:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # m is a base-2 logit max; emit natural-log LSE (external contract).
        # LSE is stored S-last as (B, N, 8, q_pad): a (…, q_pad, 8) layout
        # tiles T(8,128) with the 8-wide minor dim padded to 128 lanes — a 16x
        # HBM expansion (480 MB at CogVideoX scale) billed to every save/
        # rematerialization of the buffer. S-last tiles pad to nothing; the
        # (bq, 1) -> (1, bq) transpose is an 8 KB VPU shuffle.
        lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)  # (bq, 1)
        lse_row = jax.lax.transpose(lse, (1, 0))  # (1, bq)
        lse_ref[0, 0] = jnp.broadcast_to(lse_row, lse_ref.shape[2:]).astype(lse_ref.dtype)


def _fwd_kernel_twopass(
    kv_lens_ref,  # scalar prefetch: (B,) int32
    blockmap_ref,  # scalar prefetch: unused here (no dense-mask support)
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H) — tile (j % nkv): each pass sweeps all kv tiles
    v_ref,  # (1, 1, bkv, 128|H) — tile 0 in pass A (pinned, one fetch), j-nkv in pass B
    *rest,
    scale: float,
    has_segments: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    fuse_rowsum: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    """Two-pass (max-then-accumulate) forward — the recurrence-free experiment.

    The online-softmax recurrence serializes tiles: tile j's exp2 waits on the
    running max from tile j-1, and every tile pays an alpha-rescale sweep of
    the accumulator. Here the kv grid runs 2*nkv iterations per q row: pass A
    (j < nkv) computes s = q@kT and ONLY tracks the row max; pass B recomputes
    s against the now-FINAL max — p = exp2(s - m) needs no rescale, acc and l
    accumulate associatively, and nothing carries a cross-tile serial chain,
    so Mosaic can schedule each tile's VPU sweep against any other tile's MXU
    work. Cost: +50% score matmuls (the MXU has headroom in the VPU-bound
    regimes this targets) and a second K read per tile (hidden by the
    pipeline; with cache_rope the rotated K comes from VMEM, so pass B pays
    no HBM K traffic at all). Numerics: identical quantities to the straight
    kernel up to f32 summation order.

    Causal/dense-mask block skipping stays on the straight kernel."""
    rest = list(rest)
    q_seg_ref = kv_seg_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    if cache_rope:
        *rest, qrot_scr, krot_scr = rest
    if fuse_rowsum:
        o_ref, lse_ref, m_scr, acc_scr = rest
        l_scr = None
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3) // 2
    kj = jnp.where(j < num_kv, j, j - num_kv)
    masked = has_kv_lens or has_segments

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)

    @pl.when(j == num_kv)
    def _init_acc():
        if l_scr is not None:
            l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qscale = scale * _LOG2E

    if cache_rope:
        @pl.when(j == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[:] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(jnp.logical_and(qi == 0, j < num_kv))
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[pl.ds(j * block_kv, block_kv), :] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _scores():
        if cache_rope:
            q = qrot_scr[:]
            k = krot_scr[pl.ds(kj * block_kv, block_kv), :]
        else:
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        mask = None
        if has_kv_lens:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if q_seg_ref is not None:
            seg_q = q_seg_ref[0, :, :1]
            seg_kv = kv_seg_ref[0, :1, :]
            sm = seg_q == seg_kv
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        return s, mask

    @pl.when(j < num_kv)
    def _pass_max():
        s, _ = _scores()
        m_scr[:] = jnp.maximum(m_scr[:], jnp.max(s, axis=1, keepdims=True))

    @pl.when(j >= num_kv)
    def _pass_accumulate():
        s, mask = _scores()
        m = m_scr[:, :1]  # final row max — no rescale anywhere below
        v = v_ref[0, 0]
        if fuse_rowsum:
            p = jnp.exp2((s - m).astype(v.dtype))
            if masked:
                # Fully-invalid rows have m = _NEG_INF -> p = exp2(0) = 1: re-mask.
                p = jnp.where(mask, p, jnp.zeros_like(p)) if mask is not None else p
            acc_scr[:] += jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        else:
            p = jnp.exp2(s - m)
            if masked and mask is not None:
                p = jnp.where(mask, p, 0.0)
            l_scr[:] = l_scr[:] + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[:] += jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == 2 * num_kv - 1)
    def _emit():
        if fuse_rowsum:
            head_dim = o_ref.shape[-1]
            l = acc_scr[:, head_dim:head_dim + 1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[:, :head_dim] / l_safe).astype(o_ref.dtype)
        else:
            l = l_scr[:, :1]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)
        lse_row = jax.lax.transpose(lse, (1, 0))
        lse_ref[0, 0] = jnp.broadcast_to(lse_row, lse_ref.shape[2:]).astype(lse_ref.dtype)


def _fwd_kernel_skew(
    kv_lens_ref,  # scalar prefetch: (B,) int32
    blockmap_ref,  # scalar prefetch: unused here (no dense-mask support)
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H) — tile min(j, nkv-1)
    v_ref,  # (1, 1, bkv, 128|H) — tile clip(j-1, 0, nkv-1) (the PROCESSED tile)
    *rest,
    scale: float,
    has_segments: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    fuse_rowsum: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    """Software-pipelined ("skewed") forward — the VPU/MXU overlap experiment.

    The straight kernel's per-tile chain is serial: s = q@kT (MXU) -> softmax
    sweeps (VPU) -> p@v (MXU); at short S the VPU sweeps are ~the MXU time and
    the units idle alternately. Here grid iteration j ISSUES tile j's score
    matmul and, in the SAME scheduling region, runs the softmax of tile j-1's
    scores out of a double-buffered VMEM scratch — the two chains share no
    data, so Mosaic's scheduler may interleave them and the hardware overlap
    the MXU drain with the VPU sweep. The kv grid runs nkv+1 iterations (the
    +1 drains the last tile); k/v index maps are clamped so the revisit costs
    no extra HBM fetch. Iteration 0 "processes" a dummy tile pre-filled with
    2*_NEG_INF: exp2(dummy - m) underflows to exactly 0 and alpha = exp2(0) = 1,
    so the no-op needs no predicate inside the hot region.

    Causal/dense-mask block skipping stays on the straight kernel (a skipped
    store would desync the two-slot pipeline)."""
    rest = list(rest)
    q_seg_ref = kv_seg_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    *rest, s_scr = rest  # s double-buffer is declared LAST in scratch_shapes
    if cache_rope:
        *rest, qrot_scr, krot_scr = rest
    if fuse_rowsum:
        o_ref, lse_ref, m_scr, acc_scr = rest
        l_scr = None
    else:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    j = pl.program_id(3)
    num_kv = pl.num_programs(3) - 1  # final iteration is drain-only
    masked = has_kv_lens or has_segments

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        if l_scr is not None:
            l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # Dummy prev-tile: far below the m floor so exp2(s - m) == 0 exactly.
        s_scr[1] = jnp.full_like(s_scr[1], 2.0 * _NEG_INF)

    qscale = scale * _LOG2E

    if cache_rope:
        @pl.when(j == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[:] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(jnp.logical_and(qi == 0, j < num_kv))
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[pl.ds(j * block_kv, block_kv), :] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _process(prev_slot):
        """Online-softmax step for the tile stored in s_scr[prev_slot]; v_ref
        holds that tile's V. Reads NOTHING the current iteration's score
        matmul produces."""
        s_prev = s_scr[prev_slot]
        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s_prev, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        v = v_ref[0, 0]
        if fuse_rowsum:
            p = jnp.exp2((s_prev - m_new).astype(v.dtype))
            if masked:
                # Fully-invalid rows keep p = exp2(_NEG_INF - _NEG_INF) = 1;
                # recover the mask from the stored scores.
                p = jnp.where(s_prev > 0.5 * _NEG_INF, p, jnp.zeros_like(p))
            pv = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_scr[:] = acc_scr[:] * alpha + pv
            m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
            return
        p = jnp.exp2(s_prev - m_new)
        if masked:
            p = jnp.where(s_prev > 0.5 * _NEG_INF, p, 0.0)
        l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j < num_kv)
    def _main():
        # --- MXU: scores for tile j (independent of the processing below).
        if cache_rope:
            q = qrot_scr[:]
            k = krot_scr[pl.ds(j * block_kv, block_kv), :]
        else:
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # --- VPU: softmax of tile j-1 (dummy no-op at j == 0).
        _process((j + 1) % 2)
        # --- store tile j's (masked) scores for the next iteration.
        mask = None
        if has_kv_lens:
            col = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if q_seg_ref is not None:
            seg_q = q_seg_ref[0, :, :1]
            seg_kv = kv_seg_ref[0, :1, :]
            sm = seg_q == seg_kv
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)
        s_scr[j % 2] = s

    @pl.when(j == num_kv)
    def _drain_emit():
        _process((j + 1) % 2)
        if fuse_rowsum:
            head_dim = o_ref.shape[-1]
            l = acc_scr[:, head_dim:head_dim + 1]
        else:
            l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        if fuse_rowsum:
            o_ref[0, 0] = (acc_scr[:, :o_ref.shape[-1]] / l_safe).astype(o_ref.dtype)
        else:
            o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :1] * _LN2 + jnp.log(l_safe)
        lse_row = jax.lax.transpose(lse, (1, 0))
        lse_ref[0, 0] = jnp.broadcast_to(lse_row, lse_ref.shape[2:]).astype(lse_ref.dtype)


def _broadcast_segments(q_seg, kv_seg, q_pad, kv_pad):
    """(B, Sq)/(B, Skv) int32 -> Mosaic-tiled (B, q_pad, 128)/(B, 8, kv_pad);
    padded q rows get -1, padded kv cols -2, so padding never matches anything."""
    b = q_seg.shape[0]
    q_seg = jnp.pad(q_seg, ((0, 0), (0, q_pad - q_seg.shape[1])), constant_values=-1)
    kv_seg = jnp.pad(kv_seg, ((0, 0), (0, kv_pad - kv_seg.shape[1])), constant_values=-2)
    q_b = jax.lax.broadcast_in_dim(q_seg.astype(jnp.int32), (b, q_pad, 128), (0, 1))
    kv_b = jax.lax.broadcast_in_dim(kv_seg.astype(jnp.int32), (b, 8, kv_pad), (0, 2))
    return q_b, kv_b


def _prepare_mask(attn_mask, q_pad, kv_pad, block_q, block_kv):
    """(B, Sq, Skv) bool/int8 -> (padded int8 mask, (B, nq, nkv) int32 blockmap)."""
    mask = attn_mask.astype(jnp.int8)
    mask = _pad_to(_pad_to(mask, q_pad, 1), kv_pad, 2)
    b = mask.shape[0]
    blocks = mask.reshape(b, q_pad // block_q, block_q, kv_pad // block_kv, block_kv)
    blockmap = blocks.max(axis=(2, 4)).astype(jnp.int32)
    return mask, blockmap


def _pad_rope(cos, sin, q_pad):
    """(N, S, H) fp32 tables padded along S with the identity rotation."""
    pad = q_pad - cos.shape[1]
    if pad <= 0:
        return cos, sin
    widths = ((0, 0), (0, pad), (0, 0))
    return (
        jnp.pad(cos, widths, constant_values=1.0),
        jnp.pad(sin, widths, constant_values=0.0),
    )


def _flash_forward(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, scale, causal, block_q, block_kv,
                   rope_cos=None, rope_sin=None):
    """q,k,v: (B, N, S, H); kv_lens: (B,) int32 or None (None = every row
    attends the full KV — enables the statically-unmasked fast path);
    q_seg/kv_seg: optional (B, S) int32; attn_mask: optional (B, Sq, Skv)
    boolean (flex block-sparse path); rope_cos/rope_sin: optional (N, S, H)
    fp32 fused-RoPE tables — returns (out, lse)."""
    batch, num_heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]

    block_q = min(block_q, max(q_len, 8))
    block_kv = min(block_kv, max(kv_len, 8))
    q_pad = _cdiv(q_len, block_q) * block_q
    kv_pad = _cdiv(kv_len, block_kv) * block_kv
    q = _pad_to(q, q_pad, 2)
    k = _pad_to(k, kv_pad, 2)
    v = _pad_to(v, kv_pad, 2)
    has_segments = q_seg is not None
    has_mask = attn_mask is not None
    has_rope = rope_cos is not None
    # Padded KV columns MUST be masked even without caller kv_lens.
    has_kv_lens = kv_lens is not None or kv_pad != kv_len
    if kv_lens is None:
        kv_lens = jnp.full((batch,), kv_len, dtype=jnp.int32)

    num_kv_blocks = kv_pad // block_kv
    # Skewed (software-pipelined) forward: overlap tile j's score matmul with
    # tile j-1's softmax sweep. Opt-in experiment; see _fwd_kernel_skew.
    # Measured on v5e (tools/attn_bench.py, S=2688 flagship shape): skew is
    # SLOWER than the straight kernel (2.67 vs 2.61 ms fwd-only) — Mosaic
    # already overlaps the straight kernel's per-tile chains well enough that
    # the extra s-scratch traffic costs more than the explicit overlap buys —
    # and the rope-cache composition miscompiles (TPU backend INTERNAL), so
    # the experiment is additionally gated off rope. Kept for the record;
    # docs/perf.md "Tried and rejected".
    use_skew = (
        os.environ.get("FINETRAINERS_FLASH_SKEW", "0") == "1"
        and not causal and not has_mask and not has_rope
    )
    # Two-pass (max-then-accumulate) forward: recurrence-free softmax at the
    # cost of +50% score matmuls. Opt-in experiment; see _fwd_kernel_twopass.
    use_twopass = (
        os.environ.get("FINETRAINERS_FLASH_TWOPASS", "0") == "1"
        and not causal and not has_mask and not use_skew
    )
    if use_twopass:
        grid = (batch, num_heads, q_pad // block_q, 2 * num_kv_blocks)
        kmap = lambda j: jnp.where(j < num_kv_blocks, j, j - num_kv_blocks)  # noqa: E731
        vmap_ = lambda j: jnp.where(j < num_kv_blocks, 0, j - num_kv_blocks)  # noqa: E731
    elif use_skew:
        grid = (batch, num_heads, q_pad // block_q, num_kv_blocks + 1)
        last_kv = num_kv_blocks - 1
        kmap = lambda j: jnp.minimum(j, last_kv)  # noqa: E731
        vmap_ = lambda j: jnp.clip(j - 1, 0, last_kv)  # noqa: E731
    else:
        grid = (batch, num_heads, q_pad // block_q, num_kv_blocks)
        kmap = vmap_ = lambda j: j  # noqa: E731

    # Cache rotated q/k tiles in VMEM scratch when the grid revisits them and
    # the rotated-K cache stays small (<= ~1MB); causal/masked paths may skip
    # the writer cells, so they rotate inline instead.
    # Cache cap: 1 MB was tuned for the LTX shape (344 KB cache); the Wan
    # H=128 long-S shape needs ~5.2 MB, which still fits VMEM next to 768
    # blocks and removes a per-(qi,kj) k-tile re-rotation sweep (fwd −8.3%
    # measured at the Wan shape, docs/perf.md r5). The budget is COMBINED with
    # the (bq, bkv) f32 score temp: the same 5.2 MB cache that compiles at 768
    # blocks (7.6 MB total) fails Mosaic's VMEM allocation at 1024 (9.2 MB).
    rope_cache_cap = int(os.environ.get("FINETRAINERS_ROPE_CACHE_MB", "6")) << 20
    cache_rope = (
        has_rope and not has_mask and not causal and not has_segments
        and kv_pad * head_dim * q.dtype.itemsize <= rope_cache_cap
        and kv_pad * head_dim * q.dtype.itemsize + block_q * block_kv * 4 <= 8 << 20
    )
    # Rowsum-via-MXU: when head_dim leaves a free lane (< 128), augment V with
    # a ones column at lane H so the PV matmul also produces the softmax
    # denominator (the MXU pass spans 128 output lanes either way). The kernel
    # then skips the per-tile sum(p) VPU pass and the l scratch bookkeeping —
    # it is vector-issue-bound, so a removed full-tile pass is wall time.
    # Dense-mask and causal paths can skip whole grid cells, which is fine:
    # acc (incl. the l column) simply keeps its value. Extra HBM for the wide
    # V: kv_pad*(128-H) * itemsize per (b, n) — ~2x v at H=64, repaid ~20x by
    # the removed passes at flagship shapes.
    fuse_rowsum = head_dim + 1 <= 128
    v_width = 128 if fuse_rowsum else head_dim
    if fuse_rowsum:
        ones_col = jnp.zeros((batch, num_heads, kv_pad, 128 - head_dim), v.dtype)
        ones_col = ones_col.at[..., 0].set(1.0)
        v = jnp.concatenate([v, ones_col], axis=-1)
    if use_twopass:
        kernel = functools.partial(
            _fwd_kernel_twopass,
            scale=scale,
            has_segments=has_segments,
            has_rope=has_rope,
            has_kv_lens=has_kv_lens,
            cache_rope=cache_rope,
            fuse_rowsum=fuse_rowsum,
            block_q=block_q,
            block_kv=block_kv,
            q_seq_len=q_len,
            kv_seq_len=kv_len,
        )
    elif use_skew:
        kernel = functools.partial(
            _fwd_kernel_skew,
            scale=scale,
            has_segments=has_segments,
            has_rope=has_rope,
            has_kv_lens=has_kv_lens,
            cache_rope=cache_rope,
            fuse_rowsum=fuse_rowsum,
            block_q=block_q,
            block_kv=block_kv,
            q_seq_len=q_len,
            kv_seq_len=kv_len,
        )
    else:
        kernel = functools.partial(
            _fwd_kernel,
            scale=scale,
            causal=causal,
            has_segments=has_segments,
            has_mask=has_mask,
            has_rope=has_rope,
            has_kv_lens=has_kv_lens,
            cache_rope=cache_rope,
            fuse_rowsum=fuse_rowsum,
            two_level=os.environ.get("FINETRAINERS_FLASH_TWOLEVEL", "0") == "1",
            block_q=block_q,
            block_kv=block_kv,
            q_seq_len=q_len,
            kv_seq_len=kv_len,
        )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
        pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, i, j, *_: (b, n, kmap(j), 0)),
        pl.BlockSpec((1, 1, block_kv, v_width), lambda b, n, i, j, *_: (b, n, vmap_(j), 0)),
    ]
    operands = [q, k, v]
    if has_segments:
        q_seg_b, kv_seg_b = _broadcast_segments(q_seg, kv_seg, q_pad, kv_pad)
        in_specs += [
            pl.BlockSpec((1, block_q, 128), lambda b, n, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, block_kv), lambda b, n, i, j, *_: (b, 0, kmap(j))),
        ]
        operands += [q_seg_b, kv_seg_b]
    if has_mask:
        mask, blockmap = _prepare_mask(attn_mask, q_pad, kv_pad, block_q, block_kv)
        in_specs.append(pl.BlockSpec((1, block_q, block_kv), lambda b, n, i, j, *_: (b, i, j)))
        operands.append(mask)
    else:
        blockmap = jnp.ones((1, 1, 1), jnp.int32)
    if has_rope:
        cos_p, sin_p = _pad_rope(rope_cos, rope_sin, max(q_pad, kv_pad))
        shared = rope_cos.shape[0] == 1  # per-head tables shared across heads
        nmap = (lambda n: 0) if shared else (lambda n: n)
        in_specs += [
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, i, j, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, i, j, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, i, j, *_: (nmap(n), kmap(j), 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, i, j, *_: (nmap(n), kmap(j), 0)),
        ]
        operands += [cos_p, sin_p, cos_p, sin_p]
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, n, i, j, *_: (b, n, 0, i)),
            ],
            scratch_shapes=([
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # acc (l in lane H)
            ] if fuse_rowsum else [
                pltpu.VMEM((block_q, 128), jnp.float32),  # m
                pltpu.VMEM((block_q, 128), jnp.float32),  # l
                pltpu.VMEM((block_q, head_dim), jnp.float32),  # acc
            ]) + ([
                pltpu.VMEM((block_q, head_dim), q.dtype),
                pltpu.VMEM((kv_pad, head_dim), k.dtype),
            ] if cache_rope else []) + ([
                pltpu.VMEM((2, block_q, block_kv), jnp.float32),  # s double-buffer
            ] if use_skew else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, q_pad, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, 8, q_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(kv_lens, blockmap, *operands)
    return out[:, :, :q_len], lse[:, :, 0, :q_len]


# --------------------------------------------------------------------- backward


def _bwd_dkdv_kernel(
    kv_lens_ref,
    blockmap_ref,
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H)
    v_ref,  # (1, 1, bkv, H)
    do_ref,  # (1, 1, bq, H)
    lse_ref,  # (1, 1, 8, bq) S-last (see _flash_backward staging note)
    delta_ref,  # (1, 1, 8, bq)
    *rest,  # [q_seg_ref, kv_seg_ref,] [mask_ref,] [rope x4,] dk_ref, dv_ref, dk_scr, dv_scr [, rope caches]
    scale: float,
    causal: bool,
    has_segments: bool,
    has_mask: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    rest = list(rest)
    q_seg_ref = kv_seg_ref = mask_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    if cache_rope:
        *rest, qrot_scr, krot_scr = rest
    dk_ref, dv_ref, dk_scr, dv_scr = rest
    b = pl.program_id(0)
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qscale = scale * _LOG2E  # folded into the q tile; see _LOG2E note

    if cache_rope:
        # kj is the OUTER grid axis here: rotated q tiles (written during the
        # first kj pass) are reused by every later kv block; rotated k (written
        # on each kj's first inner step) is reused across the qi sweep.
        @pl.when(kj == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[pl.ds(qi * block_q, block_q), :] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(qi == 0)
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[:] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _compute():
        if cache_rope:
            q = qrot_scr[pl.ds(qi * block_q, block_q), :]
            k = krot_scr[:]
        else:
            q = q_ref[0, 0]  # (bq, H) input dtype (bf16 fast path on the MXU)
            k = k_ref[0, 0]  # (bkv, H)
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        v = v_ref[0, 0]
        do = do_ref[0, 0]  # (bq, H)
        lse = jax.lax.transpose(lse_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32) * _LOG2E  # (bq, 1) base-2
        delta = jax.lax.transpose(delta_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32)  # (bq, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32, base-2 logit space
        mask = None
        if has_kv_lens:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if causal:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cm = col <= row + (kv_seq_len - q_seq_len)
            mask = cm if mask is None else jnp.logical_and(mask, cm)
        if q_seg_ref is not None:
            sm = q_seg_ref[0, :, :1] == kv_seg_ref[0, :1, :]
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask_ref is not None:
            s = s + (mask_ref[0].astype(jnp.float32) - 1.0) * 1e30
        # p lands DIRECTLY in the matmul dtype: the dv matmul consumed a bf16
        # cast anyway, and the kernels are vector-issue-bound — the separate
        # f32 materialization + cast were whole-tile passes of wall time.
        p = jnp.exp2(s - lse).astype(do.dtype)  # (bq, bkv); padded q rows: lse=+inf -> p=0
        if mask is not None:
            p = jnp.where(mask, p, jnp.zeros_like(p))

        # dv += P^T @ dO
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dp = dO @ V^T ; ds = P * (dp - delta)  (scale folded into q; the
        # accumulated dk therefore carries a log2(e)*... factor undone at emit).
        # ds is assembled in the matmul dtype: (dp - delta) narrows once, the
        # product needs no final cast — two fewer full-tile f32 passes. The dk
        # matmul consumed bf16 ds before too; only the rounding point moved.
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32
        ds = p * (dp - delta).astype(p.dtype)
        # dk += dS^T @ (scale*log2e * Q)
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    block_needed = None
    if causal:
        last_row = (qi + 1) * block_q - 1 + (kv_seq_len - q_seq_len)
        block_needed = kj * block_kv <= last_row
    if has_mask:
        occupied = blockmap_ref[b, qi, kj] > 0
        block_needed = occupied if block_needed is None else jnp.logical_and(block_needed, occupied)
    if block_needed is not None:
        @pl.when(block_needed)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(qi == num_q - 1)
    def _emit():
        # dk_scr = sum ds^T @ (scale*log2e*q_rot) with ds missing its *scale:
        # net surplus factor is log2e, undone here (ln2 = 1/log2e).
        dk = dk_scr[:] * _LN2
        if has_rope:
            # kernel accumulates d(k_rot); return d(raw k) = R^T d(k_rot)
            dk = _rope_bwd(dk, cos_k_ref[0], sin_k_ref[0])
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    kv_lens_ref,
    blockmap_ref,
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H)
    v_ref,  # (1, 1, bkv, H)
    do_ref,  # (1, 1, bq, H)
    lse_ref,  # (1, 1, 8, bq) S-last
    delta_ref,  # (1, 1, 8, bq)
    *rest,  # [seg x2,] [mask,] [rope x4,] dk_ref, dv_ref, dq_ref, dk_scr, dv_scr, dq_acc [, rope caches]
    scale: float,
    causal: bool,
    has_segments: bool,
    has_mask: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    """Single-kernel backward: grid (B, N, nkv, nq) like dKdV, but each cell
    also feeds a FULL-q-length f32 dq accumulator in VMEM scratch. The split
    dQ/dKdV pair recomputes s = q@k^T, p = exp2(s - lse) and dp = dO@V^T twice
    per (q, kv) tile; the kernels are VPU-issue-bound, so the duplicated exp2 /
    mask / ds full-tile sweeps are pure wall time. The dq output block is the
    whole (q_pad, H) plane with a CONSTANT index map — Pallas DMAs it out once
    per (b, n), after the accumulator's last update (no aliased partial writes,
    which broke double-buffering in the round-3 aliasing experiment)."""
    rest = list(rest)
    q_seg_ref = kv_seg_ref = mask_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    if cache_rope:
        *rest, qrot_scr, krot_scr = rest
    dk_ref, dv_ref, dq_ref, dk_scr, dv_scr, dq_acc = rest
    b = pl.program_id(0)
    kj = pl.program_id(2)
    qi = pl.program_id(3)
    num_q = pl.num_programs(3)
    num_kv = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(kj == 0)
    def _init_dq():
        dq_acc[pl.ds(qi * block_q, block_q), :] = jnp.zeros((block_q, dq_acc.shape[1]), dq_acc.dtype)

    qscale = scale * _LOG2E

    if cache_rope:
        @pl.when(kj == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[pl.ds(qi * block_q, block_q), :] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(qi == 0)
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[:] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _compute():
        if cache_rope:
            q = qrot_scr[pl.ds(qi * block_q, block_q), :]
            k = krot_scr[:]
        else:
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = jax.lax.transpose(lse_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32) * _LOG2E
        delta = jax.lax.transpose(delta_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32, base-2 logit space
        mask = None
        if has_kv_lens:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if causal:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cm = col <= row + (kv_seq_len - q_seq_len)
            mask = cm if mask is None else jnp.logical_and(mask, cm)
        if q_seg_ref is not None:
            sm = q_seg_ref[0, :, :1] == kv_seg_ref[0, :1, :]
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask_ref is not None:
            s = s + (mask_ref[0].astype(jnp.float32) - 1.0) * 1e30
        p = jnp.exp2(s - lse).astype(do.dtype)  # padded q rows: lse=+inf -> p=0
        if mask is not None:
            p = jnp.where(mask, p, jnp.zeros_like(p))

        # dv += P^T @ dO
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32
        ds = p * (dp - delta).astype(p.dtype)
        # dk += dS^T @ (scale*log2e * Q)  — surplus log2e undone at emit
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dq[qi] += dS @ (rotated K) — the one extra matmul the fusion costs;
        # everything above it (s, p, dp, ds) was computed twice before.
        dq_acc[pl.ds(qi * block_q, block_q), :] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    block_needed = None
    if causal:
        last_row = (qi + 1) * block_q - 1 + (kv_seq_len - q_seq_len)
        block_needed = kj * block_kv <= last_row
    if has_mask:
        occupied = blockmap_ref[b, qi, kj] > 0
        block_needed = occupied if block_needed is None else jnp.logical_and(block_needed, occupied)
    if block_needed is not None:
        @pl.when(block_needed)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(qi == num_q - 1)
    def _emit_kv():
        dk = dk_scr[:] * _LN2
        if has_rope:
            dk = _rope_bwd(dk, cos_k_ref[0], sin_k_ref[0])
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)

    @pl.when(kj == num_kv - 1)
    def _emit_dq():
        dq = dq_acc[pl.ds(qi * block_q, block_q), :] * scale  # ds lacked its *scale
        if has_rope:
            dq = _rope_bwd(dq, cos_q_ref[0], sin_q_ref[0])
        dq_ref[0, 0, pl.ds(qi * block_q, block_q), :] = dq.astype(dq_ref.dtype)


def _bwd_dq_kernel(
    kv_lens_ref,
    blockmap_ref,
    q_ref,  # (1, 1, bq, H)
    k_ref,  # (1, 1, bkv, H)
    v_ref,  # (1, 1, bkv, H)
    do_ref,  # (1, 1, bq, H)
    lse_ref,  # (1, 1, 8, bq) S-last (see _flash_backward staging note)
    delta_ref,  # (1, 1, 8, bq)
    *rest,  # [q_seg_ref, kv_seg_ref,] [mask_ref,] [rope x4,] dq_ref, dq_scr [, rope caches]
    scale: float,
    causal: bool,
    has_segments: bool,
    has_mask: bool,
    has_rope: bool,
    has_kv_lens: bool,
    cache_rope: bool,
    block_q: int,
    block_kv: int,
    q_seq_len: int,
    kv_seq_len: int,
):
    rest = list(rest)
    q_seg_ref = kv_seg_ref = mask_ref = None
    cos_q_ref = sin_q_ref = cos_k_ref = sin_k_ref = None
    if has_segments:
        q_seg_ref, kv_seg_ref = rest[0], rest[1]
        rest = rest[2:]
    if has_mask:
        mask_ref = rest[0]
        rest = rest[1:]
    if has_rope:
        cos_q_ref, sin_q_ref, cos_k_ref, sin_k_ref = rest[:4]
        rest = rest[4:]
    if cache_rope:
        *rest, qrot_scr, krot_scr = rest
    dq_ref, dq_scr = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(kj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qscale = scale * _LOG2E  # folded into the q tile; see _LOG2E note

    if cache_rope:
        @pl.when(kj == 0)
        def _rot_q():
            qr = _rope_fwd(q_ref[0, 0].astype(jnp.float32), cos_q_ref[0], sin_q_ref[0])
            qrot_scr[:] = (qr * qscale).astype(qrot_scr.dtype)

        @pl.when(qi == 0)
        def _rot_k():
            kr = _rope_fwd(k_ref[0, 0].astype(jnp.float32), cos_k_ref[0], sin_k_ref[0])
            krot_scr[pl.ds(kj * block_kv, block_kv), :] = kr.astype(krot_scr.dtype)

    kv_len = kv_lens_ref[b]

    def _compute():
        if cache_rope:
            q = qrot_scr[:]
            k = krot_scr[pl.ds(kj * block_kv, block_kv), :]
        else:
            q = q_ref[0, 0]
            k = k_ref[0, 0]
            if has_rope:
                q = (_rope_fwd(q.astype(jnp.float32), cos_q_ref[0], sin_q_ref[0]) * qscale).astype(q.dtype)
                k = _rope_fwd(k.astype(jnp.float32), cos_k_ref[0], sin_k_ref[0]).astype(k.dtype)
            else:
                q = (q.astype(jnp.float32) * qscale).astype(q.dtype)
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = jax.lax.transpose(lse_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32) * _LOG2E  # base-2
        delta = jax.lax.transpose(delta_ref[0, 0, :1, :], (1, 0)).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bkv) f32, base-2 logit space
        mask = None
        if has_kv_lens:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            mask = col < kv_len
        if causal:
            col = kj * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cm = col <= row + (kv_seq_len - q_seq_len)
            mask = cm if mask is None else jnp.logical_and(mask, cm)
        if q_seg_ref is not None:
            sm = q_seg_ref[0, :, :1] == kv_seg_ref[0, :1, :]
            mask = sm if mask is None else jnp.logical_and(mask, sm)
        if mask_ref is not None:
            s = s + (mask_ref[0].astype(jnp.float32) - 1.0) * 1e30
        # p/ds in the matmul dtype — same pass-elimination as the dkdv kernel.
        p = jnp.exp2(s - lse).astype(k.dtype)  # padded q rows have lse=+inf -> p=0
        if mask is not None:
            p = jnp.where(mask, p, jnp.zeros_like(p))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta).astype(p.dtype)  # *scale deferred to emit (folded into q)
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    block_needed = None
    if causal:
        first_row = qi * block_q + (kv_seq_len - q_seq_len)
        block_needed = kj * block_kv <= first_row + block_q - 1
    if has_mask:
        occupied = blockmap_ref[b, qi, kj] > 0
        block_needed = occupied if block_needed is None else jnp.logical_and(block_needed, occupied)
    if block_needed is not None:
        @pl.when(block_needed)
        def _():
            _compute()
    else:
        _compute()

    @pl.when(kj == num_kv - 1)
    def _emit():
        dq = dq_scr[:] * scale  # ds was accumulated without its *scale
        if has_rope:
            dq = _rope_bwd(dq, cos_q_ref[0], sin_q_ref[0])
        dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _flash_backward(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, out, lse, do, scale, causal,
                    block_q, block_kv, rope_cos=None, rope_sin=None):
    batch, num_heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]
    has_segments = q_seg is not None
    has_mask = attn_mask is not None
    has_rope = rope_cos is not None
    has_kv_lens = kv_lens is not None
    if kv_lens is None:
        kv_lens = jnp.full((batch,), kv_len, dtype=jnp.int32)

    # delta = rowsum(dO * O): cheap elementwise+reduce — let XLA fuse it.
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, N, Sq)

    block_q = min(block_q, max(q_len, 8))
    block_kv = min(block_kv, max(kv_len, 8))
    q_pad = _cdiv(q_len, block_q) * block_q
    kv_pad = _cdiv(kv_len, block_kv) * block_kv
    qp = _pad_to(q, q_pad, 2)
    kp = _pad_to(k, kv_pad, 2)
    vp = _pad_to(v, kv_pad, 2)
    dop = _pad_to(do, q_pad, 2)
    # Pad LSE with +inf so padded q rows give p = exp(s - inf) = 0. Both per-row
    # vectors are staged S-last as (B, N, 8, q_pad) — the old (…, q_pad, 8)
    # layout tiled with the 8-wide dim in lanes, a 16x padded-HBM expansion
    # (480 MB per buffer at CogVideoX scale) on buffers the remat pass keeps
    # live; S-last tiles exactly.
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad - q_len)), constant_values=jnp.inf)
    lsep = jnp.broadcast_to(lsep[:, :, None, :], (batch, num_heads, 8, q_pad))
    deltap = _pad_to(delta, q_pad, 2)
    deltap = jnp.broadcast_to(deltap[:, :, None, :], (batch, num_heads, 8, q_pad))

    import os as _os

    cache_rope = (
        has_rope and not has_mask and not causal and not has_segments
        and kv_pad * head_dim * q.dtype.itemsize <= 1 << 20
        and q_pad * head_dim * q.dtype.itemsize <= 1 << 20  # dkdv full-q cache
    )
    common = dict(
        scale=scale,
        causal=causal,
        has_segments=has_segments,
        has_mask=has_mask,
        has_rope=has_rope,
        has_kv_lens=has_kv_lens or kv_pad != kv_len,
        cache_rope=cache_rope,
        block_q=block_q,
        block_kv=block_kv,
        q_seq_len=q_len,
        kv_seq_len=kv_len,
    )
    seg_operands = []
    dkdv_seg_specs = []
    dq_seg_specs = []
    if has_segments:
        q_seg_b, kv_seg_b = _broadcast_segments(q_seg, kv_seg, q_pad, kv_pad)
        seg_operands = [q_seg_b, kv_seg_b]
        dkdv_seg_specs = [
            pl.BlockSpec((1, block_q, 128), lambda b, n, j, i, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, block_kv), lambda b, n, j, i, *_: (b, 0, j)),
        ]
        dq_seg_specs = [
            pl.BlockSpec((1, block_q, 128), lambda b, n, i, j, *_: (b, i, 0)),
            pl.BlockSpec((1, 8, block_kv), lambda b, n, i, j, *_: (b, 0, j)),
        ]
    if has_mask:
        mask, blockmap = _prepare_mask(attn_mask, q_pad, kv_pad, block_q, block_kv)
        seg_operands = seg_operands + [mask]
        dkdv_seg_specs = dkdv_seg_specs + [
            pl.BlockSpec((1, block_q, block_kv), lambda b, n, j, i, *_: (b, i, j)),
        ]
        dq_seg_specs = dq_seg_specs + [
            pl.BlockSpec((1, block_q, block_kv), lambda b, n, i, j, *_: (b, i, j)),
        ]
    else:
        blockmap = jnp.ones((1, 1, 1), jnp.int32)
    if has_rope:
        cos_p, sin_p = _pad_rope(rope_cos, rope_sin, max(q_pad, kv_pad))
        shared = rope_cos.shape[0] == 1  # per-head tables shared across heads
        nmap = (lambda n: 0) if shared else (lambda n: n)
        seg_operands = seg_operands + [cos_p, sin_p, cos_p, sin_p]
        dkdv_seg_specs = dkdv_seg_specs + [
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, j, i, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, j, i, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, j, i, *_: (nmap(n), j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, j, i, *_: (nmap(n), j, 0)),
        ]
        dq_seg_specs = dq_seg_specs + [
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, i, j, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_q, head_dim), lambda b, n, i, j, *_: (nmap(n), i, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, i, j, *_: (nmap(n), j, 0)),
            pl.BlockSpec((1, block_kv, head_dim), lambda b, n, i, j, *_: (nmap(n), j, 0)),
        ]

    # Fused single-kernel backward (opt-in, MEASURED SLOWER — kept as a tested
    # experiment): one kernel computes dq/dk/dv per (kv, q) tile with a full-q
    # f32 dq accumulator in VMEM and a constant-index dq out plane, removing
    # the split pair's duplicated s/p/dp/ds sweeps. Grads are bit-exact vs the
    # split kernels on-chip, but at the LTX flagship shape it measures 4.27 ms
    # fwd+bwd vs 4.13 split (no RoPE) and 5.19-5.36 vs 4.26 (fused RoPE): the
    # dynamic-offset read-modify-write on the full-length accumulator and the
    # 3-output buffer pressure cost more than the removed VPU sweeps save.
    # See docs/perf.md "Tried and rejected".
    fused = _os.environ.get("FINETRAINERS_FLASH_FUSED_BWD") == "1" and q_pad * head_dim * 6 <= (3 << 20)
    if fused:
        dk, dv, dq = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, **common),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(batch, num_heads, kv_pad // block_kv, q_pad // block_q),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, j, i, *_: (b, n, i, 0)),
                    pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                    pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                    pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, j, i, *_: (b, n, i, 0)),
                    pl.BlockSpec((1, 1, 8, block_q), lambda b, n, j, i, *_: (b, n, 0, i)),
                    pl.BlockSpec((1, 1, 8, block_q), lambda b, n, j, i, *_: (b, n, 0, i)),
                ] + dkdv_seg_specs,
                out_specs=[
                    pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                    pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                    pl.BlockSpec((1, 1, q_pad, head_dim), lambda b, n, j, i, *_: (b, n, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_kv, head_dim), jnp.float32),
                    pltpu.VMEM((block_kv, head_dim), jnp.float32),
                    pltpu.VMEM((q_pad, head_dim), jnp.float32),
                ] + ([
                    pltpu.VMEM((q_pad, head_dim), q.dtype),
                    pltpu.VMEM((block_kv, head_dim), k.dtype),
                ] if cache_rope else []),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim), k.dtype),
                jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim), v.dtype),
                jax.ShapeDtypeStruct((batch, num_heads, q_pad, head_dim), q.dtype),
            ],
            interpret=_interpret(),
        )(kv_lens, blockmap, qp, kp, vp, dop, lsep, deltap, *seg_operands)
        return dq[:, :, :q_len], dk[:, :, :kv_len], dv[:, :, :kv_len]

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_heads, kv_pad // block_kv, q_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, j, i, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, j, i, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, n, j, i, *_: (b, n, 0, i)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, n, j, i, *_: (b, n, 0, i)),
            ] + dkdv_seg_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, j, i, *_: (b, n, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, head_dim), jnp.float32),
                pltpu.VMEM((block_kv, head_dim), jnp.float32),
            ] + ([
                pltpu.VMEM((q_pad, head_dim), q.dtype),
                pltpu.VMEM((block_kv, head_dim), k.dtype),
            ] if cache_rope else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim), k.dtype),
            jax.ShapeDtypeStruct((batch, num_heads, kv_pad, head_dim), v.dtype),
        ],
        interpret=_interpret(),
    )(kv_lens, blockmap, qp, kp, vp, dop, lsep, deltap, *seg_operands)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_heads, q_pad // block_q, kv_pad // block_kv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, i, j, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim), lambda b, n, i, j, *_: (b, n, j, 0)),
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, n, i, j, *_: (b, n, 0, i)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, n, i, j, *_: (b, n, 0, i)),
            ] + dq_seg_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim), lambda b, n, i, j, *_: (b, n, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ] + ([
                pltpu.VMEM((block_q, head_dim), q.dtype),
                pltpu.VMEM((kv_pad, head_dim), k.dtype),
            ] if cache_rope else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, q_pad, head_dim), q.dtype),
        ],
        interpret=_interpret(),
    )(kv_lens, blockmap, qp, kp, vp, dop, lsep, deltap, *seg_operands)[0]

    return dq[:, :, :q_len], dk[:, :, :kv_len], dv[:, :, :kv_len]


# ----------------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _flash_mha(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, rope_cos, rope_sin,
               scale, causal, block_q, block_kv):
    out, _ = _flash_forward(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, scale, causal,
                            block_q, block_kv, rope_cos, rope_sin)
    return out


def _flash_mha_fwd(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, rope_cos, rope_sin,
                   scale, causal, block_q, block_kv):
    out, lse = _flash_forward(q, k, v, kv_lens, q_seg, kv_seg, attn_mask, scale, causal,
                              block_q, block_kv, rope_cos, rope_sin)
    # Tag the kernel residuals so the "ops" remat policy saves them: without
    # this the backward scan replays the whole forward kernel per layer just to
    # regenerate out/lse (out is ~11MB, lse a few hundred KB per layer).
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_out")
    return out, (q, k, v, kv_lens, q_seg, kv_seg, attn_mask, rope_cos, rope_sin, out, lse)


def _flash_mha_bwd(scale, causal, block_q, block_kv, residuals, g):
    q, k, v, kv_lens, q_seg, kv_seg, attn_mask, rope_cos, rope_sin, out, lse = residuals
    dq, dk, dv = _flash_backward(
        q, k, v, kv_lens, q_seg, kv_seg, attn_mask, out, lse, g, scale, causal, block_q, block_kv,
        rope_cos, rope_sin,
    )
    return dq, dk, dv, None, None, None, None, None, None


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def flash_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    block_mask: Optional[jax.Array] = None,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
) -> jax.Array:
    """Flash attention on BTNH tensors.

    query: (B, Sq, N, H); key/value: (B, Skv, Nkv, H) with Nkv dividing N (GQA).
    kv_lens: optional (B,) int32 valid KV lengths.
    q_segment_ids/kv_segment_ids: optional (B, Sq)/(B, Skv) int32 — packed varlen
    batching; tokens attend only within equal ids (ids must be >= 0; use -1 to
    mark padding). Both must be given together. Causal masking composes with
    *global* positions; per-segment causal restarts are not supported (raise).
    block_mask: optional (B, Sq, Skv) boolean mask (True = attend) — the flex
    block-sparse path: fully-masked (block_q x block_kv) tiles are skipped in
    the forward AND both backward kernels (torch flex_attention BlockMask
    analog); partial tiles apply the mask densely.
    rope_cos/rope_sin: optional fp32 tables for FUSED interleaved-pair RoPE —
    either (S, N*H) full-inner-dim (LTX convention) or (S, H) per-head shared
    across heads (Wan/Flux convention, repeat-2 expanded). Raw q/k go in,
    rotation happens inside the kernels (fwd and bwd), so rotated q/k never
    round-trip through HBM. Requires self-attention shapes (Sq == Skv), no GQA.
    """
    batch, q_len, num_heads, head_dim = query.shape
    kv_len = key.shape[1]
    num_kv_heads = key.shape[2]
    if scale is None:
        scale = head_dim**-0.5
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("q_segment_ids and kv_segment_ids must be given together")
    if q_segment_ids is not None and causal:
        raise NotImplementedError("per-segment causal masking is not supported")
    if kv_lens is not None:
        kv_lens = kv_lens.astype(jnp.int32)

    if rope_cos is not None:
        if q_len != kv_len or num_kv_heads != num_heads:
            raise ValueError("fused RoPE requires self-attention shapes without GQA")
        if rope_cos.shape == (q_len, num_heads * head_dim):
            # full-inner-dim tables (LTX convention): (S, N*H) -> (N, S, H)
            rope_cos = rope_cos.reshape(q_len, num_heads, head_dim).swapaxes(0, 1)
            rope_sin = rope_sin.reshape(q_len, num_heads, head_dim).swapaxes(0, 1)
        elif rope_cos.shape == (q_len, head_dim):
            # per-head tables shared across heads (Wan/Flux convention, already
            # repeat-2 expanded to H): (S, H) -> (1, S, H); the kernel's index
            # map pins the head index to 0.
            rope_cos = rope_cos[None]
            rope_sin = rope_sin[None]
        else:
            raise ValueError(
                f"rope tables must be (S, N*H) or (S, H); got {rope_cos.shape} "
                f"for S={q_len}, N={num_heads}, H={head_dim}"
            )

    # BTNH -> BNTH (fuses into surrounding projections under XLA).
    q = jnp.swapaxes(query, 1, 2)
    k = jnp.swapaxes(key, 1, 2)
    v = jnp.swapaxes(value, 1, 2)
    if num_kv_heads != num_heads:
        rep = num_heads // num_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    out = _flash_mha(
        q, k, v, kv_lens, q_segment_ids, kv_segment_ids, block_mask, rope_cos, rope_sin,
        float(scale), bool(causal), int(block_q), int(block_kv),
    )
    return jnp.swapaxes(out, 1, 2)
