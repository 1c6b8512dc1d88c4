"""Independent NumPy re-implementations of one transformer block per family.

Each block's math is written here directly from the reference model's equations
(diffusers `transformer_ltx.py` / `transformer_wan.py` / ... as specified in the
reference specs), with NO flax/jax code in the compute path — then the repo's
flax block must match on random weights. This catches wrong-from-day-one ops
that self-recorded goldens cannot (VERDICT r2 item 5a).
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


ATOL, RTOL = 2e-4, 2e-4


# ------------------------------------------------------------- numpy primitives


def np_rms_norm(x, scale=None, eps=1e-6):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    y = x / np.sqrt(var + eps)
    if scale is not None:
        y = y * scale
    return y


def np_layer_norm(x, scale=None, bias=None, eps=1e-6):
    x64 = x.astype(np.float64)
    mu = x64.mean(axis=-1, keepdims=True)
    var = x64.var(axis=-1, keepdims=True)
    y = (x64 - mu) / np.sqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y


def np_gelu_tanh(x):
    # diffusers "gelu-approximate"
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def np_softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_attention(q, k, v, num_heads, scale=None):
    """q (B,Sq,D), k/v (B,Skv,D) -> (B,Sq,D); plain softmax attention."""
    b, sq, d = q.shape
    skv = k.shape[1]
    h = d // num_heads
    scale = scale if scale is not None else h**-0.5
    qh = q.reshape(b, sq, num_heads, h).transpose(0, 2, 1, 3)
    kh = k.reshape(b, skv, num_heads, h).transpose(0, 2, 1, 3)
    vh = v.reshape(b, skv, num_heads, h).transpose(0, 2, 1, 3)
    logits = np.einsum("bnqh,bnkh->bnqk", qh * scale, kh)
    probs = np_softmax(logits)
    out = np.einsum("bnqk,bnkh->bnqh", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d)


def np_rope_interleaved(x, cos, sin):
    """Interleaved-pair rotation on the full inner dim (diffusers
    `apply_rotary_emb` in transformer_ltx): out[2i] = c*x[2i] - s*x[2i+1]."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[..., 0::2]
    s = sin[..., 0::2]
    out = np.empty_like(x)
    out[..., 0::2] = x1 * c - x2 * s
    out[..., 1::2] = x2 * c + x1 * s
    return out


def np_dense(x, p, lora_scale=None):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    if "lora_a" in p and lora_scale is not None:
        y = y + lora_scale * ((x @ p["lora_a"]) @ p["lora_b"])
    return y


def to_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)


# ----------------------------------------------------------------------- LTX


class TestLTXBlock:
    def _build(self):
        from finetrainers_tpu.models.ltx_video.transformer import LTXTransformerBlock

        B, S, L, N, H = 1, 12, 5, 2, 8
        D = N * H
        block = LTXTransformerBlock(dim=D, num_heads=N, head_dim=H, lora_rank=4,
                                    lora_alpha=8.0, dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, D), jnp.float32)
        ctx = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 3), (B, S, 6 * D), jnp.float32) * 0.2
        ph = jax.random.uniform(jax.random.fold_in(rng, 4), (S, D // 2)) * 6.0
        cos = jnp.repeat(jnp.cos(ph), 2, axis=-1)
        sin = jnp.repeat(jnp.sin(ph), 2, axis=-1)
        params = block.init(jax.random.fold_in(rng, 5), x, ctx, temb, (cos, sin))["params"]
        # randomize lora_b (zeros by default) so the LoRA path is exercised
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        out = block.apply({"params": params}, x, ctx, temb, (cos, sin))
        return (np.asarray(x, np.float64), np.asarray(ctx, np.float64),
                np.asarray(temb, np.float64), np.asarray(cos, np.float64),
                np.asarray(sin, np.float64), to_np(params), np.asarray(out), D)

    def test_block_matches_numpy(self):
        """Reference math: diffusers LTXVideoTransformerBlock (per-token adaLN
        from scale_shift_table + temb, rms-without-affine pre-norms, qk RMSNorm
        across the FULL inner dim, RoPE before the head split, cross-attn with
        NO pre-norm, gelu-approximate MLP)."""
        x, ctx, temb, cos, sin, p, got, D = self._build()
        lora_scale = 8.0 / 4.0

        table = p["scale_shift_table"]  # (6, D)
        ada = table[None, None] + temb.reshape(1, -1, 6, D)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            ada[:, :, i] for i in range(6)
        ]

        def attn(pp, q_in, kv_in, rope):
            q = np_dense(q_in, pp["to_q"], lora_scale)
            k = np_dense(kv_in, pp["to_k"], lora_scale)
            v = np_dense(kv_in, pp["to_v"], lora_scale)
            q = np_rms_norm(q, pp["norm_q"]["scale"])
            k = np_rms_norm(k, pp["norm_k"]["scale"])
            if rope:
                q = np_rope_interleaved(q, cos[None], sin[None])
                k = np_rope_interleaved(k, cos[None], sin[None])
            o = np_attention(q, k, v, num_heads=2)
            return np_dense(o, pp["to_out"], lora_scale)

        h = np_rms_norm(x) * (1.0 + scale_msa) + shift_msa
        x1 = x + attn(p["attn1"], h, h, rope=True) * gate_msa
        x2 = x1 + attn(p["attn2"], x1, ctx, rope=False)
        h = np_rms_norm(x2) * (1.0 + scale_mlp) + shift_mlp
        h = np_dense(h, p["ff_net_0_proj"], lora_scale)
        h = np_gelu_tanh(h)
        h = np_dense(h, p["ff_net_2"], lora_scale)
        want = x2 + h * gate_mlp

        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def np_rope_per_head(x, cos, sin):
    """x (B,S,N,H); cos/sin (S, H/2); interleaved complex convention
    (diffusers transformer_wan rotary)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = np.empty_like(x)
    out[..., 0::2] = x1 * c - x2 * s
    out[..., 1::2] = x2 * c + x1 * s
    return out


def np_attention_4d(q, k, v, scale=None):
    """q (B,Sq,N,H), k/v (B,Skv,N,H) -> (B,Sq,N,H)."""
    h = q.shape[-1]
    scale = scale if scale is not None else h**-0.5
    logits = np.einsum("bqnh,bknh->bnqk", q * scale, k)
    probs = np_softmax(logits)
    return np.einsum("bnqk,bknh->bqnh", probs, v)


class TestWanBlock:
    def test_block_matches_numpy(self):
        """Reference math: diffusers WanTransformerBlock (shared (1,6,dim)
        scale_shift_table + per-batch temb, affine-free LN around self-attn and
        FFN but AFFINE LN before cross-attn, per-head qk RMSNorm, per-head
        interleaved RoPE, I2V extra image-KV attention added to the cross
        output)."""
        from finetrainers_tpu.models.wan.transformer import WanTransformerBlock

        B, S, L, LI, N, H = 1, 10, 4, 3, 2, 8
        D, FFN = N * H, 24
        block = WanTransformerBlock(dim=D, num_heads=N, head_dim=H, ffn_dim=FFN,
                                    has_image_kv=True, lora_rank=4, lora_alpha=8.0,
                                    dtype=jnp.float32)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, D), jnp.float32)
        ctx = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, D), jnp.float32)
        img = jax.random.normal(jax.random.fold_in(rng, 3), (B, LI, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 4), (B, 6, D), jnp.float32) * 0.2
        ph = jax.random.uniform(jax.random.fold_in(rng, 5), (S, H // 2)) * 6.0
        cos, sin = jnp.cos(ph), jnp.sin(ph)
        params = block.init(jax.random.fold_in(rng, 6), x, ctx, temb, (cos, sin),
                            image_context=img)["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        got = np.asarray(block.apply({"params": params}, x, ctx, temb, (cos, sin),
                                     image_context=img))

        x, ctx, img, temb = (np.asarray(a, np.float64) for a in (x, ctx, img, temb))
        cos, sin = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
        p = to_np(params)
        lora_scale = 8.0 / 4.0

        ada = p["scale_shift_table"] + temb  # (B, 6, D)
        shift_msa, scale_msa, gate_msa, c_shift, c_scale, c_gate = [
            ada[:, i][:, None] for i in range(6)
        ]

        def wan_attn(pp, q_in, kv_in, rope, image=None):
            q = np_dense(q_in, pp["to_q"], lora_scale)
            k = np_dense(kv_in, pp["to_k"], lora_scale)
            v = np_dense(kv_in, pp["to_v"], lora_scale)
            q = np_rms_norm(q, pp["norm_q"]["scale"])
            k = np_rms_norm(k, pp["norm_k"]["scale"])
            b, sq = q.shape[:2]
            skv = k.shape[1]
            q4 = q.reshape(b, sq, N, H)
            k4 = k.reshape(b, skv, N, H)
            v4 = v.reshape(b, skv, N, H)
            if rope:
                q4 = np_rope_per_head(q4, cos, sin)
                k4 = np_rope_per_head(k4, cos, sin)
            out = np_attention_4d(q4, k4, v4)
            if image is not None:
                ki = np_rms_norm(np_dense(image, pp["add_k_proj"], lora_scale),
                                 pp["norm_added_k"]["scale"]).reshape(b, -1, N, H)
                vi = np_dense(image, pp["add_v_proj"], lora_scale).reshape(b, -1, N, H)
                out = out + np_attention_4d(q4, ki, vi)
            return np_dense(out.reshape(b, sq, D), pp["to_out"], lora_scale)

        h = np_layer_norm(x) * (1.0 + scale_msa) + shift_msa
        x1 = x + wan_attn(p["attn1"], h, h, rope=True) * gate_msa
        h = np_layer_norm(x1, p["norm2"]["scale"], p["norm2"]["bias"])
        x2 = x1 + wan_attn(p["attn2"], h, ctx, rope=False, image=img)
        h = np_layer_norm(x2) * (1.0 + c_scale) + c_shift
        h = np_gelu_tanh(np_dense(h, p["ffn_net_0_proj"], lora_scale))
        h = np_dense(h, p["ffn_net_2"], lora_scale)
        want = x2 + h * c_gate

        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def np_silu(x):
    return x / (1.0 + np.exp(-x))


class TestCogVideoXBlock:
    def test_block_matches_numpy(self):
        """Reference math: diffusers CogVideoXBlock (joint text+vision token
        stream, LayerNormZero modulation from silu(temb) for BOTH streams,
        affine LayerNorm on per-head q/k, RoPE on vision tokens only with the
        text prefix unrotated, shared attention over the concatenated stream,
        gated residuals per stream)."""
        from finetrainers_tpu.models.cogvideox.transformer import CogVideoXBlock

        B, SV, ST, N, H, TE = 1, 9, 4, 2, 8, 12
        D = N * H
        block = CogVideoXBlock(dim=D, num_heads=N, head_dim=H, time_embed_dim=TE,
                               lora_rank=4, lora_alpha=8.0, dtype=jnp.float32)
        rng = jax.random.PRNGKey(2)
        hid = jax.random.normal(jax.random.fold_in(rng, 1), (B, SV, D), jnp.float32)
        enc = jax.random.normal(jax.random.fold_in(rng, 2), (B, ST, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 3), (B, TE), jnp.float32)
        ph = jax.random.uniform(jax.random.fold_in(rng, 4), (SV, H // 2)) * 6.0
        cos, sin = jnp.cos(ph), jnp.sin(ph)
        params = block.init(jax.random.fold_in(rng, 5), hid, enc, temb, (cos, sin))["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        got_h, got_e = block.apply({"params": params}, hid, enc, temb, (cos, sin))

        hid, enc, temb = (np.asarray(a, np.float64) for a in (hid, enc, temb))
        cos, sin = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
        p = to_np(params)
        ls = 8.0 / 4.0

        def norm_zero(pp, h_in, e_in):
            mod = np_dense(np_silu(temb), pp["linear"])
            shift, scale, gate, es, esc, eg = np.split(mod, 6, axis=-1)
            h = np_layer_norm(h_in) * (1 + scale[:, None]) + shift[:, None]
            e = np_layer_norm(e_in) * (1 + esc[:, None]) + es[:, None]
            return h, e, gate[:, None], eg[:, None]

        h, e, gate, eg = norm_zero(p["norm1"], hid, enc)
        x = np.concatenate([e, h], axis=1)
        q = np_dense(x, p["attn1_to_q"], ls).reshape(1, -1, N, H)
        k = np_dense(x, p["attn1_to_k"], ls).reshape(1, -1, N, H)
        v = np_dense(x, p["attn1_to_v"], ls).reshape(1, -1, N, H)
        q = np_layer_norm(q, p["attn1_norm_q"]["scale"], p["attn1_norm_q"]["bias"])
        k = np_layer_norm(k, p["attn1_norm_k"]["scale"], p["attn1_norm_k"]["bias"])
        q = np.concatenate([q[:, :ST], np_rope_per_head(q[:, ST:], cos, sin)], axis=1)
        k = np.concatenate([k[:, :ST], np_rope_per_head(k[:, ST:], cos, sin)], axis=1)
        attn = np_attention_4d(q, k, v).reshape(1, -1, D)
        attn = np_dense(attn, p["attn1_to_out"], ls)
        hid1 = hid + gate * attn[:, ST:]
        enc1 = enc + eg * attn[:, :ST]

        h, e, gate, eg = norm_zero(p["norm2"], hid1, enc1)
        x = np.concatenate([e, h], axis=1)
        x = np_gelu_tanh(np_dense(x, p["ff_net_0_proj"], ls))
        x = np_dense(x, p["ff_net_2"], ls)
        want_h = hid1 + gate * x[:, ST:]
        want_e = enc1 + eg * x[:, :ST]

        np.testing.assert_allclose(np.asarray(got_h), want_h, atol=ATOL, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(got_e), want_e, atol=ATOL, rtol=RTOL)


class TestFluxDualBlock:
    def test_block_matches_numpy(self):
        """Reference math: diffusers FluxTransformerBlock (dual-stream: separate
        img/txt AdaLayerNormZero from silu(temb), per-stream q/k/v with per-head
        RMSNorm, txt-prefix concatenated joint attention with RoPE over the
        whole stream, separate out projections and gated MLPs per stream)."""
        from finetrainers_tpu.models.flux.transformer import FluxDualBlock

        B, SI, ST, N, H = 1, 8, 4, 2, 8
        D = N * H
        block = FluxDualBlock(dim=D, num_heads=N, head_dim=H, mlp_ratio=2.0,
                              lora_rank=4, lora_alpha=8.0, dtype=jnp.float32)
        rng = jax.random.PRNGKey(3)
        img = jax.random.normal(jax.random.fold_in(rng, 1), (B, SI, D), jnp.float32)
        txt = jax.random.normal(jax.random.fold_in(rng, 2), (B, ST, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 3), (B, D), jnp.float32)
        ph = jax.random.uniform(jax.random.fold_in(rng, 4), (SI + ST, H // 2)) * 6.0
        cos, sin = jnp.cos(ph), jnp.sin(ph)
        params = block.init(jax.random.fold_in(rng, 5), img, txt, temb, (cos, sin))["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        got_img, got_txt = block.apply({"params": params}, img, txt, temb, (cos, sin))

        img, txt, temb = (np.asarray(a, np.float64) for a in (img, txt, temb))
        cos, sin = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
        p = to_np(params)
        ls = 8.0 / 4.0

        def ada_zero(pp):
            mod = np_dense(np_silu(temb), pp["linear"])
            return np.split(mod, 6, axis=-1)

        sh_i, sc_i, g_i, sh_im, sc_im, g_im = ada_zero(p["norm1"])
        sh_t, sc_t, g_t, sh_tm, sc_tm, g_tm = ada_zero(p["norm1_context"])
        img_n = np_layer_norm(img) * (1 + sc_i[:, None]) + sh_i[:, None]
        txt_n = np_layer_norm(txt) * (1 + sc_t[:, None]) + sh_t[:, None]

        def qkv(x, qn, kn, vn, nq, nk):
            q = np_dense(x, p[qn], ls).reshape(1, -1, N, H)
            k = np_dense(x, p[kn], ls).reshape(1, -1, N, H)
            v = np_dense(x, p[vn], ls).reshape(1, -1, N, H)
            return np_rms_norm(q, p[nq]["scale"]), np_rms_norm(k, p[nk]["scale"]), v

        qi, ki, vi = qkv(img_n, "attn_to_q", "attn_to_k", "attn_to_v", "attn_norm_q", "attn_norm_k")
        qt, kt, vt = qkv(txt_n, "attn_add_q_proj", "attn_add_k_proj", "attn_add_v_proj",
                         "attn_norm_added_q", "attn_norm_added_k")
        q = np_rope_per_head(np.concatenate([qt, qi], axis=1), cos, sin)
        k = np_rope_per_head(np.concatenate([kt, ki], axis=1), cos, sin)
        v = np.concatenate([vt, vi], axis=1)
        out = np_attention_4d(q, k, v).reshape(1, -1, D)
        img1 = img + g_i[:, None] * np_dense(out[:, ST:], p["attn_to_out"], ls)
        txt1 = txt + g_t[:, None] * np_dense(out[:, :ST], p["attn_to_add_out"], ls)

        im = np_layer_norm(img1) * (1 + sc_im[:, None]) + sh_im[:, None]
        im = np_dense(np_gelu_tanh(np_dense(im, p["ff_net_0_proj"], ls)), p["ff_net_2"], ls)
        want_img = img1 + g_im[:, None] * im
        tm = np_layer_norm(txt1) * (1 + sc_tm[:, None]) + sh_tm[:, None]
        tm = np_dense(np_gelu_tanh(np_dense(tm, p["ff_context_net_0_proj"], ls)), p["ff_context_net_2"], ls)
        want_txt = txt1 + g_tm[:, None] * tm

        np.testing.assert_allclose(np.asarray(got_img), want_img, atol=ATOL, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(got_txt), want_txt, atol=ATOL, rtol=RTOL)


class TestFluxSingleBlock:
    def test_block_matches_numpy(self):
        """Reference math: diffusers FluxSingleTransformerBlock (3-param adaLN,
        parallel attention + MLP branches over the same normed input, joint
        proj_out over concat([attn, mlp]); also HunyuanVideo's single block)."""
        from finetrainers_tpu.models.flux.transformer import FluxSingleBlock

        B, S, N, H = 1, 10, 2, 8
        D = N * H
        block = FluxSingleBlock(dim=D, num_heads=N, head_dim=H, mlp_ratio=2.0,
                                lora_rank=4, lora_alpha=8.0, dtype=jnp.float32)
        rng = jax.random.PRNGKey(4)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (B, S, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 2), (B, D), jnp.float32)
        ph = jax.random.uniform(jax.random.fold_in(rng, 3), (S, H // 2)) * 6.0
        cos, sin = jnp.cos(ph), jnp.sin(ph)
        params = block.init(jax.random.fold_in(rng, 4), x, temb, (cos, sin))["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        got = np.asarray(block.apply({"params": params}, x, temb, (cos, sin)))

        x, temb = np.asarray(x, np.float64), np.asarray(temb, np.float64)
        cos, sin = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
        p = to_np(params)
        ls = 8.0 / 4.0

        mod = np_dense(np_silu(temb), p["norm_linear"])
        shift, scale, gate = np.split(mod, 3, axis=-1)
        x_n = np_layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        q = np_rms_norm(np_dense(x_n, p["attn_to_q"], ls).reshape(1, S, N, H), p["attn_norm_q"]["scale"])
        k = np_rms_norm(np_dense(x_n, p["attn_to_k"], ls).reshape(1, S, N, H), p["attn_norm_k"]["scale"])
        v = np_dense(x_n, p["attn_to_v"], ls).reshape(1, S, N, H)
        q = np_rope_per_head(q, cos, sin)
        k = np_rope_per_head(k, cos, sin)
        attn = np_attention_4d(q, k, v).reshape(1, S, D)
        mlp = np_gelu_tanh(np_dense(x_n, p["proj_mlp"], ls))
        out = np_dense(np.concatenate([attn, mlp], axis=-1), p["proj_out"], ls)
        want = x + gate[:, None] * out

        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


class TestCogView4Block:
    def test_block_matches_numpy(self):
        """Reference math: diffusers CogView4TransformerBlock (12-way adaLN from
        silu(temb) covering both streams and both sublayers, affine per-head
        LayerNorm q/k, RoPE on vision tokens only, joint attention over
        [text, vision], gated residuals)."""
        from finetrainers_tpu.models.cogview4.transformer import CogView4Block

        B, SV, ST, N, H, TE = 1, 8, 4, 2, 8, 12
        D = N * H
        block = CogView4Block(dim=D, num_heads=N, head_dim=H, time_embed_dim=TE,
                              lora_rank=4, lora_alpha=8.0, dtype=jnp.float32)
        rng = jax.random.PRNGKey(5)
        hid = jax.random.normal(jax.random.fold_in(rng, 1), (B, SV, D), jnp.float32)
        enc = jax.random.normal(jax.random.fold_in(rng, 2), (B, ST, D), jnp.float32)
        temb = jax.random.normal(jax.random.fold_in(rng, 3), (B, TE), jnp.float32)
        ph = jax.random.uniform(jax.random.fold_in(rng, 4), (SV, H // 2)) * 6.0
        cos, sin = jnp.cos(ph), jnp.sin(ph)
        params = block.init(jax.random.fold_in(rng, 5), hid, enc, temb, (cos, sin))["params"]
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.fold_in(rng, hash(str(p)) % 2**30), v.shape) * 0.1
            if any(getattr(k, "key", None) == "lora_b" for k in p) else v,
            params,
        )
        got_h, got_e = block.apply({"params": params}, hid, enc, temb, (cos, sin))

        hid, enc, temb = (np.asarray(a, np.float64) for a in (hid, enc, temb))
        cos, sin = np.asarray(cos, np.float64), np.asarray(sin, np.float64)
        p = to_np(params)
        ls = 8.0 / 4.0

        mod = np_dense(np_silu(temb), p["adaln_linear"])
        (shift, scale, gate, es, esc, eg, shift2, scale2, gate2, es2, esc2, eg2) = np.split(mod, 12, axis=-1)

        h = np_layer_norm(hid) * (1 + scale[:, None]) + shift[:, None]
        e = np_layer_norm(enc) * (1 + esc[:, None]) + es[:, None]
        x = np.concatenate([e, h], axis=1)
        q = np_dense(x, p["attn1_to_q"], ls).reshape(1, -1, N, H)
        k = np_dense(x, p["attn1_to_k"], ls).reshape(1, -1, N, H)
        v = np_dense(x, p["attn1_to_v"], ls).reshape(1, -1, N, H)
        q = np_layer_norm(q, p["attn1_norm_q"]["scale"], p["attn1_norm_q"]["bias"])
        k = np_layer_norm(k, p["attn1_norm_k"]["scale"], p["attn1_norm_k"]["bias"])
        q = np.concatenate([q[:, :ST], np_rope_per_head(q[:, ST:], cos, sin)], axis=1)
        k = np.concatenate([k[:, :ST], np_rope_per_head(k[:, ST:], cos, sin)], axis=1)
        attn = np_dense(np_attention_4d(q, k, v).reshape(1, -1, D), p["attn1_to_out"], ls)
        enc1 = enc + eg[:, None] * attn[:, :ST]
        hid1 = hid + gate[:, None] * attn[:, ST:]

        h = np_layer_norm(hid1) * (1 + scale2[:, None]) + shift2[:, None]
        e = np_layer_norm(enc1) * (1 + esc2[:, None]) + es2[:, None]
        x = np.concatenate([e, h], axis=1)
        x = np_dense(np_gelu_tanh(np_dense(x, p["ff_net_0_proj"], ls)), p["ff_net_2"], ls)
        want_e = enc1 + eg2[:, None] * x[:, :ST]
        want_h = hid1 + gate2[:, None] * x[:, ST:]

        np.testing.assert_allclose(np.asarray(got_h), want_h, atol=ATOL, rtol=RTOL)
        np.testing.assert_allclose(np.asarray(got_e), want_e, atol=ATOL, rtol=RTOL)
