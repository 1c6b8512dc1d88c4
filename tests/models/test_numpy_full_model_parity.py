"""Independent NumPy re-implementations of the FULL forward pass of every
transformer family — embeddings, RoPE tables, every block, final norm + head —
not just one block (that is `test_numpy_block_parity.py`).

Each forward is written here directly from the reference architecture's
equations (diffusers models the reference trains through — see each test's
docstring for the reference spec file), with NO flax/jax in the compute path;
the repo's flax model must match on random weights at tiny real-class configs.
This raises the offline parity ceiling from one-block to whole-model
(VERDICT r3 "Next round" item 4): patchify/unpatchify orders, positional
tables, micro-conditioning embeddings, stream concatenation order, masked
cross-attention, and the output head all get covered.
"""

import math
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from test_numpy_block_parity import (  # noqa: E402
    np_dense,
    np_gelu_tanh,
    np_layer_norm,
    np_rms_norm,
    np_rope_interleaved,
    np_softmax,
    to_np,
)

ATOL, RTOL = 5e-4, 5e-4


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def np_sinusoidal(t, dim, max_period=10000.0, flip_sin_to_cos=True, downscale_freq_shift=0.0):
    """models/layers.py sinusoidal_timestep_embedding (DDPM convention)."""
    t = np.asarray(t, np.float64).reshape(-1)
    half = dim // 2
    exponent = -math.log(max_period) * np.arange(half, dtype=np.float64)
    exponent = exponent / (half - downscale_freq_shift)
    emb = np.exp(exponent)[None, :] * t[:, None]
    sin, cos = np.sin(emb), np.cos(emb)
    out = np.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = np.pad(out, ((0, 0), (0, 1)))
    return out


def np_axial_rope_freqs(head_dim, sizes, fractions, theta=10000.0):
    """models/layers.py axial_rope_freqs — exact slot allocation, row-major grid."""
    total = head_dim // 2
    slots = [max(int(total * f), 1) for f in fractions[:-1]]
    slots.append(total - sum(slots))
    parts = []
    for ai, (size, n_slots) in enumerate(zip(sizes, slots)):
        inv = 1.0 / (theta ** (np.arange(n_slots, dtype=np.float64) / max(n_slots, 1)))
        freq = np.arange(size, dtype=np.float64)[:, None] * inv[None, :]
        reps_before = int(np.prod(sizes[:ai])) if ai else 1
        reps_after = int(np.prod(sizes[ai + 1:])) if ai + 1 < len(sizes) else 1
        freq = np.tile(np.repeat(freq, reps_after, axis=0), (reps_before, 1))
        parts.append(freq)
    freqs = np.concatenate(parts, axis=-1)
    return np.cos(freqs), np.sin(freqs)


def np_rope_half(x, cos, sin):
    """x (B,S,N,H); cos/sin (S, H/2); interleaved-pair (complex) rotation."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    out = np.empty_like(x)
    out[..., 0::2] = x1 * c - x2 * s
    out[..., 1::2] = x2 * c + x1 * s
    return out


def np_attn_heads(q, k, v, kv_lens=None, scale=None):
    """q (B,Sq,N,H), k/v (B,Skv,N,H) -> (B,Sq,N,H); optional (B,) kv_lens mask."""
    h = q.shape[-1]
    scale = scale if scale is not None else h**-0.5
    logits = np.einsum("bqnh,bknh->bnqk", q * scale, k)
    if kv_lens is not None:
        col = np.arange(k.shape[1])
        mask = col[None, :] < np.asarray(kv_lens).reshape(-1, 1)  # (B, Skv)
        logits = np.where(mask[:, None, None, :], logits, -1e30)
    probs = np_softmax(logits)
    return np.einsum("bnqk,bknh->bqnh", probs, v)


def np_attn_inner(q, k, v, num_heads, kv_lens=None, scale=None):
    """(B,S,D) inner-dim layout wrapper around np_attn_heads."""
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    out = np_attn_heads(
        q.reshape(b, sq, num_heads, hd), k.reshape(b, skv, num_heads, hd),
        v.reshape(b, skv, num_heads, hd), kv_lens=kv_lens, scale=scale,
    )
    return out.reshape(b, sq, d)


def randomize_init(module, rng, *args, **kwargs):
    """init + re-randomize every param (biases/scales are zeros/ones by default,
    which would hide transpose/order bugs)."""
    params = module.init(rng, *args, **kwargs)["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for i, (path, leaf) in enumerate(flat[0]):
        key = jax.random.fold_in(rng, 1000 + i)
        leaves.append(jax.random.normal(key, leaf.shape, jnp.float32) * 0.15)
    params = jax.tree_util.tree_unflatten(flat[1], leaves)
    return params


# ---------------------------------------------------------------------- LTX


class TestLTXFullModel:
    def test_full_forward_matches_numpy(self):
        """Reference: diffusers LTXVideoTransformer3DModel as trained by
        `/root/reference/finetrainers/models/ltx_video/base_specification.py`
        (packed 1x1x1 tokens, AdaLayerNormSingle, caption projection, 3D RoPE
        over the full inner dim, RMS norm_out + 2-entry scale_shift_table)."""
        from finetrainers_tpu.models.ltx_video.transformer import (
            LTXVideoTransformer3DModel, pack_latents,
        )

        B, C, F, H, W, L = 1, 6, 2, 4, 4, 7
        N, HD, LAYERS = 2, 8, 2
        D = N * HD
        model = LTXVideoTransformer3DModel(
            in_channels=C, out_channels=C, num_attention_heads=N, attention_head_dim=HD,
            cross_attention_dim=D, num_layers=LAYERS, caption_channels=10,
            dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(7)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, F, H, W), jnp.float32)
        packed = pack_latents(latents)
        captions = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, 10), jnp.float32)
        timestep = jnp.asarray([347.0])
        enc_mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0]], jnp.bool_)
        scale_factors = (1.0, 32.0, 32.0)

        params = randomize_init(model, rng, packed, captions, timestep, enc_mask,
                                num_frames=F, height=H, width=W,
                                rope_interpolation_scale=scale_factors)
        got = model.apply({"params": params}, packed, captions, timestep, enc_mask,
                          num_frames=F, height=H, width=W,
                          rope_interpolation_scale=scale_factors)

        p = to_np(params)
        x_np = np.asarray(packed, np.float64)
        cap_np = np.asarray(captions, np.float64)
        t_np = np.asarray(timestep, np.float64)
        kv_lens = np.asarray(enc_mask).sum(axis=1)

        # pack order check: row-major (f, h, w) over channels-last patches
        lat = np.asarray(latents, np.float64)
        expect_pack = lat.reshape(B, C, F, H, W).transpose(0, 2, 3, 4, 1).reshape(B, F * H * W, C)
        np.testing.assert_allclose(x_np, expect_pack, atol=0, rtol=0)

        x = np_dense(x_np, p["proj_in"])

        # AdaLayerNormSingle
        te = p["time_embed"]
        emb = np_sinusoidal(t_np, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        emb = np_silu(np_dense(emb, te["timestep_embedder_linear_1"]))
        embedded_t = np_dense(emb, te["timestep_embedder_linear_2"])  # (B, D)
        temb = np_dense(np_silu(embedded_t), te["linear"])  # (B, 6D)

        ctx = np_dense(cap_np, p["caption_projection_linear_1"])
        ctx = np_gelu_tanh(ctx)
        ctx = np_dense(ctx, p["caption_projection_linear_2"])

        # 3D RoPE table (diffusers LTXVideoRotaryPosEmbed semantics)
        S = F * H * W
        gf, gh, gw = np.meshgrid(np.arange(F, dtype=np.float64), np.arange(H, dtype=np.float64),
                                 np.arange(W, dtype=np.float64), indexing="ij")
        grid = np.stack([gf.reshape(-1), gh.reshape(-1), gw.reshape(-1)], axis=-1)
        grid = grid * np.asarray([scale_factors[0] * 1 / 20, scale_factors[1] * 1 / 2048,
                                  scale_factors[2] * 1 / 2048])[None, :]
        n = D // 6
        fr = 10000.0 ** np.linspace(0.0, 1.0, n) * (np.pi / 2.0)
        fr = fr[None, None, :] * (grid[:, :, None] * 2.0 - 1.0)  # (S, 3, n)
        fr = np.swapaxes(fr, -1, -2).reshape(S, -1)
        cos = np.repeat(np.cos(fr), 2, axis=-1)
        sin = np.repeat(np.sin(fr), 2, axis=-1)
        pad = D % 6
        if pad:
            cos = np.concatenate([np.ones((S, pad)), cos], axis=-1)
            sin = np.concatenate([np.zeros((S, pad)), sin], axis=-1)

        def attn(pp, q_in, kv_in, rope, kv_lens=None):
            q = np_dense(q_in, pp["to_q"])
            k = np_dense(kv_in, pp["to_k"])
            v = np_dense(kv_in, pp["to_v"])
            q = np_rms_norm(q, pp["norm_q"]["scale"])
            k = np_rms_norm(k, pp["norm_k"]["scale"])
            if rope:
                q = np_rope_interleaved(q, cos[None], sin[None])
                k = np_rope_interleaved(k, cos[None], sin[None])
            o = np_attn_inner(q, k, v, N, kv_lens=kv_lens)
            return np_dense(o, pp["to_out"])

        for i in range(LAYERS):
            bp = p[f"transformer_blocks_{i}"]
            ada = bp["scale_shift_table"][None, None] + temb.reshape(B, -1, 6, D)
            sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [ada[:, :, j] for j in range(6)]
            h = np_rms_norm(x) * (1.0 + sc_msa) + sh_msa
            x = x + attn(bp["attn1"], h, h, rope=True) * g_msa
            x = x + attn(bp["attn2"], x, ctx, rope=False, kv_lens=kv_lens)
            h = np_rms_norm(x) * (1.0 + sc_mlp) + sh_mlp
            h = np_gelu_tanh(np_dense(h, bp["ff_net_0_proj"]))
            x = x + np_dense(h, bp["ff_net_2"]) * g_mlp

        table = p["scale_shift_table"]  # (2, D)
        emb_t = embedded_t.reshape(B, -1, D)
        shift = table[0][None, None] + emb_t
        scale = table[1][None, None] + emb_t
        x = np_rms_norm(x) * (1.0 + scale) + shift
        want = np_dense(x, p["proj_out"])

        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)


# ---------------------------------------------------------------------- Wan


class TestWanFullModel:
    def test_full_forward_matches_numpy_i2v(self):
        """Reference: diffusers WanTransformer3DModel as trained by
        `/root/reference/finetrainers/models/wan/base_specification.py` (3D
        patch embed (1,2,2), condition embedder with text + I2V image branch,
        per-head axial RoPE, (1,6,dim) scale_shift_table blocks, unpatchify)."""
        from finetrainers_tpu.models.wan.transformer import WanTransformer3DModel

        B, C, F, H, W, L, LI = 1, 4, 2, 4, 4, 5, 3
        N, HD, LAYERS, FFN = 2, 8, 2, 24
        D = N * HD
        model = WanTransformer3DModel(
            in_channels=C, out_channels=C, num_attention_heads=N, attention_head_dim=HD,
            num_layers=LAYERS, ffn_dim=FFN, text_dim=12, freq_dim=32, image_dim=10,
            dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(11)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, F, H, W), jnp.float32)
        text = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, 12), jnp.float32)
        image = jax.random.normal(jax.random.fold_in(rng, 3), (B, LI, 10), jnp.float32)
        timestep = jnp.asarray([512.0])
        enc_mask = jnp.asarray([[1, 1, 1, 1, 0]], jnp.bool_)

        params = randomize_init(model, rng, latents, text, timestep, image, enc_mask)
        got = model.apply({"params": params}, latents, text, timestep, image, enc_mask)

        p = to_np(params)
        lat = np.asarray(latents, np.float64)
        text_np = np.asarray(text, np.float64)
        img_np = np.asarray(image, np.float64)
        t_np = np.asarray(timestep, np.float64)
        kv_lens = np.asarray(enc_mask).sum(axis=1)

        pt, ph, pw = 1, 2, 2
        pf_, phh, pww = F // pt, H // ph, W // pw
        x = lat.reshape(B, C, pf_, pt, phh, ph, pww, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, pf_ * phh * pww, C * pt * ph * pw)
        x = np_dense(x, p["patch_embedding"])

        emb = np_sinusoidal(t_np, 32)
        temb = np_dense(emb, p["condition_embedder_time_embedder_linear_1"])
        temb = np_dense(np_silu(temb), p["condition_embedder_time_embedder_linear_2"])  # (B, D)
        temb_proj = np_dense(np_silu(temb), p["condition_embedder_time_proj"]).reshape(B, 6, D)

        ctx = np_dense(text_np, p["condition_embedder_text_embedder_linear_1"])
        ctx = np_dense(np_gelu_tanh(ctx), p["condition_embedder_text_embedder_linear_2"])

        icp = p["condition_embedder_image_embedder_norm1"]
        ic = np_layer_norm(img_np, icp["scale"], icp["bias"])
        ic = np_dense(ic, p["condition_embedder_image_embedder_ff_1"])
        ic = np_dense(np_gelu_tanh(ic), p["condition_embedder_image_embedder_ff_2"])
        icp2 = p["condition_embedder_image_embedder_norm2"]
        image_ctx = np_layer_norm(ic, icp2["scale"], icp2["bias"])

        cos, sin = np_axial_rope_freqs(HD, (pf_, phh, pww), (1 / 3, 1 / 3, 1 / 3))

        def attn(pp, q_in, kv_in, rope, kv_lens=None, image_ctx=None):
            q = np_rms_norm(np_dense(q_in, pp["to_q"]), pp["norm_q"]["scale"])
            k = np_rms_norm(np_dense(kv_in, pp["to_k"]), pp["norm_k"]["scale"])
            v = np_dense(kv_in, pp["to_v"])
            b, sq, d = q.shape
            qh = q.reshape(b, sq, N, HD)
            kh = k.reshape(b, kv_in.shape[1], N, HD)
            vh = v.reshape(b, kv_in.shape[1], N, HD)
            if rope:
                qh = np_rope_half(qh, cos, sin)
                kh = np_rope_half(kh, cos, sin)
            out = np_attn_heads(qh, kh, vh, kv_lens=kv_lens).reshape(b, sq, d)
            if image_ctx is not None:
                ki = np_rms_norm(np_dense(image_ctx, pp["add_k_proj"]), pp["norm_added_k"]["scale"])
                vi = np_dense(image_ctx, pp["add_v_proj"])
                si = image_ctx.shape[1]
                out = out + np_attn_heads(
                    qh, ki.reshape(b, si, N, HD), vi.reshape(b, si, N, HD)
                ).reshape(b, sq, d)
            return np_dense(out, pp["to_out"])

        for i in range(LAYERS):
            bp = p[f"blocks_{i}"]
            ada = bp["scale_shift_table"] + temb_proj  # (B, 6, D)
            sh_msa, sc_msa, g_msa, c_sh, c_sc, c_g = [ada[:, j][:, None] for j in range(6)]
            h = np_layer_norm(x) * (1.0 + sc_msa) + sh_msa
            x = x + attn(bp["attn1"], h, h, rope=True) * g_msa
            n2 = bp["norm2"]
            h = np_layer_norm(x, n2["scale"], n2["bias"])
            x = x + attn(bp["attn2"], h, ctx, rope=False, kv_lens=kv_lens, image_ctx=image_ctx)
            h = np_layer_norm(x) * (1.0 + c_sc) + c_sh
            h = np_gelu_tanh(np_dense(h, bp["ffn_net_0_proj"]))
            x = x + np_dense(h, bp["ffn_net_2"]) * c_g

        mod = p["scale_shift_table"] + temb[:, None]  # (B, 2, D)
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        x = np_layer_norm(x) * (1.0 + scale) + shift
        x = np_dense(x, p["proj_out"])

        x = x.reshape(B, pf_, phh, pww, C, pt, ph, pw)
        want = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(B, C, F, H, W)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)


# ----------------------------------------------------------------- CogVideoX


class TestCogVideoXFullModel:
    def _run(self, use_rotary):
        from finetrainers_tpu.models.cogvideox.transformer import CogVideoXTransformer3DModel

        B, F, C, H, W, L = 1, 2, 4, 4, 4, 5
        N, HD, LAYERS, TED = 2, 8, 2, 12
        D = N * HD
        model = CogVideoXTransformer3DModel(
            in_channels=C, out_channels=C, patch_size=2, num_attention_heads=N,
            attention_head_dim=HD, num_layers=LAYERS, text_embed_dim=12, time_embed_dim=TED,
            max_text_seq_length=L, sample_frames=4, sample_height=4, sample_width=4,
            use_rotary_positional_embeddings=use_rotary,
            use_learned_positional_embeddings=not use_rotary,
            ofs_embed_dim=8 if use_rotary else None,
            dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(13)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, F, C, H, W), jnp.float32)
        text = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, 12), jnp.float32)
        timestep = jnp.asarray([101.0])
        ofs = jnp.asarray([2.0]) if use_rotary else None

        params = randomize_init(model, rng, latents, text, timestep, ofs)
        got = model.apply({"params": params}, latents, text, timestep, ofs)
        return params, latents, text, timestep, ofs, got, (B, F, C, H, W, L, N, HD, LAYERS, D)

    def _numpy_forward(self, params, latents, text, timestep, ofs, dims, use_rotary):
        B, F, C, H, W, L, N, HD, LAYERS, D = dims
        p = to_np(params)
        lat = np.asarray(latents, np.float64)
        text_np = np.asarray(text, np.float64)
        t_np = np.asarray(timestep, np.float64)

        pp_, pt = 2, 1
        pf, phh, pww = F // pt, H // pp_, W // pp_
        x = lat.reshape(B, pf, pt, C, phh, pp_, pww, pp_)
        x = x.transpose(0, 1, 4, 6, 2, 3, 5, 7).reshape(B, pf * phh * pww, pt * C * pp_ * pp_)
        x = np_dense(x, p["patch_embed_proj"])
        ctx = np_dense(text_np, p["patch_embed_text_proj"])

        if not use_rotary:
            pos = p["pos_embedding"]  # (1, max_tokens, D)
            ctx = ctx + pos[:, :L]
            x = x + pos[:, L:L + x.shape[1]]

        t_emb = np_sinusoidal(t_np, D, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = np_dense(t_emb, p["time_embedding_linear_1"])
        temb = np_dense(np_silu(temb), p["time_embedding_linear_2"])
        if ofs is not None:
            o_emb = np_sinusoidal(np.asarray(ofs, np.float64), 8,
                                  flip_sin_to_cos=True, downscale_freq_shift=0.0)
            oe = np_dense(o_emb, p["ofs_embedding_linear_1"])
            temb = temb + np_dense(np_silu(oe), p["ofs_embedding_linear_2"])

        if use_rotary:
            cos, sin = np_axial_rope_freqs(HD, (pf, phh, pww), (0.25, 0.375, 0.375))
            # text prefix rows are identity rotations
            cos = np.concatenate([np.ones((L, cos.shape[1])), cos], axis=0)
            sin = np.concatenate([np.zeros((L, sin.shape[1])), sin], axis=0)

        def ln_qk(y, pp):
            # per-head LayerNorm with affine scale+bias over head_dim
            return np_layer_norm(y, pp["scale"], pp["bias"])

        for i in range(LAYERS):
            bp = p[f"transformer_blocks_{i}"]
            for half, names in ((0, ("norm1", "attn1")), (1, ("norm2", "ff"))):
                nz = bp[names[0]]
                mod = np_dense(np_silu(temb), nz["linear"])
                sh, sc, g, esh, esc, eg = np.split(mod, 6, axis=-1)
                h = np_layer_norm(x)  # affine-free LN + adaLN modulation
                e = np_layer_norm(ctx)
                h = h * (1 + sc[:, None]) + sh[:, None]
                e = e * (1 + esc[:, None]) + esh[:, None]
                joint = np.concatenate([e, h], axis=1)
                if half == 0:
                    S = joint.shape[1]
                    q = np_dense(joint, bp["attn1_to_q"]).reshape(B, S, N, HD)
                    k = np_dense(joint, bp["attn1_to_k"]).reshape(B, S, N, HD)
                    v = np_dense(joint, bp["attn1_to_v"]).reshape(B, S, N, HD)
                    q = ln_qk(q, bp["attn1_norm_q"])
                    k = ln_qk(k, bp["attn1_norm_k"])
                    if use_rotary:
                        q = np_rope_half(q, cos, sin)
                        k = np_rope_half(k, cos, sin)
                    attn = np_attn_heads(q, k, v).reshape(B, S, D)
                    attn = np_dense(attn, bp["attn1_to_out"])
                    ctx = ctx + eg[:, None] * attn[:, :L]
                    x = x + g[:, None] * attn[:, L:]
                else:
                    y = np_gelu_tanh(np_dense(joint, bp["ff_net_0_proj"]))
                    y = np_dense(y, bp["ff_net_2"])
                    ctx = ctx + eg[:, None] * y[:, :L]
                    x = x + g[:, None] * y[:, L:]

        full = np.concatenate([ctx, x], axis=1)
        nf = p["norm_final"]
        full = np_layer_norm(full, nf["scale"], nf["bias"])
        x = full[:, L:]

        mod = np_dense(np_silu(temb), p["norm_out_linear"])
        shift, scale = np.split(mod, 2, axis=-1)
        x = np_layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        x = np_dense(x, p["proj_out"])

        x = x.reshape(B, pf, phh, pww, pt, C, pp_, pp_)
        return x.transpose(0, 1, 4, 5, 2, 6, 3, 7).reshape(B, F, C, H, W)

    def test_full_forward_matches_numpy_rotary_5b(self):
        """Reference: diffusers CogVideoXTransformer3DModel (5B config: 3D RoPE
        with text-identity prefix, ofs embedding for 1.5) as trained by
        `/root/reference/finetrainers/models/cogvideox/base_specification.py`."""
        params, latents, text, timestep, ofs, got, dims = self._run(use_rotary=True)
        want = self._numpy_forward(params, latents, text, timestep, ofs, dims, use_rotary=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)

    def test_full_forward_matches_numpy_learned_pos_2b(self):
        """2B config: learned positional embeddings sliced text-first."""
        params, latents, text, timestep, ofs, got, dims = self._run(use_rotary=False)
        want = self._numpy_forward(params, latents, text, timestep, ofs, dims, use_rotary=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)


# --------------------------------------------------------------------- Flux


def np_flux_rope(ids, axes_dims, theta=10000.0):
    parts = []
    for i, adim in enumerate(axes_dims):
        inv = 1.0 / (theta ** (np.arange(0, adim, 2, dtype=np.float64) / adim))
        parts.append(ids[:, i: i + 1] * inv[None, :])
    freqs = np.concatenate(parts, axis=-1)
    return np.cos(freqs), np.sin(freqs)


def np_flux_dual_block(bp, img, txt, temb, cos, sin, N, HD, D):
    mod_i = np_dense(np_silu(temb), bp["norm1"]["linear"])
    sh_i, sc_i, g_i, sh_im, sc_im, g_im = np.split(mod_i, 6, axis=-1)
    mod_t = np_dense(np_silu(temb), bp["norm1_context"]["linear"])
    sh_t, sc_t, g_t, sh_tm, sc_tm, g_tm = np.split(mod_t, 6, axis=-1)
    B, si = img.shape[:2]
    st = txt.shape[1]

    img_n = np_layer_norm(img) * (1 + sc_i[:, None]) + sh_i[:, None]
    txt_n = np_layer_norm(txt) * (1 + sc_t[:, None]) + sh_t[:, None]

    def qkv(y, qn, kn, vn, nq, nk):
        q = np_dense(y, bp[qn]).reshape(B, -1, N, HD)
        k = np_dense(y, bp[kn]).reshape(B, -1, N, HD)
        v = np_dense(y, bp[vn]).reshape(B, -1, N, HD)
        q = np_rms_norm(q, bp[nq]["scale"])
        k = np_rms_norm(k, bp[nk]["scale"])
        return q, k, v

    qi, ki, vi = qkv(img_n, "attn_to_q", "attn_to_k", "attn_to_v", "attn_norm_q", "attn_norm_k")
    qt, kt, vt = qkv(txt_n, "attn_add_q_proj", "attn_add_k_proj", "attn_add_v_proj",
                     "attn_norm_added_q", "attn_norm_added_k")
    q = np.concatenate([qt, qi], axis=1)
    k = np.concatenate([kt, ki], axis=1)
    v = np.concatenate([vt, vi], axis=1)
    q = np_rope_half(q, cos, sin)
    k = np_rope_half(k, cos, sin)
    out = np_attn_heads(q, k, v).reshape(B, st + si, D)
    img = img + g_i[:, None] * np_dense(out[:, st:], bp["attn_to_out"])
    txt = txt + g_t[:, None] * np_dense(out[:, :st], bp["attn_to_add_out"])

    img_m = np_layer_norm(img) * (1 + sc_im[:, None]) + sh_im[:, None]
    img_m = np_gelu_tanh(np_dense(img_m, bp["ff_net_0_proj"]))
    img = img + g_im[:, None] * np_dense(img_m, bp["ff_net_2"])
    txt_m = np_layer_norm(txt) * (1 + sc_tm[:, None]) + sh_tm[:, None]
    txt_m = np_gelu_tanh(np_dense(txt_m, bp["ff_context_net_0_proj"]))
    txt = txt + g_tm[:, None] * np_dense(txt_m, bp["ff_context_net_2"])
    return img, txt


def np_flux_single_block(bp, x, temb, cos, sin, N, HD, D):
    B, S = x.shape[:2]
    mod = np_dense(np_silu(temb), bp["norm_linear"])
    shift, scale, gate = np.split(mod, 3, axis=-1)
    x_n = np_layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
    q = np_rms_norm(np_dense(x_n, bp["attn_to_q"]).reshape(B, S, N, HD), bp["attn_norm_q"]["scale"])
    k = np_rms_norm(np_dense(x_n, bp["attn_to_k"]).reshape(B, S, N, HD), bp["attn_norm_k"]["scale"])
    v = np_dense(x_n, bp["attn_to_v"]).reshape(B, S, N, HD)
    q = np_rope_half(q, cos, sin)
    k = np_rope_half(k, cos, sin)
    attn = np_attn_heads(q, k, v).reshape(B, S, D)
    mlp = np_gelu_tanh(np_dense(x_n, bp["proj_mlp"]))
    out = np_dense(np.concatenate([attn, mlp], axis=-1), bp["proj_out"])
    return x + gate[:, None] * out


class TestFluxFullModel:
    def test_full_forward_matches_numpy(self):
        """Reference: diffusers FluxTransformer2DModel as trained by
        `/root/reference/finetrainers/models/flux/base_specification.py`
        (packed 2x2 latents, guidance + CLIP pooled conditioning, txt-first
        joint stream, 19+38 dual/single blocks, AdaLayerNormContinuous out)."""
        from finetrainers_tpu.models.flux.transformer import (
            FluxTransformer2DModel, pack_flux_latents, prepare_latent_image_ids,
        )

        B, C, H, W, LT = 1, 4, 4, 4, 3
        N, HD = 2, 8
        D = N * HD
        model = FluxTransformer2DModel(
            in_channels=C * 4, num_layers=2, num_single_layers=2, num_attention_heads=N,
            attention_head_dim=HD, pooled_projection_dim=6, joint_attention_dim=8,
            guidance_embeds=True, axes_dims_rope=(4, 2, 2), dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(17)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, H, W), jnp.float32)
        packed = pack_flux_latents(latents)
        txt = jax.random.normal(jax.random.fold_in(rng, 2), (B, LT, 8), jnp.float32)
        pooled = jax.random.normal(jax.random.fold_in(rng, 3), (B, 6), jnp.float32)
        timestep = jnp.asarray([417.0])
        guidance = jnp.asarray([3500.0])
        img_ids = prepare_latent_image_ids(H, W)
        txt_ids = jnp.zeros((LT, 3))

        params = randomize_init(model, rng, packed, txt, pooled, timestep, img_ids, txt_ids, guidance)
        got = model.apply({"params": params}, packed, txt, pooled, timestep, img_ids, txt_ids, guidance)

        p = to_np(params)
        # pack order check (FluxPipeline._pack_latents)
        lat = np.asarray(latents, np.float64)
        ep = lat.reshape(B, C, H // 2, 2, W // 2, 2).transpose(0, 2, 4, 1, 3, 5).reshape(B, 4, C * 4)
        np.testing.assert_allclose(np.asarray(packed), ep, atol=0, rtol=0)

        img = np_dense(np.asarray(packed, np.float64), p["x_embedder"])
        txt_e = np_dense(np.asarray(txt, np.float64), p["context_embedder"])

        t_emb = np_sinusoidal(np.asarray(timestep), 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        temb = np_dense(t_emb, p["timestep_embedder_linear_1"])
        temb = np_dense(np_silu(temb), p["timestep_embedder_linear_2"])
        g_emb = np_sinusoidal(np.asarray(guidance), 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        ge = np_dense(g_emb, p["guidance_embedder_linear_1"])
        temb = temb + np_dense(np_silu(ge), p["guidance_embedder_linear_2"])
        pe = np_dense(np.asarray(pooled, np.float64), p["text_embedder_linear_1"])
        temb = temb + np_dense(np_silu(pe), p["text_embedder_linear_2"])

        ids = np.concatenate([np.asarray(txt_ids, np.float64), np.asarray(img_ids, np.float64)], axis=0)
        cos, sin = np_flux_rope(ids, (4, 2, 2))

        for i in range(2):
            img, txt_e = np_flux_dual_block(p[f"transformer_blocks_{i}"], img, txt_e, temb,
                                            cos, sin, N, HD, D)
        x = np.concatenate([txt_e, img], axis=1)
        for i in range(2):
            x = np_flux_single_block(p[f"single_transformer_blocks_{i}"], x, temb, cos, sin, N, HD, D)
        img = x[:, LT:]

        mod = np_dense(np_silu(temb), p["norm_out_linear"])
        scale, shift = np.split(mod, 2, axis=-1)
        img = np_layer_norm(img) * (1 + scale[:, None]) + shift[:, None]
        want = np_dense(img, p["proj_out"])

        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)


# ------------------------------------------------------------- HunyuanVideo


class TestHunyuanVideoFullModel:
    def test_full_forward_matches_numpy(self):
        """Reference: diffusers HunyuanVideoTransformer3DModel as trained by
        `/root/reference/finetrainers/models/hunyuan_video/base_specification.py`
        (token refiner over Llama states with masked mean-pool conditioning,
        guidance + CLIP pooled temb, Flux-style dual+single blocks, 3D RoPE)."""
        from finetrainers_tpu.models.hunyuan_video.transformer import (
            HunyuanVideoTransformer3DModel,
        )

        B, C, F, H, W, L = 1, 4, 2, 4, 4, 5
        N, HD = 2, 8
        D = N * HD
        model = HunyuanVideoTransformer3DModel(
            in_channels=C, out_channels=C, num_attention_heads=N, attention_head_dim=HD,
            num_layers=2, num_single_layers=2, num_refiner_layers=2, text_embed_dim=12,
            pooled_projection_dim=6, guidance_embeds=True, rope_axes_dim=(4, 2, 2),
            dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(19)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, F, H, W), jnp.float32)
        text = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, 12), jnp.float32)
        pooled = jax.random.normal(jax.random.fold_in(rng, 3), (B, 6), jnp.float32)
        timestep = jnp.asarray([256.0])
        enc_mask = jnp.asarray([[1, 1, 1, 1, 0]], jnp.bool_)
        guidance = jnp.asarray([6000.0])

        params = randomize_init(model, rng, latents, text, timestep, pooled, enc_mask, guidance)
        got = model.apply({"params": params}, latents, text, timestep, pooled, enc_mask, guidance)

        p = to_np(params)
        lat = np.asarray(latents, np.float64)
        kv_lens = np.asarray(enc_mask).sum(axis=1)

        pp_, pt = 2, 1
        pf, phh, pww = F // pt, H // pp_, W // pp_
        x = lat.reshape(B, C, pf, pt, phh, pp_, pww, pp_)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, pf * phh * pww, C * pt * pp_ * pp_)
        x = np_dense(x, p["x_embedder"])

        t_emb = np_sinusoidal(np.asarray(timestep), 256)
        temb = np_dense(t_emb, p["timestep_embedder_linear_1"])
        temb = np_dense(np_silu(temb), p["timestep_embedder_linear_2"])
        g_emb = np_sinusoidal(np.asarray(guidance), 256)
        ge = np_dense(g_emb, p["guidance_embedder_linear_1"])
        temb = temb + np_dense(np_silu(ge), p["guidance_embedder_linear_2"])
        pe = np_dense(np.asarray(pooled, np.float64), p["text_embedder_linear_1"])
        temb = temb + np_dense(np_silu(pe), p["text_embedder_linear_2"])

        # token refiner
        txt = np_dense(np.asarray(text, np.float64), p["context_embedder_proj_in"])
        rc = np_dense(np_sinusoidal(np.asarray(timestep), 256), p["refiner_t_embedder_linear_1"])
        rc = np_dense(np_silu(rc), p["refiner_t_embedder_linear_2"])
        token_mask = (np.arange(L)[None, :] < kv_lens[:, None]).astype(np.float64)[..., None]
        ctx_pool = (txt * token_mask).sum(axis=1) / np.maximum(token_mask.sum(axis=1), 1.0)
        rp = np_dense(ctx_pool, p["refiner_c_embedder_linear_1"])
        rp = np_dense(np_silu(rp), p["refiner_c_embedder_linear_2"])
        cond = rc + rp
        for i in range(2):
            bp = p[f"refiner_blocks_{i}"]
            mod = np_dense(np_silu(cond), bp["norm_out_linear"])
            g_attn, g_mlp = np.split(mod, 2, axis=-1)
            h = np_layer_norm(txt, bp["norm1"]["scale"], bp["norm1"]["bias"])
            q = np_dense(h, bp["attn_to_q"])
            k = np_dense(h, bp["attn_to_k"])
            v = np_dense(h, bp["attn_to_v"])
            attn = np_attn_inner(q, k, v, N, kv_lens=kv_lens)
            txt = txt + np_dense(attn, bp["attn_to_out"]) * g_attn[:, None]
            h = np_layer_norm(txt, bp["norm2"]["scale"], bp["norm2"]["bias"])
            h = np_silu(np_dense(h, bp["ff_net_0_proj"]))
            txt = txt + np_dense(h, bp["ff_net_2"]) * g_mlp[:, None]

        # rope ids: text rows are zeros -> identity rotation
        grid_f = np.repeat(np.arange(pf), phh * pww)
        grid_h = np.tile(np.repeat(np.arange(phh), pww), pf)
        grid_w = np.tile(np.arange(pww), pf * phh)
        img_ids = np.stack([grid_f, grid_h, grid_w], axis=-1).astype(np.float64)
        ids = np.concatenate([np.zeros((L, 3)), img_ids], axis=0)
        cos, sin = np_flux_rope(ids, (4, 2, 2))

        for i in range(2):
            x, txt = np_flux_dual_block(p[f"transformer_blocks_{i}"], x, txt, temb, cos, sin, N, HD, D)
        full = np.concatenate([txt, x], axis=1)
        for i in range(2):
            full = np_flux_single_block(p[f"single_transformer_blocks_{i}"], full, temb, cos, sin, N, HD, D)
        x = full[:, L:]

        mod = np_dense(np_silu(temb), p["norm_out_linear"])
        scale, shift = np.split(mod, 2, axis=-1)
        x = np_layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        x = np_dense(x, p["proj_out"])

        x = x.reshape(B, pf, phh, pww, C, pt, pp_, pp_)
        want = x.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(B, C, F, H, W)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)


# ----------------------------------------------------------------- CogView4


class TestCogView4FullModel:
    def test_full_forward_matches_numpy(self):
        """Reference: diffusers CogView4Transformer2DModel as trained by
        `/root/reference/finetrainers/models/cogview4/base_specification.py`
        (SDXL-style size/crop microconditioning at :126-130, joint text+image
        stream with 12-way adaLN, 2D RoPE with text-identity prefix)."""
        from finetrainers_tpu.models.cogview4.transformer import CogView4Transformer2DModel

        B, C, H, W, L = 1, 4, 4, 4, 3
        N, HD, TED, CD = 2, 8, 20, 6
        D = N * HD
        model = CogView4Transformer2DModel(
            in_channels=C, out_channels=C, patch_size=2, num_attention_heads=N,
            attention_head_dim=HD, num_layers=2, text_embed_dim=12, time_embed_dim=TED,
            condition_dim=CD, dtype=jnp.float32, use_scan=False,
        )
        rng = jax.random.PRNGKey(23)
        latents = jax.random.normal(jax.random.fold_in(rng, 1), (B, C, H, W), jnp.float32)
        text = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, 12), jnp.float32)
        timestep = jnp.asarray([620.0])
        osize = jnp.asarray([[32.0, 24.0]])
        tsize = jnp.asarray([[16.0, 16.0]])
        crop = jnp.asarray([[2.0, 3.0]])

        params = randomize_init(model, rng, latents, text, timestep, osize, tsize, crop)
        got = model.apply({"params": params}, latents, text, timestep, osize, tsize, crop)

        p = to_np(params)
        lat = np.asarray(latents, np.float64)
        pp_ = 2
        ph, pw = H // pp_, W // pp_
        x = lat.reshape(B, C, ph, pp_, pw, pp_)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, ph * pw, C * pp_ * pp_)
        x = np_dense(x, p["patch_embed_proj"])
        ctx = np_dense(np.asarray(text, np.float64), p["patch_embed_text_proj"])

        cond_parts = [np_sinusoidal(np.asarray(timestep), CD)]
        for tensor in (osize, tsize, crop):
            emb = np_sinusoidal(np.asarray(tensor, np.float64).reshape(-1), CD)
            cond_parts.append(emb.reshape(B, -1))
        cond = np.concatenate(cond_parts, axis=-1)
        temb = np_dense(cond, p["time_condition_embed_linear_1"])
        temb = np_dense(np_silu(temb), p["time_condition_embed_linear_2"])

        cos, sin = np_axial_rope_freqs(HD, (ph, pw), (0.5, 0.5))
        cos = np.concatenate([np.ones((L, cos.shape[1])), cos], axis=0)
        sin = np.concatenate([np.zeros((L, sin.shape[1])), sin], axis=0)

        for i in range(2):
            bp = p[f"transformer_blocks_{i}"]
            mod = np_dense(np_silu(temb), bp["adaln_linear"])
            (sh, sc, g, esh, esc, eg, sh2, sc2, g2, esh2, esc2, eg2) = np.split(mod, 12, axis=-1)
            h = np_layer_norm(x) * (1 + sc[:, None]) + sh[:, None]
            e = np_layer_norm(ctx) * (1 + esc[:, None]) + esh[:, None]
            joint = np.concatenate([e, h], axis=1)
            S = joint.shape[1]
            q = np_dense(joint, bp["attn1_to_q"]).reshape(B, S, N, HD)
            k = np_dense(joint, bp["attn1_to_k"]).reshape(B, S, N, HD)
            v = np_dense(joint, bp["attn1_to_v"]).reshape(B, S, N, HD)
            q = np_layer_norm(q, bp["attn1_norm_q"]["scale"], bp["attn1_norm_q"]["bias"])
            k = np_layer_norm(k, bp["attn1_norm_k"]["scale"], bp["attn1_norm_k"]["bias"])
            q = np_rope_half(q, cos, sin)
            k = np_rope_half(k, cos, sin)
            attn = np_attn_heads(q, k, v).reshape(B, S, D)
            attn = np_dense(attn, bp["attn1_to_out"])
            ctx = ctx + eg[:, None] * attn[:, :L]
            x = x + g[:, None] * attn[:, L:]

            h = np_layer_norm(x) * (1 + sc2[:, None]) + sh2[:, None]
            e = np_layer_norm(ctx) * (1 + esc2[:, None]) + esh2[:, None]
            joint = np.concatenate([e, h], axis=1)
            y = np_gelu_tanh(np_dense(joint, bp["ff_net_0_proj"]))
            y = np_dense(y, bp["ff_net_2"])
            ctx = ctx + eg2[:, None] * y[:, :L]
            x = x + g2[:, None] * y[:, L:]

        mod = np_dense(np_silu(temb), p["norm_out_linear"])
        shift, scale = np.split(mod, 2, axis=-1)
        x = np_layer_norm(x) * (1 + scale[:, None]) + shift[:, None]
        x = np_dense(x, p["proj_out"])

        x = x.reshape(B, ph, pw, C, pp_, pp_)
        want = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, C, H, W)
        np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=RTOL)
