"""examples/formats converter tests: the fused original-format LoRA must apply
the identical delta as the separate diffusers-format projections."""

import importlib.util
import pathlib
import sys

import torch

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

_spec = importlib.util.spec_from_file_location(
    "convert_to_original_format",
    REPO_ROOT / "examples/formats/hunyuan_video/convert_to_original_format.py",
)
conv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv)


def _lora(r, d_in, d_out, seed):
    g = torch.Generator().manual_seed(seed)
    return (torch.randn(r, d_in, generator=g), torch.randn(d_out, r, generator=g))


class TestHunyuanOriginalFormat:
    def _state(self, r=4, d=16):
        state = {}
        base = "transformer.transformer_blocks.0"
        for i, name in enumerate(
            ["attn.to_q", "attn.to_k", "attn.to_v", "attn.add_q_proj",
             "attn.add_k_proj", "attn.add_v_proj", "attn.to_out.0",
             "ff.net.0.proj", "ff.net.2"]
        ):
            d_out = 4 * d if "net.0" in name else d
            d_in = 4 * d if name == "ff.net.2" else d
            a, b = _lora(r, d_in, d_out, seed=i)
            state[f"{base}.{name}.lora_A.weight"] = a
            state[f"{base}.{name}.lora_B.weight"] = b
        sbase = "transformer.single_transformer_blocks.0"
        for i, name in enumerate(["attn.to_q", "attn.to_k", "attn.to_v", "proj_out"]):
            d_in = 5 * d if name == "proj_out" else d
            a, b = _lora(r, d_in, d, seed=100 + i)
            state[f"{sbase}.{name}.lora_A.weight"] = a
            state[f"{sbase}.{name}.lora_B.weight"] = b
        return state

    def test_fused_qkv_delta_matches(self):
        state = self._state()
        out = conv.convert(state)
        a = out["diffusion_model.double_blocks.0.img_attn_qkv.lora_A.weight"]
        b = out["diffusion_model.double_blocks.0.img_attn_qkv.lora_B.weight"]
        x = torch.randn(3, 16)
        fused_delta = x @ a.T @ b.T  # (3, 3d)
        parts = []
        for name in ("attn.to_q", "attn.to_k", "attn.to_v"):
            ai = state[f"transformer.transformer_blocks.0.{name}.lora_A.weight"]
            bi = state[f"transformer.transformer_blocks.0.{name}.lora_B.weight"]
            parts.append(x @ ai.T @ bi.T)
        assert torch.allclose(fused_delta, torch.cat(parts, dim=-1), atol=1e-5)

    def test_single_block_linear1_pads_missing_proj_mlp(self):
        out = conv.convert(self._state(r=4, d=16))
        a = out["diffusion_model.single_blocks.0.linear1.lora_A.weight"]
        b = out["diffusion_model.single_blocks.0.linear1.lora_B.weight"]
        # q,k,v adapted + zero slot for proj_mlp (4x inner dim).
        assert a.shape == (16, 16)  # 4 members x rank 4
        assert b.shape == (16 * 3 + 64, 16)
        assert torch.all(b[48:, 12:] == 0)

    def test_renames_and_prefix(self):
        out = conv.convert(self._state())
        assert "diffusion_model.double_blocks.0.img_attn_proj.lora_A.weight" in out
        assert "diffusion_model.double_blocks.0.img_mlp.0.lora_A.weight" in out
        assert "diffusion_model.double_blocks.0.img_mlp.2.lora_B.weight" in out
        assert "diffusion_model.single_blocks.0.linear2.lora_A.weight" in out
        assert all(k.startswith("diffusion_model.") for k in out)

    def test_txt_attn_fused(self):
        out = conv.convert(self._state())
        assert "diffusion_model.double_blocks.0.txt_attn_qkv.lora_A.weight" in out
        assert out["diffusion_model.double_blocks.0.txt_attn_qkv.lora_B.weight"].shape == (48, 12)
