"""Convert a diffusers-convention HunyuanVideo LoRA (the trainer's export,
`pytorch_lora_weights.safetensors`) into the original HunyuanVideo repo's key
layout — fused `img_attn_qkv` / `txt_attn_qkv` / `linear1` projections under a
`diffusion_model.` prefix — so the adapter loads in ComfyUI and the official
sampler. Reference parity: examples/formats/hunyuan_video/convert_to_original_format.py.

The diffusers graph keeps q/k/v as separate Linears; the original graph fuses
them into one matmul. For a LoRA delta B@A that means:
  - lora_A factors concatenate along the rank axis -> (3r, in),
  - lora_B factors form a block-diagonal -> (3out, 3r),
so each fused projection applies the three original low-rank updates exactly.

Usage:
  python convert_to_original_format.py --input_lora pytorch_lora_weights.safetensors \
      [--output out.safetensors] [--alpha 32] [--dtype bfloat16] [--debug]
"""

from __future__ import annotations

import argparse

import torch
from safetensors.torch import load_file, save_file

PREFIX = "diffusion_model."
DOUBLE = "transformer.transformer_blocks"
SINGLE = "transformer.single_transformer_blocks"

# (anchor_suffix, fused_name, member_suffixes): members are fused in order.
FUSIONS = [
    (DOUBLE, "attn.to_q", "img_attn_qkv", ["attn.to_q", "attn.to_k", "attn.to_v"]),
    (DOUBLE, "attn.add_q_proj", "txt_attn_qkv",
     ["attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj"]),
    (SINGLE, "attn.to_q", "linear1",
     ["attn.to_q", "attn.to_k", "attn.to_v", "proj_mlp"]),
]

# Plain one-to-one renames (module path fragment -> original name).
RENAMES_DOUBLE = {
    "attn.to_out.0": "img_attn_proj",
    "attn.to_add_out": "txt_attn_proj",
    "ff.net.0.proj": "img_mlp.0",
    "ff.net.2": "img_mlp.2",
    "ff_context.net.0.proj": "txt_mlp.0",
    "ff_context.net.2": "txt_mlp.2",
}
RENAMES_SINGLE = {"proj_out": "linear2"}


def _block_prefix(block_path: str) -> str:
    name = "double_blocks" if block_path == DOUBLE else "single_blocks"
    return PREFIX + name


def _fuse(state: dict, key: str, block_path: str, members: list, fused: str) -> dict:
    """Build the fused lora_A (rank-concat) and lora_B (block-diag) for one block."""
    a_parts, b_parts = [], []
    for m in members:
        a_key = key.replace(members[0], m)
        b_key = a_key.replace("lora_A", "lora_B")
        if a_key in state:
            a_parts.append(state[a_key])
            b_parts.append(state[b_key])
        else:
            # Member not adapted (e.g. proj_mlp outside target_modules): identity
            # slot — zero A of the anchor's rank, zero B sized to the member's
            # true output (4x inner dim for Hunyuan's single-block MLP).
            r, dim_in = a_parts[0].shape
            a_parts.append(torch.zeros((r, dim_in), dtype=a_parts[0].dtype))
            b_parts.append(torch.zeros((b_parts[0].shape[0] * 4, r), dtype=b_parts[0].dtype))
    fused_a = torch.cat(a_parts, dim=0)
    fused_b = torch.block_diag(*b_parts)
    base = key.replace(block_path, _block_prefix(block_path)).replace(members[0], fused)
    return {base: fused_a, base.replace("lora_A", "lora_B"): fused_b}


def convert(state: dict) -> dict:
    out: dict = {}
    for key, tensor in state.items():
        if key.startswith(DOUBLE):
            block_path, renames = DOUBLE, RENAMES_DOUBLE
        elif key.startswith(SINGLE):
            block_path, renames = SINGLE, RENAMES_SINGLE
        else:
            print(f"skipping unrecognized key: {key}")
            continue

        handled = False
        for bp, anchor, fused, members in FUSIONS:
            if bp != block_path:
                continue
            if f".{anchor}.lora_A." in key:
                out.update(_fuse(state, key, block_path, members, fused))
                handled = True
            elif any(f".{m}." in key for m in members):
                handled = True  # folded into the anchor's fusion (or its lora_B)
        if handled:
            continue

        for frag, new in renames.items():
            if f".{frag}." in key:
                out[key.replace(frag, new).replace(block_path, _block_prefix(block_path))] = tensor
                break
        else:
            print(f"skipping unrecognized key: {key}")
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_lora", type=str, required=True)
    p.add_argument("--output", type=str, default=None,
                   help="Defaults to <input>_original.safetensors")
    p.add_argument("--alpha", type=float, default=None,
                   help="Write .alpha tensors (defaults to rank when omitted)")
    p.add_argument("--dtype", type=str, default=None,
                   choices=["bfloat16", "float16", "float32"])
    p.add_argument("--debug", action="store_true")
    args = p.parse_args()

    converted = convert(load_file(args.input_lora))

    if args.alpha is not None:
        for key in [k for k in converted if "lora_A" in k]:
            converted[key.replace(".lora_A.weight", ".alpha")] = torch.tensor(
                [args.alpha], dtype=converted[key].dtype
            )
    if args.dtype is not None:
        dt = getattr(torch, args.dtype)
        converted = {k: v.to(dt) for k, v in converted.items()}

    if args.debug:
        for key in sorted(converted):
            print(key, tuple(converted[key].shape), converted[key].dtype)
        return
    out_path = args.output or args.input_lora.replace(".safetensors", "_original.safetensors")
    save_file(converted, out_path)
    print(f"wrote {len(converted)} tensors to {out_path}")


if __name__ == "__main__":
    main()
