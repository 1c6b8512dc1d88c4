"""Generator for the per-model inference examples (reference parity:
examples/inference/{wan,cogvideox,cogview4,flux}/*.sh). Run after editing
RECIPES to refresh the .sh/.json pairs."""

from __future__ import annotations

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent

SH = """#!/bin/bash
set -e -x

export WANDB_MODE="disabled"
export FINETRAINERS_LOG_LEVEL="INFO"

# CPU dry run (no TPU):
#   export JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

NUM_CHIPS=8

DATASET_FILE="examples/inference/{model}/{json_name}"

# dp fans requests out across chips; cp/tp shard a single long generation.
DP="--dp_degree $NUM_CHIPS --dp_shards 1 --cp_degree 1 --tp_degree 1"
CP_4="--dp_degree 1 --dp_shards 1 --cp_degree 4 --tp_degree 1"

parallel_cmd=(
  {parallel}
)

model_cmd=(
  --model_name "{model_name}"
  --pretrained_model_name_or_path "{pretrained}"
  --transformer_dtype bf16
  --vae_dtype bf16
  --enable_slicing
  --enable_tiling
  # To sample a fine-tuned LoRA, point at the trainer export:
  # --lora_weights "$HOME/runs/.../lora_weights/005000"
)

inference_cmd=(
  --inference_type {inference_type}
  --dataset_file "$DATASET_FILE"
)

attn_provider_cmd=(
  --attn_provider flash
)

miscellaneous_cmd=(
  --seed 31337
  --output_dir "$HOME/runs/{model}-inference"
)

python examples/inference/inference.py \\
  "${{parallel_cmd[@]}}" \\
  "${{model_cmd[@]}}" \\
  "${{inference_cmd[@]}}" \\
  "${{attn_provider_cmd[@]}}" \\
  "${{miscellaneous_cmd[@]}}"
"""


def row(caption, *, video=True, h=480, w=832, f=49, steps=50):
    r = {"caption": caption, "image_path": None, "video_path": None,
         "num_inference_steps": steps, "height": h, "width": w}
    if video:
        r.update({"num_frames": f, "frame_rate": 25})
    return r


RECIPES = [
    dict(model="wan", model_name="wan", pretrained="Wan-AI/Wan2.1-T2V-1.3B-Diffusers",
         sh="wan_text_to_video.sh", json_name="dummy_text_to_video.json",
         inference_type="text_to_video", parallel="$CP_4",
         rows=[row("a paper boat drifting down a rain gutter"),
               row("timelapse of a glacier calving into the sea")]),
    dict(model="ltx_video", model_name="ltx_video", pretrained="a-r-r-o-w/LTX-Video-diffusers",
         sh="ltx_video_text_to_video.sh", json_name="dummy_text_to_video.json",
         inference_type="text_to_video", parallel="$DP",
         rows=[row("a hummingbird hovering at a red flower", h=512, w=768),
               row("waves rolling over black volcanic sand", h=512, w=768)]),
    dict(model="hunyuan_video", model_name="hunyuan_video",
         pretrained="hunyuanvideo-community/HunyuanVideo",
         sh="hunyuan_video_text_to_video.sh", json_name="dummy_text_to_video.json",
         inference_type="text_to_video", parallel="$CP_4",
         rows=[row("a tram crossing a steel bridge at dusk", h=480, w=768)]),
    dict(model="cogvideox", model_name="cogvideox", pretrained="THUDM/CogVideoX1.5-5B",
         sh="cogvideox_text_to_video.sh", json_name="dummy_text_to_video.json",
         inference_type="text_to_video", parallel="$DP",
         rows=[row("a kite surfer jumping over a breaking wave", h=480, w=768, f=81)]),
    dict(model="cogview4", model_name="cogview4", pretrained="THUDM/CogView4-6B",
         sh="cogview4_text_to_image.sh", json_name="dummy_text_to_image.json",
         inference_type="text_to_image", parallel="$DP",
         rows=[row("an isometric painting of a tiny library in a tree", video=False, h=1024, w=1024)]),
    dict(model="flux", model_name="flux", pretrained="black-forest-labs/FLUX.1-dev",
         sh="flux_text_to_image.sh", json_name="dummy_text_to_image.json",
         inference_type="text_to_image", parallel="$DP",
         rows=[row("a macro photo of frost on a leaf at sunrise", video=False, h=1024, w=1024)]),
]


def main() -> None:
    for r in RECIPES:
        d = ROOT / r["model"]
        d.mkdir(parents=True, exist_ok=True)
        sh = SH.format(model=r["model"], model_name=r["model_name"], pretrained=r["pretrained"],
                       json_name=r["json_name"], inference_type=r["inference_type"],
                       parallel=r["parallel"])
        (d / r["sh"]).write_text(sh)
        (d / r["sh"]).chmod(0o755)
        (d / r["json_name"]).write_text(json.dumps({"data": r["rows"]}, indent=2) + "\n")
    print(f"wrote {len(RECIPES)} inference examples")


if __name__ == "__main__":
    main()
