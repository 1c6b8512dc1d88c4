"""Generator for the training example recipes.

Each recipe = train.sh + training.json + validation.json. The shell scripts are
TPU-native: one JAX/GSPMD backend, parallelism picked by mesh axis degrees
(reference analog: examples/training/**/train.sh, which selects torch backends
and NCCL env; here collectives ride ICI on a pod slice instead).

Run `python examples/training/_generate.py` after editing RECIPES to refresh.
"""

from __future__ import annotations

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent

TRAIN_SH = """#!/bin/bash
set -e -x

# Offline-friendly defaults; point WANDB_MODE=online to stream to wandb.
export WANDB_MODE="offline"
export FINETRAINERS_LOG_LEVEL="INFO"

# On a TPU VM, JAX discovers every chip of the slice automatically; there is no
# per-process device pinning. To dry-run this recipe on CPU with a virtual
# 8-device mesh:
#   export JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
# Multi-host slices (v5e-16 and up) need no launcher: run this script on every
# host; JAX initializes the cross-host mesh from the TPU runtime metadata.

NUM_CHIPS={num_chips}

TRAINING_DATASET_CONFIG="{recipe_dir}/training.json"
VALIDATION_DATASET_FILE="{recipe_dir}/validation.json"

# Parallelism layouts. All of these lower to a single GSPMD mesh; prefer
# dp_shards (FSDP/ZeRO-3) first on TPU — parameter all-gathers ride ICI and
# overlap with compute. Add cp_degree for long token sequences (video), and
# tp_degree when one chip cannot hold a replica even sharded.
DDP="--parallel_backend jax --pp_degree 1 --dp_degree $NUM_CHIPS --dp_shards 1 --cp_degree 1 --tp_degree 1"
FSDP="--parallel_backend jax --pp_degree 1 --dp_degree 1 --dp_shards $NUM_CHIPS --cp_degree 1 --tp_degree 1"
HSDP_2="--parallel_backend jax --pp_degree 1 --dp_degree 2 --dp_shards $((NUM_CHIPS / 2)) --cp_degree 1 --tp_degree 1"
FSDP_CP_2="--parallel_backend jax --pp_degree 1 --dp_degree 1 --dp_shards $((NUM_CHIPS / 2)) --cp_degree 2 --tp_degree 1"

parallel_cmd=(
  {parallel}
)

model_cmd=(
  --model_name "{model_name}"
  # Hub id or a local diffusers checkpoint directory.
  --pretrained_model_name_or_path "{pretrained}"
  --transformer_dtype bf16
  --vae_dtype bf16
)

dataset_cmd=(
  --dataset_config $TRAINING_DATASET_CONFIG
  --dataset_shuffle_buffer_size {shuffle_buffer}
  --enable_precomputation
  --precomputation_items {precomputation_items}
  --precomputation_once
)

dataloader_cmd=(
  --dataloader_num_workers 0
)

diffusion_cmd=(
  --flow_weighting_scheme "logit_normal"
)

# Attention provider for the training step. "auto" routes long self-attention
# through the block-tuned TPU flash kernel and short/cross attention to the XLA
# fused path (fastest measured end to end). With cp_degree > 1, swap to
# transformer:ring to stream KV around the ICI ring.
attention_cmd=(
  --attn_provider_training "transformer:{attn_provider}"
)

training_cmd=(
  --training_type "{training_type}"
  --seed 42
  --batch_size {batch_size}
  --train_steps {train_steps}
{training_extra}  --gradient_accumulation_steps 1
  --gradient_checkpointing
  --gradient_checkpointing_type ops
  --checkpointing_steps {checkpointing_steps}
  --checkpointing_limit 2
  # --resume_from_checkpoint latest
  --enable_slicing
  --enable_tiling
)

optimizer_cmd=(
  --optimizer "adamw"
  --lr {lr}
  --lr_scheduler "constant_with_warmup"
  --lr_warmup_steps {warmup}
  --beta1 0.9
  --beta2 0.99
  --weight_decay 1e-4
  --epsilon 1e-8
  --max_grad_norm 1.0
)

validation_cmd=(
  --validation_dataset_file "$VALIDATION_DATASET_FILE"
  --validation_steps {validation_steps}
)

miscellaneous_cmd=(
  --tracker_name "finetrainers-tpu-{model_name}"
  --output_dir "$HOME/runs/{run_name}"
  --report_to "wandb"
)

python train.py \\
  "${{parallel_cmd[@]}}" \\
  "${{model_cmd[@]}}" \\
  "${{dataset_cmd[@]}}" \\
  "${{dataloader_cmd[@]}}" \\
  "${{diffusion_cmd[@]}}" \\
  "${{attention_cmd[@]}}" \\
  "${{training_cmd[@]}}" \\
  "${{optimizer_cmd[@]}}" \\
  "${{validation_cmd[@]}}" \\
  "${{miscellaneous_cmd[@]}}"
"""


def lora_extra(rank: int, alpha: int, target: str) -> str:
    return (
        f'  --rank {rank}\n'
        f'  --lora_alpha {alpha}\n'
        f'  --target_modules "{target}"\n'
    )


ATTN = "(transformer_blocks|single_transformer_blocks).*(to_q|to_k|to_v|to_out.0)"
ATTN_BLOCKS = "blocks.*(to_q|to_k|to_v|to_out.0)"
ATTN_TB = "transformer_blocks.*(to_q|to_k|to_v|to_out.0)"
ATTN_FLUX = "transformer_blocks.*(to_q|to_k|to_v|to_out.0|add_q_proj|add_k_proj|add_v_proj|to_add_out)"
CTRL_TB = "transformer_blocks.*(to_q|to_k|to_v|to_out.0|ff.net.0.proj|ff.net.2)"
CTRL_BLOCKS = "blocks.*(to_q|to_k|to_v|to_out.0|ff.net.0.proj|ff.net.2)"


def vrow(caption, *, video=True, h=512, w=768, f=49, steps=50, extra=None):
    row = {
        "caption": caption,
        "image_path": None,
        "video_path": None,
        "num_inference_steps": steps,
        "height": h,
        "width": w,
    }
    if video:
        row.update({"num_frames": f, "frame_rate": 25})
    if extra:
        row.update(extra)
    return row


CRUSH_CAPS = [
    "PIKA_CRUSH A hydraulic press descends on a toy car, flattening it slowly.",
    "PIKA_CRUSH A pile of candy is squeezed flat under a heavy steel cylinder.",
]
DISSOLVE_CAPS = [
    "3DGS_DISSOLVE A fox figurine dissolves into a cloud of red particles that drift away.",
    "3DGS_DISSOLVE A chess piece crumbles into glowing embers that scatter upward.",
]
TAROT_CAPS = [
    "a trtcrd of a lighthouse on a cliff at night, tarot style",
    "a trtcrd of a fox holding a lantern, tarot style",
]
SIMPSONS_CAPS = [
    "Simpsons style. A yellow-skinned scientist waves from a porch under a blue sky.",
    "Simpsons style. A family eats dinner while a cat sleeps on the couch.",
]

RECIPES = [
    dict(
        path="sft/ltx_video/crush_smol_lora", model_name="ltx_video",
        pretrained="a-r-r-o-w/LTX-Video-diffusers", training_type="lora",
        datasets=[dict(data_root="finetrainers/crush-smol", dataset_type="video",
                       id_token="PIKA_CRUSH", video_resolution_buckets=[[49, 512, 768]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c) for c in CRUSH_CAPS],
        train_steps=5000, lr="5e-5", rank=32, target=ATTN,
    ),
    dict(
        # Multi-resolution variant (reference: train_multires.sh in the same
        # directory): the same dataset registered once per frame-count bucket.
        # Each bucket compiles its own jitted step (static shapes); the bucketed
        # jit cache in SFTTrainer reuses compilations across epochs.
        path="sft/ltx_video/crush_smol_lora", suffix="_multires",
        model_name="ltx_video",
        pretrained="a-r-r-o-w/LTX-Video-diffusers", training_type="lora",
        datasets=[dict(data_root="finetrainers/crush-smol", dataset_type="video",
                       id_token="PIKA_CRUSH", video_resolution_buckets=[[f, 512, 768]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)
                  for f in (49, 81, 121, 161)],
        validation=[vrow(c, f=f) for c, f in zip(CRUSH_CAPS, (49, 121))],
        train_steps=7500, lr="5e-5", rank=32, target=ATTN,
        shuffle_buffer=50, precomputation_items=200,
        note="Four frame-count buckets -> four compiled step variants; precompute "
             "covers all four copies of the dataset (reference bumps items 4x too).",
    ),
    dict(
        path="sft/wan/crush_smol_lora", model_name="wan",
        pretrained="Wan-AI/Wan2.1-T2V-1.3B-Diffusers", training_type="lora",
        datasets=[dict(data_root="finetrainers/crush-smol", dataset_type="video",
                       id_token="PIKA_CRUSH", video_resolution_buckets=[[49, 480, 832]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, h=480, w=832) for c in CRUSH_CAPS],
        train_steps=3000, lr="5e-5", rank=32, target=ATTN_BLOCKS,
        parallel="$FSDP_CP_2",
    ),
    dict(
        path="sft/wan/3dgs_dissolve", model_name="wan",
        pretrained="Wan-AI/Wan2.1-T2V-1.3B-Diffusers", training_type="lora",
        datasets=[dict(data_root="finetrainers/3dgs-dissolve", dataset_type="video",
                       id_token="3DGS_DISSOLVE", video_resolution_buckets=[[49, 480, 832]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, h=480, w=832) for c in DISSOLVE_CAPS],
        train_steps=5000, lr="5e-5", rank=32, target=ATTN_BLOCKS,
        parallel="$FSDP_CP_2",
    ),
    dict(
        path="sft/wan_i2v/3dgs_dissolve", model_name="wan",
        pretrained="Wan-AI/Wan2.1-I2V-14B-480P-Diffusers", training_type="lora",
        datasets=[dict(data_root="finetrainers/3dgs-dissolve", dataset_type="video",
                       id_token="3DGS_DISSOLVE", video_resolution_buckets=[[49, 480, 832]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, h=480, w=832, extra={"image_path": "examples/training/sft/wan_i2v/3dgs_dissolve/first_frame.png"})
                    for c in DISSOLVE_CAPS],
        train_steps=1000, lr="1e-4", rank=16, target=ATTN_BLOCKS,
        parallel="$FSDP_CP_2", num_chips=16,
        note="14B model: FSDP over 16 chips; add --tp_degree 2 on v5e-16 if HBM is tight.",
    ),
    dict(
        path="sft/cogvideox/crush_smol_lora", model_name="cogvideox",
        pretrained="THUDM/CogVideoX1.5-5B", training_type="lora",
        datasets=[dict(data_root="finetrainers/crush-smol", dataset_type="video",
                       id_token="PIKA_CRUSH", video_resolution_buckets=[[81, 480, 768]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, h=480, w=768, f=81) for c in CRUSH_CAPS],
        train_steps=3000, lr="5e-5", rank=32, target=ATTN,
    ),
    dict(
        path="sft/cogview4/raider_white_tarot", model_name="cogview4",
        pretrained="THUDM/CogView4-6B", training_type="lora",
        datasets=[dict(data_root="multimodalart/1920-raider-waite-tarot-public-domain",
                       dataset_type="image", image_resolution_buckets=[[1280, 720]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, video=False, h=1280, w=720) for c in TAROT_CAPS],
        train_steps=5000, lr="3e-5", rank=32, target=ATTN_TB, int8=True,
    ),
    dict(
        path="sft/cogview4/the_simpsons", model_name="cogview4",
        pretrained="THUDM/CogView4-6B", training_type="lora",
        datasets=[dict(data_root="bigdata-pw/TheSimpsons", dataset_type="image",
                       image_resolution_buckets=[[960, 528], [720, 528]],
                       caption_options={"column_names": ["caption"]},
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, video=False, h=528, w=960) for c in SIMPSONS_CAPS],
        train_steps=5000, lr="1e-5", rank=128, target=ATTN_TB, int8=True,
        readme="Webdataset smoke recipe (reference: the_simpsons/README.md): "
               "verifies tar-shard webdataset loading and streaming from the "
               "HF Hub; do not expect meaningful results. Dataset: "
               "bigdata-pw/TheSimpsons.",
    ),
    dict(
        path="sft/flux_dev/raider_white_tarot", model_name="flux",
        pretrained="black-forest-labs/FLUX.1-dev", training_type="lora",
        datasets=[dict(data_root="multimodalart/1920-raider-waite-tarot-public-domain",
                       dataset_type="image", image_resolution_buckets=[[1280, 720]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow(c, video=False, h=1280, w=720) for c in TAROT_CAPS],
        train_steps=1000, lr="1e-4", rank=32, target=ATTN_FLUX,
    ),
    dict(
        path="sft/hunyuan_video/modal_labs_dissolve", model_name="hunyuan_video",
        pretrained="hunyuanvideo-community/HunyuanVideo", training_type="lora",
        datasets=[dict(data_root="modal-labs/dissolve", dataset_type="video",
                       id_token="DISSOLVE", video_resolution_buckets=[[49, 480, 768]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow("DISSOLVE " + c.split(" ", 1)[1], h=480, w=768) for c in DISSOLVE_CAPS],
        train_steps=3000, lr="3e-5", rank=32, target=ATTN,
        parallel="$FSDP_CP_2",
    ),
    dict(
        path="control/cogview4/canny", model_name="cogview4",
        pretrained="THUDM/CogView4-6B", training_type="control-lora",
        datasets=[dict(data_root="recoilme/aesthetic_photos_xs", dataset_type="image",
                       image_resolution_buckets=[[1024, 1024]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow("a photo of a mountain lake at dawn", video=False, h=1024, w=1024,
                         extra={"control_image_path": "examples/training/control/cogview4/canny/edge_map.png"})],
        train_steps=10000, lr="3e-5", rank=128, target=CTRL_TB,
        control_extra="  --control_type canny\n",
        readme="Canny-conditioned CogView4 control LoRA: the trainer synthesizes a "
               "Canny edge map per sample (cv2 on host, overlapped with device "
               "compute) and widens the patch-embed input channels to accept the "
               "concatenated control latents.",
    ),
    dict(
        path="control/cogview4/omni_edit", model_name="cogview4",
        pretrained="THUDM/CogView4-6B", training_type="control-lora",
        datasets=[dict(data_root="sayakpaul/OmniEdit-mini", dataset_type="image",
                       image_resolution_buckets=[[512, 512], [768, 768], [1024, 1024]],
                       caption_options={"column_names": "edited_prompt_list"},
                       rename_columns={"src_img": "control_image", "edited_img": "image"},
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow("change the sky to a stormy sunset", video=False, h=1024, w=1024,
                         extra={"control_image_path": "examples/training/control/cogview4/omni_edit/source.png"})],
        train_steps=10000, lr="3e-5", rank=128, target=CTRL_TB,
        control_extra="  --control_type none\n",
        readme="Instruction-editing control LoRA on paired data: rename_columns maps "
               "the dataset's source image onto control_image, so no synthetic "
               "control processor runs (--control_type none).",
    ),
    dict(
        path="control/wan/image_condition", model_name="wan",
        pretrained="Wan-AI/Wan2.1-T2V-1.3B-Diffusers", training_type="control-lora",
        datasets=[dict(data_root="finetrainers/OpenVid-1k-split", dataset_type="video",
                       video_resolution_buckets=[[49, 480, 832]],
                       reshape_mode="bicubic", remove_common_llm_caption_prefixes=True)],
        validation=[vrow("a sailboat drifting across a calm bay", h=480, w=832)],
        train_steps=10000, lr="2e-5", rank=128, target=CTRL_BLOCKS,
        control_extra=(
            "  --control_type none\n"
            "  --frame_conditioning_type index\n"
            "  --frame_conditioning_index 0\n"
        ),
        parallel="$FSDP_CP_2",
        readme="First-frame conditioning for Wan T2V: control latents are the clean "
               "latents masked to frame 0 (frame_conditioning_type=index), teaching "
               "the base T2V model image-to-video generation.",
    ),
]


def main() -> None:
    for r in RECIPES:
        recipe_dir = ROOT / r["path"]
        recipe_dir.mkdir(parents=True, exist_ok=True)
        rel = f"examples/training/{r['path']}"
        sfx = r.get("suffix", "")
        extra = lora_extra(r["rank"], r["rank"], r["target"]) + r.get("control_extra", "")
        if r.get("int8"):
            # int8 frozen-weight MXU path: +31% steps/s on CogView4-6B at 72%
            # MFU-equiv (docs/perf.md round 5); only recipes whose matmul
            # width benefits opt in.
            extra += ("  --layerwise_upcasting_modules transformer\n"
                      "  --layerwise_upcasting_storage_dtype int8\n")
        sh = TRAIN_SH.format(
            num_chips=r.get("num_chips", 8),
            recipe_dir=rel,
            parallel=r.get("parallel", "$FSDP"),
            # CP layouts stream KV on the ICI ring; everything else lets the
            # dispatcher pick the tuned kernel.
            attn_provider="ring" if "CP" in r.get("parallel", "") else "auto",
            model_name=r["model_name"],
            pretrained=r["pretrained"],
            training_type=r["training_type"],
            training_extra=extra,
            batch_size=r.get("batch_size", 1),
            train_steps=r["train_steps"],
            lr=r["lr"],
            warmup=max(r["train_steps"] // 10, 100),
            checkpointing_steps=max(r["train_steps"] // 5, 500),
            validation_steps=max(r["train_steps"] // 10, 500),
            shuffle_buffer=r.get("shuffle_buffer", 10),
            precomputation_items=r.get("precomputation_items", 50),
            run_name=r["path"].replace("/", "-") + sfx,
        )
        if sfx:
            sh = sh.replace(f"{rel}/training.json", f"{rel}/training{sfx}.json")
            sh = sh.replace(f"{rel}/validation.json", f"{rel}/validation{sfx}.json")
        if "note" in r:
            sh = sh.replace("parallel_cmd=(", f"# {r['note']}\nparallel_cmd=(")
        (recipe_dir / f"train{sfx}.sh").write_text(sh)
        (recipe_dir / f"train{sfx}.sh").chmod(0o755)
        (recipe_dir / f"training{sfx}.json").write_text(json.dumps({"datasets": r["datasets"]}, indent=2) + "\n")
        (recipe_dir / f"validation{sfx}.json").write_text(json.dumps({"data": r["validation"]}, indent=2) + "\n")
        if "readme" in r:
            title = r["path"].split("/")[-1].replace("_", " ")
            (recipe_dir / "README.md").write_text(f"# {title}\n\n{r['readme']}\n")
    print(f"wrote {len(RECIPES)} recipes under {ROOT}")


if __name__ == "__main__":
    main()
