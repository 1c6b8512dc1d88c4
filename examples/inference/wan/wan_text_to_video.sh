#!/bin/bash
set -e -x

export WANDB_MODE="disabled"
export FINETRAINERS_LOG_LEVEL="INFO"

# CPU dry run (no TPU):
#   export JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

NUM_CHIPS=8

DATASET_FILE="examples/inference/wan/dummy_text_to_video.json"

# dp fans requests out across chips; cp/tp shard a single long generation.
DP="--dp_degree $NUM_CHIPS --dp_shards 1 --cp_degree 1 --tp_degree 1"
CP_4="--dp_degree 1 --dp_shards 1 --cp_degree 4 --tp_degree 1"

parallel_cmd=(
  $CP_4
)

model_cmd=(
  --model_name "wan"
  --pretrained_model_name_or_path "Wan-AI/Wan2.1-T2V-1.3B-Diffusers"
  --transformer_dtype bf16
  --vae_dtype bf16
  --enable_slicing
  --enable_tiling
  # To sample a fine-tuned LoRA, point at the trainer export:
  # --lora_weights "$HOME/runs/.../lora_weights/005000"
)

inference_cmd=(
  --inference_type text_to_video
  --dataset_file "$DATASET_FILE"
)

attn_provider_cmd=(
  --attn_provider flash
)

miscellaneous_cmd=(
  --seed 31337
  --output_dir "$HOME/runs/wan-inference"
)

python examples/inference/inference.py \
  "${parallel_cmd[@]}" \
  "${model_cmd[@]}" \
  "${inference_cmd[@]}" \
  "${attn_provider_cmd[@]}" \
  "${miscellaneous_cmd[@]}"
