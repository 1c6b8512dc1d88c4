#!/bin/bash
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

NUM_CHIPS=8

TRAINING_DATASET_CONFIG="examples/training/sft/cogview4/the_simpsons/training.json"
VALIDATION_DATASET_FILE="examples/training/sft/cogview4/the_simpsons/validation.json"

# Parallelism layouts. All of these lower to a single GSPMD mesh; prefer
# dp_shards (FSDP/ZeRO-3) first on TPU — parameter all-gathers ride ICI and
# overlap with compute. Add cp_degree for long token sequences (video), and
# tp_degree when one chip cannot hold a replica even sharded.
DDP="--parallel_backend jax --pp_degree 1 --dp_degree $NUM_CHIPS --dp_shards 1 --cp_degree 1 --tp_degree 1"
FSDP="--parallel_backend jax --pp_degree 1 --dp_degree 1 --dp_shards $NUM_CHIPS --cp_degree 1 --tp_degree 1"
HSDP_2="--parallel_backend jax --pp_degree 1 --dp_degree 2 --dp_shards $((NUM_CHIPS / 2)) --cp_degree 1 --tp_degree 1"
FSDP_CP_2="--parallel_backend jax --pp_degree 1 --dp_degree 1 --dp_shards $((NUM_CHIPS / 2)) --cp_degree 2 --tp_degree 1"

parallel_cmd=(
  $FSDP
)

model_cmd=(
  --model_name "cogview4"
  # Hub id or a local diffusers checkpoint directory.
  --pretrained_model_name_or_path "THUDM/CogView4-6B"
  --transformer_dtype bf16
  --vae_dtype bf16
)

dataset_cmd=(
  --dataset_config $TRAINING_DATASET_CONFIG
  --dataset_shuffle_buffer_size 10
  --enable_precomputation
  --precomputation_items 50
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
  --attn_provider_training "transformer:auto"
)

training_cmd=(
  --training_type "lora"
  --seed 42
  --batch_size 1
  --train_steps 5000
  --rank 128
  --lora_alpha 128
  --target_modules "transformer_blocks.*(to_q|to_k|to_v|to_out.0)"
  --layerwise_upcasting_modules transformer
  --layerwise_upcasting_storage_dtype int8
  --gradient_accumulation_steps 1
  --gradient_checkpointing
  --gradient_checkpointing_type ops
  --checkpointing_steps 1000
  --checkpointing_limit 2
  # --resume_from_checkpoint latest
  --enable_slicing
  --enable_tiling
)

optimizer_cmd=(
  --optimizer "adamw"
  --lr 1e-5
  --lr_scheduler "constant_with_warmup"
  --lr_warmup_steps 500
  --beta1 0.9
  --beta2 0.99
  --weight_decay 1e-4
  --epsilon 1e-8
  --max_grad_norm 1.0
)

validation_cmd=(
  --validation_dataset_file "$VALIDATION_DATASET_FILE"
  --validation_steps 500
)

miscellaneous_cmd=(
  --tracker_name "finetrainers-tpu-cogview4"
  --output_dir "$HOME/runs/sft-cogview4-the_simpsons"
  --report_to "wandb"
)

python train.py \
  "${parallel_cmd[@]}" \
  "${model_cmd[@]}" \
  "${dataset_cmd[@]}" \
  "${dataloader_cmd[@]}" \
  "${diffusion_cmd[@]}" \
  "${attention_cmd[@]}" \
  "${training_cmd[@]}" \
  "${optimizer_cmd[@]}" \
  "${validation_cmd[@]}" \
  "${miscellaneous_cmd[@]}"
