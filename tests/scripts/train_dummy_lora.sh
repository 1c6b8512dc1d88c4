#!/bin/bash
# Human smoke test (reference parity: tests/scripts/dummy_*_lora.sh): generate a
# 4-clip dataset, run 6 LoRA steps on an 8-device virtual CPU mesh (FSDP), and
# check the checkpoint + peft export landed. Works with no TPU and no network.
set -e

export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8"

WORKDIR=$(mktemp -d)
trap 'rm -rf "$WORKDIR"' EXIT

python - "$WORKDIR" <<'EOF'
import json, pathlib, sys
import numpy as np, cv2
root = pathlib.Path(sys.argv[1]) / "data"
root.mkdir()
for i in range(4):
    w = cv2.VideoWriter(str(root / f"v{i}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 32))
    for _ in range(6):
        w.write(np.random.randint(0, 255, (32, 48, 3), np.uint8))
    w.release()
    (root / f"v{i}.txt").write_text(f"a dummy clip {i}")
(pathlib.Path(sys.argv[1]) / "config.json").write_text(json.dumps({
    "datasets": [{"data_root": str(root), "dataset_type": "video",
                  "video_resolution_buckets": [[4, 32, 32]]}]}))
EOF

python train.py \
  --training_type lora --model_name dummy --pretrained_model_name_or_path none \
  --dataset_config "$WORKDIR/config.json" \
  --dp_shards 8 --batch_size 1 --train_steps 6 --rank 4 --lora_alpha 4 \
  --checkpointing_steps 6 --output_dir "$WORKDIR/out" --seed 42

test -d "$WORKDIR/out/checkpoints/finetrainers_step_6"
test -f "$WORKDIR/out/lora_weights/000006/pytorch_lora_weights.safetensors"
echo "SMOKE TEST PASSED"
