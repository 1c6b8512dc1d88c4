"""Loss-curve parity harness vs the PyTorch reference (BASELINE.md north star).

Runs N training steps through the full trainer CLI with a fixed seed and a
deterministic dataset, using REAL pretrained weights when a checkpoint is
reachable (local diffusers dir or hub id with network), and writes the per-step
global-average losses to JSON. Hand the same dataset + hyperparameters to the
reference trainer (see --print-reference-command) and compare the two curves
with --compare.

Offline today: the harness still runs end-to-end on random-init weights (the
spec falls back to random init when the checkpoint path is absent), so the
mechanics are tested; the day network/weights exist, loss-curve parity vs
PyTorch is ONE command per side:

  # this repo
  python tools/parity_vs_reference.py --model_name ltx_video \\
      --pretrained_model_name_or_path Lightricks/LTX-Video \\
      --steps 50 --out /tmp/tpu_losses.json
  # reference (produces its losses via the wandb/jsonl tracker)
  #   cd /root/reference && python train.py --model_name ltx_video \\
  #       --pretrained_model_name_or_path Lightricks/LTX-Video ... (same data,
  #       same seed, same lr/optimizer — flags printed by
  #       --print-reference-command)
  python tools/parity_vs_reference.py --compare /tmp/tpu_losses.json /tmp/ref_losses.json
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def make_deterministic_dataset(root: pathlib.Path, kind: str, num_samples: int = 8,
                               seed: int = 0) -> str:
    """Seeded synthetic dataset (identical bytes across frameworks/runs)."""
    import csv

    import numpy as np

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    rows = []
    if kind == "video":
        import cv2

        for i in range(num_samples):
            path = root / f"vid{i}.mp4"
            writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (128, 128))
            base = rng.rand(128, 128, 3)
            for f in range(9):
                frame = np.clip(base + 0.05 * rng.rand(128, 128, 3) * f, 0, 1)
                writer.write((frame * 255).astype(np.uint8))
            writer.release()
            rows.append({"file_name": path.name, "caption": f"parity probe clip {i}"})
        buckets = [[9, 64, 64]]
        ds_type = "video"
        bucket_key = "video_resolution_buckets"
    else:
        import cv2

        for i in range(num_samples):
            path = root / f"img{i}.png"
            cv2.imwrite(str(path), (rng.rand(128, 128, 3) * 255).astype(np.uint8))
            rows.append({"file_name": path.name, "caption": f"parity probe image {i}"})
        buckets = [[64, 64]]
        ds_type = "image"
        bucket_key = "image_resolution_buckets"
    with open(root / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
        w.writeheader()
        [w.writerow(r) for r in rows]
    config = {"datasets": [{"data_root": str(root), "dataset_type": ds_type,
                            bucket_key: buckets, "reshape_mode": "bicubic"}]}
    cfg_path = root / "config.json"
    cfg_path.write_text(json.dumps(config))
    return str(cfg_path)


def run(args) -> dict:
    import train

    workdir = pathlib.Path(args.workdir or "/tmp/parity_vs_reference")
    dataset_config = args.dataset_config or make_deterministic_dataset(
        workdir / "data", "image" if args.model_name in ("flux", "cogview4") else "video",
        seed=args.seed,
    )
    argv = [
        "--model_name", args.model_name,
        "--pretrained_model_name_or_path", args.pretrained_model_name_or_path,
        "--dataset_config", dataset_config,
        "--training_type", args.training_type,
        "--rank", str(args.rank), "--lora_alpha", str(args.rank),
        "--batch_size", str(args.batch_size),
        "--train_steps", str(args.steps),
        "--checkpointing_steps", str(10 * args.steps),  # no mid-run checkpoints
        "--precomputation_items", str(args.precomputation_items),
        "--seed", str(args.seed),
        "--lr", str(args.lr), "--lr_scheduler", "constant",
        "--optimizer", "adamw", "--beta1", "0.9", "--beta2", "0.999",
        "--weight_decay", "0.0", "--max_grad_norm", "1.0",
        "--output_dir", str(workdir / "run"),
    ] + (args.extra_args or [])
    trainer = train.main(argv)
    ts = trainer.state.train_state
    return {
        "model_name": args.model_name,
        "pretrained_model_name_or_path": args.pretrained_model_name_or_path,
        "seed": args.seed,
        "steps": int(ts.step),
        "losses": [float(x) for x in ts.global_avg_losses],
    }


def compare(path_a: str, path_b: str, rtol: float) -> int:
    import numpy as np

    a = json.loads(pathlib.Path(path_a).read_text())
    b = json.loads(pathlib.Path(path_b).read_text())
    la, lb = np.asarray(a["losses"], np.float64), np.asarray(b["losses"], np.float64)
    n = min(len(la), len(lb))
    if n == 0:
        print("no overlapping steps to compare")
        return 2
    la, lb = la[:n], lb[:n]
    rel = np.abs(la - lb) / np.maximum(np.abs(lb), 1e-8)
    corr = float(np.corrcoef(la, lb)[0, 1]) if n > 1 else 1.0
    print(f"steps compared: {n}")
    print(f"max rel diff:   {rel.max():.4e} (step {int(rel.argmax())})")
    print(f"mean rel diff:  {rel.mean():.4e}")
    print(f"curve corr:     {corr:.6f}")
    ok = rel.max() <= rtol
    print("PARITY OK" if ok else f"PARITY FAIL (rtol {rtol})")
    return 0 if ok else 1


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--model_name", default="ltx_video")
    p.add_argument("--pretrained_model_name_or_path", default="Lightricks/LTX-Video")
    p.add_argument("--training_type", default="lora")
    p.add_argument("--rank", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--precomputation_items", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dataset_config", default=None,
                   help="use an existing dataset config instead of the seeded synthetic one")
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None, help="write the loss curve JSON here")
    p.add_argument("--compare", nargs=2, metavar=("OURS", "REFERENCE"),
                   help="compare two loss-curve JSONs and exit")
    p.add_argument("--rtol", type=float, default=0.05,
                   help="max per-step relative loss difference for PARITY OK")
    p.add_argument("--print-reference-command", action="store_true")
    p.add_argument("extra_args", nargs="*", help="extra flags passed through to train.py")
    args = p.parse_args()

    if args.compare:
        raise SystemExit(compare(args.compare[0], args.compare[1], args.rtol))

    if args.print_reference_command:
        print(
            "cd /root/reference && python train.py"
            f" --model_name {args.model_name}"
            f" --pretrained_model_name_or_path {args.pretrained_model_name_or_path}"
            " --parallel_backend ptd --training_type lora"
            f" --rank {args.rank} --lora_alpha {args.rank}"
            f" --batch_size {args.batch_size} --train_steps {args.steps}"
            f" --seed {args.seed} --lr {args.lr} --lr_scheduler constant"
            " --optimizer adamw --beta1 0.9 --beta2 0.999 --weight_decay 0.0"
            " --max_grad_norm 1.0"
            " --dataset_config <same config.json> --precomputation_items"
            f" {args.precomputation_items} --enable_precomputation"
            " # losses land in the sequential tracker / wandb export"
        )
        return

    result = run(args)
    out = args.out or "/tmp/parity_losses.json"
    pathlib.Path(out).write_text(json.dumps(result, indent=2))
    print(json.dumps({"written": out, "steps": result["steps"],
                      "first_loss": result["losses"][:1], "last_loss": result["losses"][-1:]}))


if __name__ == "__main__":
    main()
