"""Worker process for tests/parallel/test_multiprocess.py.

Each worker is a REAL `jax.distributed` process (gloo CPU collectives, 2 local
virtual devices) — the analog of one torchrun rank in the reference's test
matrix (`/root/reference/tests/README.md`). It exercises, across actual
process boundaries: all_gather_object, DPDataLoader round-robin rank sharding,
and full trainer runs (precompute -> train steps -> Orbax distributed
checkpoint -> resume), then writes a JSON result for the parent test to
assert on.
"""

import argparse
import json
import os
import pathlib
import sys


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--port", required=True)
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--outdir", required=True, help="where to write result_<pid>.json")
    p.add_argument("--dataset-config", required=True)
    p.add_argument("--output-dir", required=True, help="trainer output dir (shared fs)")
    p.add_argument("--train-steps", type=int, default=6)
    p.add_argument("--checkpointing-steps", type=int, default=3)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dp-shards", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--checkpoint-on-preemption", action="store_true")
    args = p.parse_args()

    # Environment must be pinned BEFORE jax initializes its backend.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={args.local_devices}"
    os.environ["HF_HUB_OFFLINE"] = "1"
    os.environ.pop("COORDINATOR_ADDRESS", None)

    repo_root = pathlib.Path(__file__).resolve().parents[2]
    sys.path.insert(0, str(repo_root))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }

    # ---- all_gather_object across real process boundaries (ragged payloads
    # exercise the max-length pad path, parallel/utils.py).
    from finetrainers_tpu.parallel.utils import all_gather_object

    gathered = all_gather_object({"pid": args.process_id, "blob": "x" * (11 + 37 * args.process_id)})
    result["all_gather_pids"] = [g["pid"] for g in gathered]
    result["all_gather_lens"] = [len(g["blob"]) for g in gathered]

    # ---- DPDataLoader round-robin rank sharding (the split_dataset_by_node
    # analog) — processes must see disjoint interleaved samples.
    from finetrainers_tpu.data.dataloader import DPDataLoader

    loader = DPDataLoader(
        rank=jax.process_index(), dataset=list(range(12)),
        batch_size=1, num_replicas=jax.process_count(),
        collate_fn=lambda items: items[0],
    )
    result["loader_samples"] = list(loader)

    # ---- real trainer steps over the distributed mesh
    import train

    argv = [
        "--model_name", "dummy", "--pretrained_model_name_or_path", "dummy",
        "--dataset_config", args.dataset_config,
        "--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
        "--batch_size", str(args.batch_size), "--dp_shards", str(args.dp_shards),
        "--train_steps", str(args.train_steps),
        "--checkpointing_steps", str(args.checkpointing_steps),
        "--precomputation_items", "4",
        "--transformer_dtype", "fp32",
        "--output_dir", args.output_dir, "--seed", "42",
    ]
    if args.resume:
        argv += ["--resume_from_checkpoint", "latest"]
    if args.checkpoint_on_preemption:
        argv += ["--checkpoint_on_preemption"]
    trainer = train.main(argv)
    ts = trainer.state.train_state
    result["final_step"] = int(ts.step)
    result["losses"] = [float(x) for x in ts.global_avg_losses]
    result["observed_data_samples"] = int(ts.observed_data_samples)
    ckpt_dir = pathlib.Path(args.output_dir) / "checkpoints"
    result["checkpoints"] = sorted(os.listdir(ckpt_dir)) if ckpt_dir.exists() else []

    out = pathlib.Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"result_{args.process_id}.json").write_text(json.dumps(result))


if __name__ == "__main__":
    main()
