"""End-to-end SFT trainer integration tests (the reference's main test strategy,
`tests/trainer/test_sft_trainer.py`): tiny on-disk dataset + dummy spec, real
optimizer steps, checkpoint mid-run, resume, LoRA export — on the in-process
8-device CPU mesh instead of torchrun."""

import csv
import json
import os
import pathlib
import sys

import numpy as np
import pytest


REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("tiny_ds")
    rows = []
    rng = np.random.RandomState(0)
    for i in range(4):
        path = root / f"vid{i}.mp4"
        writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (64, 64))
        for _ in range(8):
            writer.write((rng.rand(64, 64, 3) * 255).astype(np.uint8))
        writer.release()
        rows.append({"file_name": f"vid{i}.mp4", "caption": f"a dummy video number {i}"})
    with open(root / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
        w.writeheader()
        [w.writerow(r) for r in rows]
    config = {
        "datasets": [
            {
                "data_root": str(root),
                "dataset_type": "video",
                "video_resolution_buckets": [[4, 32, 32]],
                "reshape_mode": "bicubic",
                "remove_common_llm_caption_prefixes": True,
            }
        ]
    }
    config_path = root / "config.json"
    config_path.write_text(json.dumps(config))
    val_path = root / "validation.csv"
    with open(val_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["caption", "height", "width", "num_frames"])
        w.writeheader()
        w.writerow({"caption": "validation clip", "height": 32, "width": 32, "num_frames": 1})
    return {"config": str(config_path), "validation": str(val_path)}


def _run_training(tmp_path, tiny_dataset, extra_args, train_steps=10):
    import train

    argv = [
        "--model_name", "dummy", "--pretrained_model_name_or_path", "dummy",
        "--dataset_config", tiny_dataset["config"],
        "--train_steps", str(train_steps), "--checkpointing_steps", "6",
        "--precomputation_items", "4",
        "--transformer_dtype", "fp32",
        "--output_dir", str(tmp_path), "--seed", "42",
    ] + extra_args
    return train.main(argv)


class TestSFTTrainer:
    def test_lora_fsdp8(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8"],
        )
        ckpts = sorted(os.listdir(tmp_path / "checkpoints"))
        assert any(c.startswith("finetrainers_step_") for c in ckpts)
        lora_exports = sorted(os.listdir(tmp_path / "lora_weights"))
        assert "000010" in lora_exports

    def test_lora_export_loadable(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8"],
            train_steps=6,
        )
        from finetrainers_tpu.lora import load_lora_weights

        state, config = load_lora_weights(str(tmp_path / "lora_weights" / "000006"))
        assert config["r"] == 4
        # diffusers/peft key convention (reference export format,
        # trainer/sft_trainer/trainer.py:284-298)
        assert all(k.startswith("transformer.") for k in state)
        assert all((".lora_A.weight" in k or ".lora_B.weight" in k) for k in state)
        assert len(state) > 0

    def test_lora_export_loads_in_torch(self, tmp_path, tiny_dataset):
        """The exported safetensors must be loadable by torch tooling with
        peft-shaped tensors (lora_A: (r, in), lora_B: (out, r)) — the artifact
        the reference ecosystem consumes (diffusers load_lora_weights)."""
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8"],
            train_steps=4,
        )
        import safetensors.torch

        path = tmp_path / "lora_weights" / "000004" / "pytorch_lora_weights.safetensors"
        state = safetensors.torch.load_file(str(path))
        assert state, "no tensors in export"
        for key, tensor in state.items():
            assert tensor.ndim == 2, (key, tensor.shape)
            if ".lora_A.weight" in key:
                assert tensor.shape[0] == 4, (key, tensor.shape)  # (r, in)
            elif ".lora_B.weight" in key:
                assert tensor.shape[1] == 4, (key, tensor.shape)  # (out, r)
        meta = safetensors.safe_open(str(path), framework="pt").metadata()
        assert "lora_config" in meta

    def test_lora_pipeline_parallel(self, tmp_path, tiny_dataset, monkeypatch):
        """--pp_degree 2 trains end-to-end (beyond the reference, which raises
        for pp > 1: trainer/sft_trainer/trainer.py:91-94). pp=2 x dp_degree=2 x
        dp_shards=2 over the 8-device mesh; the dummy stack is deepened to 4
        scanned layers so it splits into two pipeline stages."""
        from finetrainers_tpu.models.dummy.base_specification import DummyModelSpecification

        monkeypatch.setattr(
            DummyModelSpecification, "transformer_config_overrides",
            {"num_layers": 4, "use_scan": True},
        )
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--pp_degree", "2", "--dp_degree", "2",
             "--dp_shards", "2"],
            train_steps=6,
        )
        lora_exports = sorted(os.listdir(tmp_path / "lora_weights"))
        assert "000006" in lora_exports
        # The trainer must clear the trace-time pipeline routing on teardown.
        from finetrainers_tpu.parallel import get_pipeline_context

        assert get_pipeline_context() is None

    def test_full_finetune_hsdp(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "full-finetune", "--batch_size", "1",
             "--dp_degree", "2", "--dp_shards", "4"],
            train_steps=4,
        )
        assert (tmp_path / "model_weights").exists()

    def test_resume_continues_step_count(self, tmp_path, tiny_dataset):
        args = ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
                "--batch_size", "1", "--dp_shards", "8"]
        _run_training(tmp_path, tiny_dataset, args, train_steps=6)
        _run_training(tmp_path, tiny_dataset, args + ["--resume_from_checkpoint", "latest"], train_steps=9)
        ckpts = sorted(os.listdir(tmp_path / "checkpoints"))
        assert "finetrainers_step_9" in ckpts

    def test_prefetch_workers_and_resume(self, tmp_path, tiny_dataset):
        """--dataloader_num_workers > 0 activates grain-style device prefetch;
        checkpoints must carry the consumed (not produced-ahead) loader state so
        resume lands on the right sample."""
        args = ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
                "--batch_size", "1", "--dp_shards", "8",
                "--dataloader_num_workers", "1"]
        _run_training(tmp_path, tiny_dataset, args, train_steps=6)
        _run_training(tmp_path, tiny_dataset, args + ["--resume_from_checkpoint", "latest"], train_steps=9)
        ckpts = sorted(os.listdir(tmp_path / "checkpoints"))
        assert "finetrainers_step_9" in ckpts

    def test_validation_artifacts(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--validation_dataset_file", tiny_dataset["validation"],
             "--validation_steps", "6"],
            train_steps=6,
        )
        val_dir = tmp_path / "validation" / "000006"
        assert val_dir.exists() and len(list(val_dir.iterdir())) > 0

    def test_final_validation_reloads_exports(self, tmp_path, tiny_dataset):
        """The final validation pass must rebuild the pipeline from the on-disk
        export artifacts (fresh base + exported LoRA), not the live params
        (reference trainer/sft_trainer/trainer.py:772-822)."""
        import jax
        import numpy as np

        trainer = _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8"],
            train_steps=6,
        )
        from finetrainers_tpu.models.modeling_utils import flatten_params

        trained = {
            k: np.asarray(v)
            for k, v in flatten_params(trainer._trainable).items()
            if v is not None and "lora_" in k
        }
        # Tamper with the LIVE trainable params: if the final pipeline still shows
        # the trained values, it must have come from the exported safetensors.
        trainer._trainable = jax.tree_util.tree_map(
            lambda x: x * 0.0 if x is not None else None,
            trainer._trainable,
            is_leaf=lambda x: x is None,
        )
        pipeline = trainer._init_validation_pipeline(final=True)
        reloaded = flatten_params(pipeline.transformer.params)
        for key, value in trained.items():
            np.testing.assert_allclose(
                np.asarray(reloaded[key], np.float32), value.astype(np.float32),
                rtol=1e-6, atol=1e-6, err_msg=key,
            )

    def test_adamw_8bit_states(self, tmp_path, tiny_dataset, monkeypatch):
        """8-bit optimizer states train end-to-end on the sharded mesh and the
        checkpointed opt state round-trips (bnb parity, reference optimizer.py:92-188)."""
        # The dummy model's LoRA tensors are < bnb's 4096-element cutoff; lower it
        # so the quantized path actually runs inside the jitted sharded step.
        monkeypatch.setenv("FINETRAINERS_8BIT_MIN_SIZE", "64")
        trainer = _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--optimizer", "adamw-bnb-8bit"],
            train_steps=4,
        )
        import jax

        from finetrainers_tpu.optim8bit import _Quantized

        quantized = [
            leaf for leaf in jax.tree_util.tree_leaves(
                trainer._opt_state, is_leaf=lambda x: isinstance(x, _Quantized))
            if isinstance(leaf, _Quantized)
        ]
        assert quantized, "big moment tensors must be stored quantized"
        assert all(q.codes.dtype.name == "int8" for q in quantized)
        assert all(np.isfinite(v) for v in trainer.state.train_state.global_avg_losses)

    def test_precomputation_on_disk(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8", "--enable_precomputation"],
            train_steps=4,
        )
        precomp = tmp_path / "precomputed" / "finetrainers-precomputed-data"
        assert precomp.exists()
        files = list(precomp.iterdir())
        assert any(f.name.startswith("condition-") for f in files)
        assert any(f.name.startswith("latent-") for f in files)

    def test_cp_mesh_training(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "2", "--cp_degree", "2", "--tp_degree", "2"],
            train_steps=3,
        )
        assert (tmp_path / "checkpoints").exists()

    def test_grad_accumulation(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--gradient_accumulation_steps", "2"],
            train_steps=4,
        )

    def test_steps_per_dispatch_fused(self, tmp_path, tiny_dataset):
        """--steps_per_dispatch fuses K optimizer steps into one lax.scan
        dispatch; step counters and rng folding stay per-step so the run
        completes the exact requested train_steps."""
        trainer = _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--steps_per_dispatch", "3", "--logging_steps", "6",
             "--checkpointing_steps", "6"],
            train_steps=7,
        )
        assert trainer.state.train_state.step == 7
        # cadence boundary at 6 must have produced a checkpoint despite fusion
        ckpts = [d.name for d in pathlib.Path(tmp_path).rglob("finetrainers_step_*")]
        assert any(name.endswith("_6") for name in ckpts), ckpts

    def test_gradient_checkpointing(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8", "--gradient_checkpointing"],
            train_steps=3,
        )

    def test_gradient_checkpointing_ops_attn(self, tmp_path, tiny_dataset):
        # the long-sequence policy: save only attention residuals + norm stats,
        # recompute all matmuls in the backward
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--gradient_checkpointing",
             "--gradient_checkpointing_type", "ops_attn"],
            train_steps=3,
        )

    def test_loss_decreases(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "full-finetune", "--batch_size", "1",
             "--dp_shards", "8", "--lr", "1e-3"],
            train_steps=30,
        )
        log_file = tmp_path / "logs" / "finetrainers.jsonl"
        losses = [json.loads(l)["train/global_avg_loss"] for l in log_file.read_text().splitlines()
                  if "train/global_avg_loss" in l]
        assert len(losses) >= 20
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), f"loss did not decrease: {losses[:5]} -> {losses[-5:]}"


class TestFP8Storage:
    def test_fp8_layerwise_training(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--layerwise_upcasting_modules", "transformer"],
            train_steps=3,
        )
        assert (tmp_path / "checkpoints").exists()

    def test_int8_storage_loss_decreases(self, tmp_path, tiny_dataset):
        """Convergence sanity for the int8 frozen-matmul path: the ~1%
        quantization noise on the frozen base must not stop LoRA training
        from fitting the tiny dataset (mirrors TestSFTTrainer.test_loss_decreases)."""
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "8", "--lora_alpha", "16",
             "--batch_size", "1", "--dp_shards", "8", "--lr", "1e-3",
             "--layerwise_upcasting_modules", "transformer",
             "--layerwise_upcasting_storage_dtype", "int8"],
            train_steps=30,
        )
        log_file = tmp_path / "logs" / "finetrainers.jsonl"
        losses = [json.loads(l)["train/global_avg_loss"] for l in log_file.read_text().splitlines()
                  if "train/global_avg_loss" in l]
        assert len(losses) >= 20
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), \
            f"loss did not decrease under int8 storage: {losses[:5]} -> {losses[-5:]}"

    def test_int8_storage_training(self, tmp_path, tiny_dataset):
        """--layerwise_upcasting_storage_dtype int8 (beyond-reference): frozen
        kernels stored int8 with qscale sidecars, frozen matmuls on the int8
        path (ops/int8_linear), LoRA still training e2e under dp_shard."""
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "8",
             "--layerwise_upcasting_modules", "transformer",
             "--layerwise_upcasting_storage_dtype", "int8"],
            train_steps=3,
        )
        assert (tmp_path / "checkpoints").exists()

    def test_fp8_cast_skips_norms_and_embeds(self):
        import jax.numpy as jnp
        from finetrainers_tpu.utils.fp8 import apply_layerwise_storage_dtype

        params = {
            "blocks_0": {"attn1": {"to_q": {"kernel": jnp.ones((8, 8)), "bias": jnp.ones((8,))}},
                         "norm1": {"scale": jnp.ones((8,))}},
            "patch_embed": {"kernel": jnp.ones((8, 8))},
        }
        out = apply_layerwise_storage_dtype(params)
        assert out["blocks_0"]["attn1"]["to_q"]["kernel"].dtype == jnp.float8_e4m3fn
        assert out["blocks_0"]["attn1"]["to_q"]["bias"].dtype == jnp.float32
        assert out["patch_embed"]["kernel"].dtype == jnp.float32
        assert out["blocks_0"]["norm1"]["scale"].dtype == jnp.float32


class TestRingAttentionCP:
    def test_ring_provider_cp_training(self, tmp_path, tiny_dataset):
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "2", "--cp_degree", "4",
             "--attn_provider_training", "transformer:ring"],
            train_steps=3,
        )
        assert (tmp_path / "checkpoints").exists()

    def test_ulysses_provider_cp_training(self, tmp_path, tiny_dataset):
        """All-to-all CP through the CLI: dummy has 4 heads, so cp=2 head-shards
        cleanly (heads % cp == 0)."""
        _run_training(
            tmp_path, tiny_dataset,
            ["--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
             "--batch_size", "1", "--dp_shards", "4", "--cp_degree", "2",
             "--attn_provider_training", "transformer:ulysses"],
            train_steps=3,
        )
        assert (tmp_path / "checkpoints").exists()


class TestPreemptionCheckpoint:
    """--checkpoint_on_preemption: SIGTERM (the cloud-TPU preemption notice)
    makes the loop finish the in-flight step, save a full resumable checkpoint,
    and exit cleanly — beyond the reference, which loses progress since the
    last checkpointing_steps interval."""

    def _build_trainer(self, cls, tmp_path, tiny_dataset, train_steps):
        from finetrainers_tpu.args import AttentionProviderArgs, BaseArgs
        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.trainer.sft_trainer import SFTLowRankConfig

        args = BaseArgs()
        args.register_args(AttentionProviderArgs())
        args.register_args(SFTLowRankConfig())
        args.parse_args([
            "--model_name", "dummy", "--pretrained_model_name_or_path", "dummy",
            "--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
            "--dataset_config", tiny_dataset["config"],
            "--train_steps", str(train_steps), "--checkpointing_steps", "100",
            "--precomputation_items", "4", "--batch_size", "1",
            "--transformer_dtype", "fp32", "--dp_shards", "8",
            "--output_dir", str(tmp_path), "--seed", "42",
            "--checkpoint_on_preemption",
        ])
        spec = _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="dummy")
        return cls(args, spec)

    def test_sigterm_checkpoints_and_resumes(self, tmp_path, tiny_dataset):
        import signal
        import time

        from finetrainers_tpu.trainer.sft_trainer import SFTTrainer

        fired = []

        class PreemptedTrainer(SFTTrainer):
            # Fires a REAL SIGTERM at the step-2 boundary: the genuine handler
            # (installed at _train start) flips the flag the loop polls.
            def _preemption_agreed(self):
                if self.state.train_state.step == 2 and not fired:
                    fired.append(os.kill(os.getpid(), signal.SIGTERM))
                    time.sleep(0.05)  # bytecode boundary for signal delivery
                return super()._preemption_agreed()

        trainer = self._build_trainer(PreemptedTrainer, tmp_path, tiny_dataset, train_steps=10)
        trainer.run()

        assert fired, "SIGTERM was never sent"
        assert trainer._preemption_requested, "handler did not run"
        assert trainer.state.train_state.step == 2, "loop did not stop at the preempted step"
        assert (tmp_path / "checkpoints" / "finetrainers_step_2").exists()
        # default SIGTERM disposition restored after training
        assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler)

        # The preemption checkpoint is resume-exact: a fresh run continues to completion.
        resumed = self._build_trainer(SFTTrainer, tmp_path, tiny_dataset, train_steps=4)
        object.__setattr__(resumed.args, "resume_from_checkpoint", "latest")
        resumed.run()
        assert resumed.state.train_state.step == 4
        assert (tmp_path / "checkpoints" / "finetrainers_step_4").exists()


@pytest.fixture(scope="module")
def mixed_bucket_dataset(tmp_path_factory):
    """Two resolution buckets so fused-dispatch groups hit shape changes and
    exercise the one-batch pushback (`pending`) path."""
    import cv2

    root = tmp_path_factory.mktemp("mixed_ds")
    rows = []
    rng = np.random.RandomState(0)
    # Bucket choice is aspect-ratio driven (functional/video.py:key), so mixed
    # buckets need mixed aspect ratios: square -> [4,32,32], 2:1 -> [4,32,64].
    for i, (w_px, h_px) in enumerate([(64, 64), (128, 64)] * 3):
        path = root / f"vid{i}.mp4"
        writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 8, (w_px, h_px))
        for _ in range(8):
            writer.write((rng.rand(h_px, w_px, 3) * 255).astype(np.uint8))
        writer.release()
        rows.append({"file_name": f"vid{i}.mp4", "caption": f"clip {i}"})
    with open(root / "metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_name", "caption"])
        w.writeheader()
        [w.writerow(r) for r in rows]
    config = {
        "datasets": [
            {
                "data_root": str(root),
                "dataset_type": "video",
                "video_resolution_buckets": [[4, 32, 32], [4, 32, 64]],
                "reshape_mode": "bicubic",
            }
        ]
    }
    config_path = root / "config.json"
    config_path.write_text(json.dumps(config))
    return {"config": str(config_path)}


class TestFusedDispatchPending:
    def _parse(self, tmp_path, mixed_bucket_dataset, extra):
        from finetrainers_tpu.args import AttentionProviderArgs, BaseArgs

        args = BaseArgs()
        args.register_args(AttentionProviderArgs())
        from finetrainers_tpu.trainer.sft_trainer import SFTLowRankConfig

        args.register_args(SFTLowRankConfig())
        args.parse_args([
            "--model_name", "dummy", "--pretrained_model_name_or_path", "dummy",
            "--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
            "--dataset_config", mixed_bucket_dataset["config"],
            "--checkpointing_steps", "100", "--steps_per_dispatch", "4",
            "--precomputation_items", "6", "--batch_size", "1",
            "--transformer_dtype", "fp32", "--dp_shards", "8",
            "--output_dir", str(tmp_path), "--seed", "42",
        ] + extra)
        return args

    def test_max_data_samples_caps_fused_group(self, tmp_path, mixed_bucket_dataset):
        """The fused-group limit honors max_data_samples: with a budget of one
        global batch the dispatch trains exactly one step instead of fusing
        spd steps past the cap (and never even pulls the extra batches)."""
        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.trainer.sft_trainer import SFTTrainer

        args = self._parse(tmp_path / "cap", mixed_bucket_dataset,
                           ["--train_steps", "100", "--max_data_samples", "8"])
        trainer = SFTTrainer(args, _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="dummy"))
        trainer.run()
        assert trainer.state.train_state.step == 1
        assert trainer.state.train_state.observed_data_samples == 8

    def test_pending_batch_not_marked_consumed_at_save(self, tmp_path, mixed_bucket_dataset):
        """When a shape change pushes a batch back into `pending`, a checkpoint
        taken before that batch is trained (here: the forced save at the
        preemption exit — the cadence saves can never coincide with a live
        pushback, and the sample-budget cap stops the max_data_samples exit
        from over-pulling) must record the PRE-pull dataloader position, else
        the batch is silently dropped on resume."""
        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.trainer.sft_trainer import SFTTrainer

        save_records = []

        class PreemptedRecordingTrainer(SFTTrainer):
            def _preemption_agreed(self):
                # Simulated preemption notice at the first step boundary —
                # reached right after the alternating-bucket stream pushed the
                # second (different-shaped) batch back into `pending`.
                return self.state.train_state.step >= 1

            def _save_checkpoint(self, force=False):
                save_records.append(
                    (self.state.train_state.step, self._pending_loader_state is not None)
                )
                return super()._save_checkpoint(force=force)

        args = self._parse(tmp_path, mixed_bucket_dataset, ["--train_steps", "100"])
        spec = _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="dummy")
        trainer = PreemptedRecordingTrainer(args, spec)
        trainer.run()

        assert trainer.state.train_state.step == 1
        assert any(pending for _, pending in save_records), save_records

        # Resume from that checkpoint: the pushed-back batch is re-delivered
        # (not dropped) and training continues through mixed shapes.
        args2 = self._parse(tmp_path, mixed_bucket_dataset,
                            ["--train_steps", "4", "--resume_from_checkpoint", "latest"])
        resumed = SFTTrainer(args2, _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="dummy"))
        resumed.run()
        assert resumed.state.train_state.step == 4


class TestStreamDatasetCoverage:
    def test_consume_path_cycles_whole_dataset(self, tmp_path, mixed_bucket_dataset):
        """The batch stream must visit EVERY dataset item across preprocessor
        refills and deliver both resolution buckets (regression: a drained
        once-buffer used to re-trigger refills that discarded all but the
        first item of each refill, so one bucket/subset trained forever)."""
        from finetrainers_tpu.args import AttentionProviderArgs, BaseArgs
        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.data.sampler import ResolutionSampler
        from finetrainers_tpu.trainer.sft_trainer import SFTLowRankConfig, SFTTrainer

        args = BaseArgs()
        args.register_args(AttentionProviderArgs())
        args.register_args(SFTLowRankConfig())
        args.parse_args([
            "--model_name", "dummy", "--pretrained_model_name_or_path", "dummy",
            "--training_type", "lora", "--rank", "4", "--lora_alpha", "4",
            "--dataset_config", mixed_bucket_dataset["config"],
            "--precomputation_items", "6", "--batch_size", "1",
            "--transformer_dtype", "fp32", "--dp_shards", "8",
            "--output_dir", str(tmp_path), "--seed", "42", "--train_steps", "100",
        ])
        spec = _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="dummy")
        trainer = SFTTrainer(args, spec)
        trainer._prepare_models()
        trainer._prepare_trainable_parameters()
        trainer._prepare_for_training()
        trainer._prepare_dataset()

        seen_captions = set()
        orig_prepare = spec.prepare_conditions

        def recording_prepare(caption="", **kw):
            seen_captions.add(caption)
            return orig_prepare(caption=caption, **kw)

        spec.prepare_conditions = recording_prepare
        # Rebuild the preprocessor closure over the wrapped function.
        trainer._prepare_dataset()

        import jax

        sampler = ResolutionSampler(8, spec._resolution_dim_keys)
        stream = trainer._sharded_batch_stream(sampler, 8)
        shapes = set()
        for _ in range(6):
            _, lat = next(stream)
            shapes.add(lat["latents"].shape)
        assert shapes == {(8, 8, 4, 4, 4), (8, 8, 4, 4, 8)}, shapes
        assert seen_captions == {f"clip {i}" for i in range(6)}, seen_captions
