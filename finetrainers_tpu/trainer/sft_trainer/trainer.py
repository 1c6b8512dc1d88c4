"""SFT trainer: the full LoRA / full-finetune training lifecycle.

Parity with reference `finetrainers/trainer/sft_trainer/trainer.py:33-946`:
`run()` = prepare models -> trainable params -> training -> dataset ->
checkpointing -> train loop, with precomputation, resolution-bucketed batching,
grad accumulation, grad-norm clipping, loss tracking, checkpoint/resume
(incl. dataloader position), validation sampling, and LoRA/model export.

TPU-native redesign:
  - One jitted `train_step` per resolution bucket (static shapes); GSPMD derives
    DDP/FSDP/HSDP/TP collectives from the param/batch shardings (no wrapper
    modules — compare reference `_prepare_for_training` :138-234).
  - Gradient accumulation via `optax.MultiSteps` inside the step (no Python-side
    `loss.backward()` bookkeeping).
  - Donated params/opt-state buffers (in-place update, halves peak HBM).
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ...data import (
    DevicePrefetcher,
    DPDataLoader,
    ResolutionSampler,
    ValidationDataset,
    combine_datasets,
    initialize_dataset,
    initialize_preprocessor,
    wrap_iterable_dataset_for_preprocessing,
)
from ...functional.diffusion import compute_loss_weighting
from ...logging import get_logger
from ...lora import (
    apply_lora_to_module_params,
    load_lora_weights,
    lora_mask,
    merge_params,
    split_params,
    trainable_mask,
)
from ...models.modeling_utils import ModelHandle, count_params
from ...optimizer import get_lr_scheduler, get_optimizer
from ...parallel import make_param_shardings, shard_pytree
from ...parallel.checkpoint import OrbaxCheckpointer
from ...trackers import initialize_trackers
from ...utils.memory import get_memory_statistics
from ..base import Trainer


logger = get_logger(__name__)


class SFTTrainer(Trainer):
    def __init__(self, args, model_specification) -> None:
        super().__init__(args, model_specification)
        self.transformer: Optional[ModelHandle] = None
        self.vae: Optional[ModelHandle] = None
        self.scheduler = None
        self.checkpointer: Optional[OrbaxCheckpointer] = None
        self._train_step_fn = None

    # ------------------------------------------------------------------- run
    def run(self) -> None:
        try:
            self._prepare_models()
            self._prepare_trainable_parameters()
            self._prepare_for_training()
            self._prepare_dataset()
            self._prepare_checkpointing()
            self._train()
        except Exception as e:
            logger.error(f"Error during training: {e}")
            raise
        finally:
            if self.checkpointer is not None:
                self.checkpointer.wait_until_finished()
            self.mesh_env.destroy()

    # ---------------------------------------------------------------- prepare
    def _prepare_models(self) -> None:
        spec = self.model_specification
        if self.args.training_type in ("lora",):
            spec.lora_rank = getattr(self.args, "rank", 64)
            spec.lora_alpha = getattr(self.args, "lora_alpha", 64)
        # Per-block remat policy + scan-over-layers (regional compile). The
        # reference applies checkpoint_wrapper per block + torch.compile
        # regionally (utils/activation_checkpoint.py:20-71, utils/torch.py:44-65);
        # here both are flags on the transformer module (models/layers.block_stack).
        if self.args.gradient_checkpointing:
            spec.gradient_checkpointing = getattr(self.args, "gradient_checkpointing_type", "full")
        if "transformer" in (self.args.compile_modules or []):
            scopes = self.args.compile_scopes or ["regional"]
            scope = scopes[min((self.args.compile_modules or []).index("transformer"), len(scopes) - 1)]
            spec.use_scan = scope == "regional"
        diffusion = spec.load_diffusion_models()
        self.transformer = diffusion["transformer"]
        self.scheduler = diffusion["scheduler"]
        latents = spec.load_latent_models()
        self.vae = latents["vae"]
        # Memory-bounded encode modes (reference utils/diffusion.py:154-158).
        if getattr(self.args, "enable_slicing", False):
            self.vae.enable_slicing()
        if getattr(self.args, "enable_tiling", False):
            self.vae.enable_tiling()
        self.condition_models = spec.load_condition_models()

    def _prepare_trainable_parameters(self) -> None:
        params = self.transformer.params
        if self.args.training_type == "lora":
            mask = lora_mask(params)
        else:
            mask = trainable_mask(params, lambda s: True)
        self._trainable_mask = mask
        self._finalize_trainable(params, mask)

    def _finalize_trainable(self, params, mask) -> None:
        trainable, frozen = split_params(params, mask)

        # FP8 layerwise weight storage (reference --layerwise_upcasting_modules):
        # frozen weights stored as fp8 in HBM; upcast fuses into consuming matmuls.
        applied_int8 = False
        if "transformer" in (getattr(self.args, "layerwise_upcasting_modules", None) or []):
            storage_dtype = self.args.layerwise_upcasting_storage_dtype
            if storage_dtype == jnp.int8:
                applied_int8 = True
                # Beyond-reference: int8 storage also moves the frozen matmuls
                # onto the 2x-rate int8 MXU path (ops/int8_linear; LoRADense
                # routes on the kernel dtype). Same skip patterns as fp8.
                from ...utils.int8 import apply_int8_storage

                frozen = apply_int8_storage(
                    frozen,
                    skip_patterns=self.args.layerwise_upcasting_skip_modules_pattern,
                )
                logger.info("Applied int8 weight storage + MXU compute path to frozen transformer params")
            else:
                from ...utils.fp8 import apply_layerwise_storage_dtype

                frozen = apply_layerwise_storage_dtype(
                    frozen,
                    storage_dtype=storage_dtype,
                    skip_patterns=self.args.layerwise_upcasting_skip_modules_pattern,
                )
                logger.info("Applied fp8 layerwise weight storage to frozen transformer params")

        # Declarative sharding: FSDP dim inference + per-model TP rules.
        shardings = make_param_shardings(
            params, self.mesh_env.mesh, tp_rules=self.model_specification.tp_rules()
        )
        self._param_shardings = shardings
        t_shard = jax.tree_util.tree_map(lambda x, m, s: s if m else None, params, mask, shardings)
        f_shard = jax.tree_util.tree_map(lambda x, m, s: None if m else s, params, mask, shardings)
        if applied_int8:
            # int8 storage added kernel_qscale sidecar leaves to `frozen` that
            # the pre-transform sharding tree lacks; scales are tiny 1D rows —
            # replicate them.
            rep = jax.sharding.NamedSharding(
                self.mesh_env.mesh, jax.sharding.PartitionSpec()
            )

            def _with_sidecars(fr, sh):
                if not isinstance(fr, dict):
                    return sh
                sh = sh if isinstance(sh, dict) else {}
                return {
                    k: (rep if k.endswith("_qscale") and k not in sh
                        else _with_sidecars(v, sh.get(k)))
                    for k, v in fr.items()
                }

            f_shard = _with_sidecars(frozen, f_shard)
        self._t_shard = t_shard
        self._trainable = shard_pytree(
            jax.tree_util.tree_map(lambda x: x, trainable),
            t_shard,
        )
        self._frozen = shard_pytree(frozen, f_shard)
        n_train = count_params(self._trainable)
        n_total = count_params(params)
        self.state.num_trainable_parameters = n_train
        logger.info(f"Trainable params: {n_train:,} / {n_total:,}")

    def _prepare_for_training(self) -> None:
        args = self.args
        schedule = get_lr_scheduler(
            args.lr_scheduler, args.lr, warmup_steps=args.lr_warmup_steps,
            train_steps=args.train_steps, num_cycles=args.lr_num_cycles, power=args.lr_power,
        )
        self._lr_schedule = schedule
        base_opt = get_optimizer(
            args.optimizer, schedule, beta1=args.beta1, beta2=args.beta2, beta3=args.beta3,
            epsilon=args.epsilon, weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        )
        if args.gradient_accumulation_steps > 1:
            self.optimizer = optax.MultiSteps(base_opt, args.gradient_accumulation_steps)
        else:
            self.optimizer = base_opt
        # Optimizer moments inherit the param shardings (suffix-path matching);
        # counters are replicated. Init under jit with explicit out_shardings.
        from ...parallel import derive_opt_state_shardings

        abstract_opt = jax.eval_shape(self.optimizer.init, self._trainable)
        self._opt_shardings = derive_opt_state_shardings(
            abstract_opt, self._t_shard, self.mesh_env.mesh
        )
        self._opt_state = jax.jit(self.optimizer.init, out_shardings=self._opt_shardings)(self._trainable)

        os.makedirs(args.output_dir, exist_ok=True)
        self.tracker = initialize_trackers(
            [args.report_to] if args.report_to != "none" else ["jsonl"],
            experiment_name=args.tracker_name,
            config=_jsonable(self.args.to_dict()),
            log_dir=os.path.join(args.output_dir, args.logging_dir),
            is_main_process=self.mesh_env.is_main_process,
        )
        self._train_step_fn = self._build_train_step()

    def _build_train_step(self):
        spec = self.model_specification
        scheduler = self.scheduler
        module = self.transformer.module
        config = self.transformer.config
        optimizer = self.optimizer
        args = self.args
        gradient_checkpointing = args.gradient_checkpointing

        def train_step(trainable, frozen, opt_state, conditions, latent_conditions, rng):
            rng_sigmas, rng_fwd = jax.random.split(rng)
            batch_size = latent_conditions["latents"].shape[0]
            sigmas = scheduler.training_sigmas(
                rng_sigmas, batch_size,
                flow_weighting_scheme=args.flow_weighting_scheme,
                flow_logit_mean=args.flow_logit_mean,
                flow_logit_std=args.flow_logit_std,
                flow_mode_scale=args.flow_mode_scale,
            )
            if args.flow_shift != 1.0 and hasattr(scheduler, "shift") and scheduler.shift == 1.0:
                from ...functional.diffusion import default_flow_shift

                sigmas = default_flow_shift(sigmas, args.flow_shift)

            def forward(params, sigmas, rng_fwd):
                handle = ModelHandle(module, params, config)
                return spec.forward(handle, conditions, latent_conditions, sigmas, rng_fwd)

            # Per-block remat happens inside the module (block_stack) when it
            # advertises the knob; the whole-forward wrap remains only as a
            # fallback for custom modules without per-block support.
            module_handles_remat = getattr(module, "gradient_checkpointing", None) is not None or (
                hasattr(module, "scan_stacks") and getattr(module, "_checkpoint", lambda: None)() is not None
            )
            if gradient_checkpointing and not module_handles_remat:
                from ...utils.activation_checkpoint import apply_activation_checkpointing

                forward = apply_activation_checkpointing(
                    forward, checkpoint_type=getattr(args, "gradient_checkpointing_type", "full")
                )

            def loss_fn(trainable):
                params = merge_params(trainable, frozen)
                pred, target, sigmas_out = forward(params, sigmas, rng_fwd)
                alphas = getattr(scheduler, "alphas", None)
                if alphas is not None:
                    timesteps = jnp.clip(
                        (sigmas_out * scheduler.num_train_timesteps).astype(jnp.int32),
                        0, scheduler.num_train_timesteps - 1,
                    )
                    weights = compute_loss_weighting(args.flow_weighting_scheme, alphas=alphas[timesteps])
                else:
                    weights = compute_loss_weighting(args.flow_weighting_scheme, sigmas=sigmas_out)
                w = weights.reshape(weights.shape + (1,) * (pred.ndim - 1))
                per_sample = w * (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
                loss = jnp.mean(per_sample)
                max_loss = jnp.max(jnp.mean(per_sample, axis=tuple(range(1, per_sample.ndim))))
                return loss, max_loss

            (loss, max_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
            grad_norm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, max_loss, grad_norm

        def train_step_multi(trainable, frozen, opt_state, conditions, latent_conditions,
                             rng, step_ids):
            """K optimizer steps fused into one dispatch: lax.scan over batches
            stacked on a leading axis. Each sub-step derives its rng as
            fold_in(base_rng, absolute_step) — bit-identical to running the
            steps through the host loop one at a time."""

            def body(carry, xs):
                t, o = carry
                conds, lats, step_id = xs
                t, o, loss, max_loss, gn = train_step(
                    t, frozen, o, conds, lats, jax.random.fold_in(rng, step_id)
                )
                return (t, o), (loss, max_loss, gn)

            (trainable, opt_state), (losses, maxes, gns) = jax.lax.scan(
                body, (trainable, opt_state), (conditions, latent_conditions, step_ids)
            )
            return trainable, opt_state, losses, maxes, gns

        if getattr(args, "steps_per_dispatch", 1) > 1:
            self._train_step_multi_fn = jax.jit(train_step_multi, donate_argnums=(0, 2))
        return jax.jit(train_step, donate_argnums=(0, 2))

    def _prepare_dataset(self) -> None:
        args = self.args
        with open(args.dataset_config) as f:
            config = json.load(f)
        datasets = []
        for entry in config["datasets"]:
            root = entry.get("data_root") or entry.get("dataset_file")
            dataset_type = entry.get("dataset_type", "video")
            ds = initialize_dataset(
                root, dataset_type, infinite=True,
                caption_options=entry.get("caption_options"),
            )
            if args.precomputation_once and not getattr(ds, "_precomputable_once", False):
                # reference trainer/sft_trainer/trainer.py:258-261
                raise ValueError(
                    f"Dataset {root} does not support precomputing all embeddings at once."
                )
            wrapped = wrap_iterable_dataset_for_preprocessing(
                ds,
                dataset_type,
                {
                    "id_token": entry.get("id_token"),
                    "image_resolution_buckets": [tuple(b) for b in entry.get("image_resolution_buckets", []) or []] or None,
                    "video_resolution_buckets": [tuple(b) for b in entry.get("video_resolution_buckets", []) or []] or None,
                    "reshape_mode": entry.get("reshape_mode", "bicubic"),
                    "remove_common_llm_caption_prefixes": entry.get("remove_common_llm_caption_prefixes", False),
                    "rename_columns": entry.get("rename_columns"),
                    # reference: torchdata StatefulDataLoader num_workers decode
                    # parallelism; here an order-preserving decode pool inside
                    # the preprocessing wrapper (resume-exact, see dataset.py).
                    "decode_workers": args.dataloader_num_workers,
                },
            )
            datasets.append(wrapped)
        self.dataset = combine_datasets(datasets, buffer_size=args.dataset_shuffle_buffer_size,
                                        shuffle=args.dataset_shuffle_buffer_size > 1)
        self.dataloader = DPDataLoader(
            rank=jax.process_index(),
            dataset=self.dataset,
            batch_size=1,
            num_workers=args.dataloader_num_workers,
            collate_fn=lambda items: items[0],
            num_replicas=jax.process_count(),
        )

        spec = self.model_specification
        vae = self.vae

        def process_condition(**sample):
            caption = sample.get("caption", "")
            return spec.prepare_conditions(caption=caption, **self.condition_models)

        def process_latent(**sample):
            return spec.prepare_latents(
                vae=vae, image=sample.get("image"), video=sample.get("video"),
                compute_posterior=False,
            )

        self.preprocessor = initialize_preprocessor(
            rank=jax.process_index(),
            num_items=args.precomputation_items if args.enable_precomputation else args.batch_size * 2,
            processor_fn={"condition": process_condition, "latent": process_latent},
            save_dir=args.precomputation_dir or os.path.join(args.output_dir, "precomputed"),
            enable_precomputation=args.enable_precomputation,
        )
        self._data_iterator = iter(self.dataloader)

    def _prepare_checkpointing(self) -> None:
        args = self.args

        def export_callback(state: Dict[str, Any]) -> None:
            step = int(self.state.train_state.step)
            is_lora = args.training_type in ("lora", "control-lora")
            trainable, frozen = state["trainable"], self._frozen
            if jax.process_count() > 1:
                # Cross-process shards must be all-gathered to host BEFORE the
                # main-process gate: process_allgather is a collective, and
                # np.asarray on a non-addressable array raises.
                from ...lora import _to_host

                trainable = jax.tree_util.tree_map(_to_host, trainable)
                if not is_lora:
                    frozen = jax.tree_util.tree_map(_to_host, frozen)
            if not self.mesh_env.is_main_process:
                return
            if is_lora:
                lora_dir = os.path.join(args.output_dir, "lora_weights", f"{step:06d}")
                lora_config = {
                    "r": getattr(args, "rank", 64),
                    "lora_alpha": getattr(args, "lora_alpha", 64),
                    "target_modules": getattr(args, "target_modules", ""),
                }
                self.model_specification._save_lora_weights(
                    lora_dir, trainable, lora_config, module=self.transformer.module
                )
            else:
                model_dir = os.path.join(args.output_dir, "model_weights", f"{step:06d}")
                params = merge_params(trainable, frozen)
                self.model_specification._save_model(
                    model_dir, ModelHandle(self.transformer.module, params, self.transformer.config)
                )

        self.checkpointer = OrbaxCheckpointer(
            output_dir=os.path.join(args.output_dir, "checkpoints"),
            checkpointing_steps=args.checkpointing_steps,
            checkpointing_limit=args.checkpointing_limit,
            callback_fn=export_callback,
        )

        if args.resume_from_checkpoint is not None:
            step = -1 if args.resume_from_checkpoint == "latest" else int(args.resume_from_checkpoint)
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                {"trainable": self._trainable, "opt_state": self._opt_state},
            )
            restored = self.checkpointer.load(step, abstract_state=abstract)
            if restored is not None:
                step, state, metadata = restored
                self._trainable = state["trainable"]
                self._opt_state = state["opt_state"]
                self.state.train_state.load_state_dict(metadata.get("train_state", {}))
                if "dataloader" in metadata:
                    self.dataloader.load_state_dict(metadata["dataloader"])
                    self._data_iterator = iter(self.dataloader)
                logger.info(f"Resumed from checkpoint at step {self.state.train_state.step}")

    # ------------------------------------------------------------------ train
    def _train(self) -> None:
        args = self.args
        train_state = self.state.train_state
        logger.info(f"Memory before training: {get_memory_statistics()}")
        logger.info(f"Starting training: {args.train_steps} steps")

        # --batch_size is per-data-parallel-rank (reference semantics); the global
        # batch fed to the jitted step covers every dp shard. Each PROCESS only
        # collates its own round-robin share — shard_batch assembles the global
        # array from the per-process slices (make_array_from_process_local_data).
        global_batch_size = args.batch_size * self.mesh_env.local_batch_size_divisor
        nproc = jax.process_count()
        if global_batch_size % nproc:
            raise ValueError(
                f"global batch {global_batch_size} (batch_size x dp degrees) must be "
                f"divisible by the process count {nproc}")
        process_batch_size = global_batch_size // nproc
        sampler = ResolutionSampler(process_batch_size, self.model_specification._resolution_dim_keys)

        batch_stream = self._sharded_batch_stream(sampler, global_batch_size)
        use_prefetch = args.dataloader_num_workers > 0 or args.pin_memory
        if use_prefetch and jax.default_backend() == "axon":
            # The axon development tunnel services device<->host transfers only
            # from the main thread; a background producer deadlocks on the first
            # np.asarray. Real TPU/CPU backends are unaffected.
            logger.warning(
                "Device prefetch disabled on the 'axon' tunnel backend; "
                "running batch preparation inline."
            )
            use_prefetch = False
        if use_prefetch:
            # Grain-style: host decode + device_put run ahead on a background
            # thread; each queued batch carries a loader-state snapshot so
            # checkpoints stay resume-exact (data/prefetch.py).
            batch_stream = DevicePrefetcher(
                batch_stream,
                depth=max(args.dataloader_num_workers, 1) + 1,
                snapshot_fn=lambda: _jsonable(self.dataloader.state_dict()),
            )
        self._batch_stream = batch_stream

        prev_sigterm = self._install_preemption_handler()

        step_times: List[float] = []
        spd = max(getattr(args, "steps_per_dispatch", 1), 1)
        pending: List[Any] = []  # one-batch pushback when shapes change mid-group
        # Loader state to checkpoint while `pending` holds an un-trained batch:
        # that batch is already past the live/consumed snapshot, so saving the
        # snapshot taken BEFORE it was pulled keeps resume exact (the batch is
        # re-delivered instead of silently dropped).
        self._pending_loader_state = None
        first_session_step = train_state.step
        while train_state.step < args.train_steps and train_state.observed_data_samples < args.max_data_samples:
            with self.tracker.timed("timing/batch_prep"):
                if pending:
                    cond_batch, lat_batch = pending.pop()
                    self._pending_loader_state = None  # trained before any later save
                else:
                    cond_batch, lat_batch = next(batch_stream)

            group = [(cond_batch, lat_batch)]
            if spd > 1:
                # Group up to spd batches, stopping at cadence boundaries so
                # checkpoint/validation steps land exactly (validation only when
                # it can actually run), at the sample cap, and at shape changes
                # (each resolution bucket is its own compiled program).
                cadences = [args.checkpointing_steps]
                if args.validation_dataset_file:
                    cadences.append(args.validation_steps)
                sample_budget_steps = -(
                    -(args.max_data_samples - train_state.observed_data_samples) // global_batch_size
                )
                limit = min(
                    spd,
                    args.train_steps - train_state.step,
                    max(1, sample_budget_steps),
                    *[c - (train_state.step % c) for c in cadences if c and c > 0],
                )
                shapes = jax.tree_util.tree_map(lambda x: getattr(x, "shape", None), (cond_batch, lat_batch))
                while len(group) < limit:
                    with self.tracker.timed("timing/batch_prep"):
                        snap_before = self._loader_snapshot()
                        nxt = next(batch_stream)
                    if jax.tree_util.tree_map(lambda x: getattr(x, "shape", None), nxt) == shapes:
                        group.append(nxt)
                    else:
                        pending.append(nxt)
                        self._pending_loader_state = snap_before
                        break

            if args.enable_profiling and train_state.step == args.profiling_start_step:
                from ...utils.timing import ProfilerTrace

                self._profiler = ProfilerTrace(os.path.join(args.output_dir, "traces"))
                self._profiler.__enter__()
                logger.info(f"Profiler trace started (steps {train_state.step}-"
                            f"{train_state.step + args.profiling_num_steps - 1})")

            t0 = time.perf_counter()
            with self.tracker.timed("timing/train_step"), self.attention_provider_ctx(training=True):
                if len(group) > 1:
                    conds = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[g[0] for g in group])
                    lats = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[g[1] for g in group])
                    step_ids = jnp.arange(
                        train_state.step, train_state.step + len(group), dtype=jnp.int32)
                    self._trainable, self._opt_state, losses_k, maxes_k, gns_k = self._train_step_multi_fn(
                        self._trainable, self._frozen, self._opt_state, conds, lats, self.rng, step_ids
                    )
                else:
                    step_rng = jax.random.fold_in(self.rng, train_state.step)
                    self._trainable, self._opt_state, loss, max_loss, grad_norm = self._train_step_fn(
                        self._trainable, self._frozen, self._opt_state, cond_batch, lat_batch, step_rng
                    )
                    losses_k, maxes_k, gns_k = [loss], [max_loss], [grad_norm]

            if train_state.step == first_session_step and self.mesh_env.pipeline_parallel_enabled:
                # pp_degree > 1 must actually pipeline: if every block stack
                # fell back to sequential execution (e.g. non-scan path), each
                # pp rank runs the full model redundantly — fail loudly rather
                # than train pp-fold slower in silence.
                from ...parallel.pipeline import routed_stacks

                if not routed_stacks():
                    raise RuntimeError(
                        "--pp_degree > 1 but no block stack routed through the pipeline "
                        "primitive during the first traced step (see the emitted "
                        "pipeline-parallel fallback warnings for why). Fix the model's "
                        "use_scan/depth/microbatch constraints or train without pp."
                    )
                logger.info(f"Pipeline-parallel stacks active: {sorted(routed_stacks())}")

            base_step = train_state.step
            train_state.step += len(group)
            train_state.observed_data_samples += global_batch_size * len(group)

            if (getattr(self, "_profiler", None) is not None
                    and train_state.step >= args.profiling_start_step + args.profiling_num_steps):
                self._profiler.__exit__()
                logger.info(f"Profiler trace written to {self._profiler.log_dir}")
                self._profiler = None

            # With fused dispatch a group may contain logging boundaries; log
            # each one with ITS OWN step's scalars (spd-invariant histories —
            # an spd=8 run records the same loss curve as an spd=1 run).
            group_time = time.perf_counter() - t0
            last_logged = None
            for i in range(len(group)):
                step_i = base_step + i + 1
                if step_i % args.logging_steps != 0 and step_i != args.train_steps:
                    continue
                last_logged = i
                loss_f = float(losses_k[i])
                step_times.append(group_time / len(group))
                train_state.global_avg_losses.append(loss_f)
                train_state.global_max_losses.append(float(maxes_k[i]))
                train_state.log_steps.append(step_i)
                self.tracker.log(
                    {
                        "train/global_avg_loss": loss_f,
                        "train/global_max_loss": float(maxes_k[i]),
                        "train/grad_norm": float(gns_k[i]),
                        "train/lr": float(self._lr_schedule(step_i)),
                        "train/observed_data_samples": (
                            train_state.observed_data_samples
                            - global_batch_size * (len(group) - (i + 1))
                        ),
                    },
                    step=step_i,
                )
            if last_logged is not None:
                logger.info(
                    f"step {base_step + last_logged + 1}/{args.train_steps} "
                    f"loss={train_state.global_avg_losses[-1]:.4f} "
                    f"grad_norm={float(gns_k[last_logged]):.4f}",
                    frequency=max(1, 50 // max(args.logging_steps, 1)),
                    frequency_key="train-progress",
                )

            if args.checkpointing_steps > 0 and train_state.step % args.checkpointing_steps == 0:
                self._save_checkpoint()

            if args.validation_steps > 0 and args.validation_dataset_file and (
                train_state.step % args.validation_steps == 0
            ):
                self._validate(train_state.step)

            if self._preemption_agreed():
                logger.info(
                    f"Preemption notice received; saving checkpoint at step "
                    f"{train_state.step} and exiting cleanly"
                )
                break

        try:
            # The handler stays installed through the epilogue: a REPEATED
            # preemption notice during the final (possibly minutes-long) save/
            # validate/export must not kill the process mid-checkpoint — that
            # is the exact failure --checkpoint_on_preemption exists to avoid.
            self._save_checkpoint(force=True)
            if isinstance(self._batch_stream, DevicePrefetcher):
                self._batch_stream.stop()
            if args.validation_dataset_file:
                self._validate(train_state.step, final=True)
            self._finalize_run()
            logger.info(f"Memory after training: {get_memory_statistics()}")
            self.tracker.finish()
        finally:
            if prev_sigterm is not None:
                import signal

                signal.signal(signal.SIGTERM, prev_sigterm[0] or signal.SIG_DFL)

    def _sharded_batch_stream(self, sampler, global_batch_size: int):
        """Yield device-sharded (condition, latent) batches forever: refills the
        precompute iterators when drained (reference :401-402,824-917), fills the
        resolution sampler, collates, and dispatches `shard_batch` transfers."""
        args = self.args
        condition_iter = None
        latent_iter = None
        while True:
            if condition_iter is None or self.preprocessor.requires_data:
                with self.tracker.timed("timing/precompute"):
                    # consume_once ONLY on the explicit flag (reference trainer
                    # :872): auto-switching on _precomputable_once would cycle
                    # just num_items samples forever instead of the dataset.
                    consume = (
                        self.preprocessor.consume_once
                        if args.precomputation_once
                        else self.preprocessor.consume
                    )
                    condition_iter = iter(consume(
                        "condition", self._data_iterator, cache_samples=True,
                    ))
                    latent_iter = iter(consume(
                        "latent", self._data_iterator, use_cached_samples=True, drop_samples=True,
                    ))
            try:
                cond = next(condition_iter)
                lat = next(latent_iter)
            except StopIteration:
                condition_iter = None
                continue
            sampler.consume(cond, lat)
            if not sampler.ready:
                continue
            cond_list, lat_list = sampler.get_batch()
            cond_batch = self.model_specification.collate_conditions(cond_list)
            lat_batch = self.model_specification.collate_latents(lat_list)
            seq_dims = self.model_specification.cp_plan() if self.mesh_env.context_parallel_enabled else {}
            cond_batch = self.mesh_env.shard_batch(
                cond_batch, seq_dims=seq_dims, batch_size=global_batch_size)
            lat_batch = self.mesh_env.shard_batch(
                lat_batch, seq_dims=seq_dims, batch_size=global_batch_size)
            yield cond_batch, lat_batch

    def _finalize_run(self) -> None:
        """Model card + optional hub push (reference trainer :562-581)."""
        args = self.args
        if not self.mesh_env.is_main_process:
            return
        from ...utils.hub import push_to_hub, save_model_card

        media = "video" if "video" in (args.model_name or "") or args.model_name in ("wan", "dummy") else "image"
        save_model_card(
            args.output_dir,
            base_model=args.pretrained_model_name_or_path or "unknown",
            model_name=args.tracker_name,
            training_details={
                "training_type": args.training_type,
                "steps": self.state.train_state.step,
                "learning_rate": args.lr,
                "trainable_parameters": self.state.num_trainable_parameters,
                "final_loss": (self.state.train_state.global_avg_losses or [None])[-1],
            },
            media=media,
        )
        if args.push_to_hub:
            repo_id = args.hub_model_id or args.tracker_name
            push_to_hub(repo_id, args.output_dir, token=args.hub_token)

    def _install_preemption_handler(self):
        """When --checkpoint_on_preemption is set, catch SIGTERM (the preemption
        notice on cloud TPU fleets) and flip a flag the train loop polls at step
        boundaries: the in-flight step finishes, a full resumable checkpoint is
        saved, and training exits cleanly. Returns a 1-tuple holding the previous
        handler when one was installed (the previous handler itself may be None),
        else None; _train restores it after the loop."""
        self._preemption_requested = False
        if not getattr(self.args, "checkpoint_on_preemption", False):
            return None
        import signal

        def _on_sigterm(signum, frame):
            self._preemption_requested = True

        try:
            return (signal.signal(signal.SIGTERM, _on_sigterm),)
        except ValueError:  # not the main thread of the main interpreter
            logger.warning(
                "checkpoint_on_preemption: cannot install a SIGTERM handler "
                "outside the main thread; preemption checkpointing disabled"
            )
            return None

    def _loader_snapshot(self):
        """Loader state with everything handed out so far marked consumed.
        Under prefetch the live loader runs ahead by the queue depth, so the
        per-batch snapshot the prefetcher carries is the truth; inline streams
        read the live state."""
        return getattr(
            getattr(self, "_batch_stream", None), "consumed_state", None
        ) or _jsonable(self.dataloader.state_dict())

    def _preemption_agreed(self) -> bool:
        """True when ANY process received SIGTERM. Preemption notices are
        per-host; checkpoint saves are collective, so every process must enter
        the save together or the survivors hang. Single-process reads the local
        flag; multi-process agrees via ONE single-bool process allgather per
        dispatch (not the two-round padded object gather — this runs every
        step, so it must stay off the async-dispatch critical path as much as
        a host-blocking collective can)."""
        if not getattr(self.args, "checkpoint_on_preemption", False):
            return False
        if jax.process_count() == 1:
            return self._preemption_requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.array([self._preemption_requested], dtype=np.bool_)
        )
        return bool(np.asarray(flags).any())

    def _save_checkpoint(self, force: bool = False) -> None:
        if self.checkpointer.latest_step() == self.state.train_state.step:
            return  # cadence save already covered this step (final-save overlap)
        with self.tracker.timed("timing/checkpoint"):
            # Under prefetch, the live loader state runs ahead of training by
            # the queue depth; the snapshot travels with each consumed batch.
            # A batch pushed back into `pending` (shape change mid-group) was
            # handed out but NOT trained: save the pre-pull snapshot so resume
            # re-delivers it instead of dropping it.
            loader_state = getattr(self, "_pending_loader_state", None) or self._loader_snapshot()
            if jax.process_count() > 1:
                # The metadata JSON is written by process 0 only (Orbax JsonSave);
                # each process's dp_rank_{n} loader position must be merged into
                # it or every other rank restarts its stream from scratch on
                # resume (the analog of the reference's per-rank DPDataLoader
                # state keys, reference data/dataloader.py:13-40).
                from ...parallel.utils import all_gather_object

                merged: Dict[str, Any] = {}
                for per_process in all_gather_object(loader_state):
                    merged.update(per_process)
                loader_state = merged
            metadata = {
                "train_state": self.state.train_state.state_dict(),
                "dataloader": loader_state,
            }
            self.checkpointer.save(
                self.state.train_state.step,
                {"trainable": self._trainable, "opt_state": self._opt_state},
                metadata=metadata,
                force=force,
            )

    # -------------------------------------------------------------- validation
    def _load_fresh_transformer(self) -> ModelHandle:
        """Freshly-loaded base transformer (pretrained weights where available)."""
        return self.model_specification.load_diffusion_models()["transformer"]

    def _apply_auxiliary_exports(self, params, export_dir: str):
        """Hook for trainers that export extra weights next to the LoRA
        (control trainer qk-norm/injection weights)."""
        return params

    def _load_exported_transformer(self) -> Optional[ModelHandle]:
        """Rebuild the transformer from the on-disk export artifacts: fresh base
        weights + the exported LoRA safetensors, or the exported diffusers-format
        full model. Returns None when nothing was exported yet."""
        args = self.args
        spec = self.model_specification
        if args.training_type in ("lora", "control-lora"):
            export_dir = _latest_export(os.path.join(args.output_dir, "lora_weights"))
            if export_dir is None:
                return None
            handle = self._load_fresh_transformer()
            state, _config = load_lora_weights(export_dir)
            params = apply_lora_to_module_params(
                handle.params, handle.module, state, key_map=spec.transformer_key_map
            )
            params = self._apply_auxiliary_exports(params, export_dir)
            return ModelHandle(handle.module, params, handle.config)
        export_dir = _latest_export(os.path.join(args.output_dir, "model_weights"))
        if export_dir is None:
            return None
        from ...models.weight_utils import (
            load_diffusers_checkpoint_dir,
            load_pretrained_into_params,
            torch_state_dict_to_flax,
        )

        handle = self._load_fresh_transformer()
        state = load_diffusers_checkpoint_dir(export_dir)
        key_map = spec.transformer_key_map

        def converter(sd, abstract):
            return torch_state_dict_to_flax(sd, abstract, key_map=key_map)

        params = load_pretrained_into_params(state, handle.params, converter, module=handle.module)
        return ModelHandle(handle.module, params, handle.config)

    def _init_validation_pipeline(self, final: bool = False):
        """Non-final validation runs the live training params. The FINAL pass
        instead reloads fresh base weights and applies the exported artifacts
        (LoRA safetensors / exported diffusers model), proving the exports are
        complete and loadable (reference trainer/sft_trainer/trainer.py:772-822)."""
        spec = self.model_specification
        if final:
            try:
                handle = self._load_exported_transformer()
            except Exception as err:  # noqa: BLE001 — never lose the final pass
                logger.warning(f"Final-validation export reload failed ({err!r}); using live weights")
                handle = None
            if handle is not None:
                return spec.load_pipeline(transformer=handle, vae=self.vae)
            if final:
                logger.warning("No export artifacts found; final validation uses live weights")
        params = merge_params(self._trainable, self._frozen)
        handle = ModelHandle(self.transformer.module, params, self.transformer.config)
        # Reuse one pipeline instance across validation rounds: the denoise step
        # is jit-cached per instance with params as an argument, so periodic
        # validations skip re-tracing the transformer.
        pipeline = getattr(self, "_validation_pipeline", None)
        if pipeline is None:
            pipeline = spec.load_pipeline(transformer=handle, vae=self.vae)
            self._validation_pipeline = pipeline
        else:
            pipeline.transformer = handle
        return pipeline

    def _validate(self, step: int, final: bool = False) -> None:
        args = self.args
        logger.info(f"Running validation at step {step}" + (" (final, from exports)" if final else ""))
        dataset = ValidationDataset(args.validation_dataset_file)
        pipeline = self._init_validation_pipeline(final=final)

        artifacts = []
        with self.attention_provider_ctx(training=False):
            for i, sample in enumerate(dataset):
                if jax.process_count() > 1 and i % jax.process_count() != jax.process_index():
                    continue
                sample = {k: v for k, v in sample.items() if v is not None}
                outs = self.model_specification.validation(pipeline, **sample)
                artifacts.extend(outs)

        out_dir = pathlib.Path(args.output_dir) / "validation" / f"{step:06d}"
        out_dir.mkdir(parents=True, exist_ok=True)
        from ...data.utils import save_image, save_video

        logged = []
        for i, artifact in enumerate(artifacts):
            path = out_dir / f"artifact-{jax.process_index()}-{i}.{artifact.file_extension}"
            if artifact.type == "video":
                save_video(artifact.value, str(path))
            elif artifact.type == "image":
                save_image(artifact.value, str(path))
            logged.append({
                "type": artifact.type,
                "path": str(path),
                "caption": getattr(artifact, "caption", None),
            })
        # Gather every process's artifact manifest so the main process logs all
        # of them (reference all_gather_object, trainer/sft_trainer/trainer.py:695-697);
        # without this, non-main dp ranks' artifacts never reach the tracker.
        from ...parallel.utils import all_gather_object

        all_logged = all_gather_object(logged)
        merged = [item for rank_logged in all_logged for item in rank_logged]
        self.tracker.log_artifacts(merged, step=step)
        logger.info(
            f"Validation wrote {len(artifacts)} local artifacts to {out_dir} "
            f"({len(merged)} across {len(all_logged)} processes)"
        )


def _latest_export(root: str) -> Optional[str]:
    """Latest step-named subdirectory of an export root (e.g. lora_weights/000010)."""
    p = pathlib.Path(root)
    if not p.is_dir():
        return None
    steps = sorted((d for d in p.iterdir() if d.is_dir() and d.name.isdigit()), key=lambda d: int(d.name))
    return str(steps[-1]) if steps else None


def _jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)
