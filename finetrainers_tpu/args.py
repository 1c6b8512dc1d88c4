"""Argument system: CLI-compatible with the reference's `finetrainers/args.py`.

Same flat-arg namespace (~80 typed attrs, reference args.py:365-476), the same
extensible `ArgsConfigMixin` group registration (args.py:631-635), the same
add/parse/map/validate pipeline (args.py:637-667), attribute delegation to registered
groups (args.py:669-686), and `to_dict()` grouping for tracker config (args.py:489-629).

TPU-relevant deviations:
  - attention providers are this framework's JAX/Pallas providers;
  - `--nccl_timeout` / `--init_timeout` are accepted (scripts port unchanged) but map
    to JAX distributed-init timeouts;
  - torch dtype strings map to jnp dtypes.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from .logging import get_logger
from .utils.args_config import ArgsConfigMixin


logger = get_logger(__name__)

# Training-allowed vs inference-only providers (reference typed these at args.py:19-20;
# docs/models/attention.md:3-10). Ours are JAX/Pallas backends; the sage int8
# family is forward-only (quantization noise in gradients), so inference-only —
# same split as the reference's allow-lists.
AttentionProviderTraining = [
    "auto", "flash", "splash", "tpu_flash", "flash_varlen", "flex", "ring", "ulysses",
    "native", "xla", "xformers", "_native_cudnn", "_native_efficient",
    "_native_flash", "_native_math",
]
AttentionProviderValidation = AttentionProviderTraining + [
    "sage", "sage_varlen", "_sage_qk_int8_pv_fp16_cuda",
    "_sage_qk_int8_pv_fp16_triton", "_sage_qk_int8_pv_fp8_cuda",
    "_sage_qk_int8_pv_fp8_cuda_sm90",
]

_DTYPE_MAP = {
    "bf16": jnp.bfloat16,
    "fp16": jnp.float16,
    "fp32": jnp.float32,
    "float8_e4m3fn": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
    # Beyond-reference: int8 frozen-weight storage ALSO moves the frozen
    # matmuls (fwd + dx) onto the 2x-rate int8 MXU path via ops/int8_linear
    # (per-output-channel weight scales, dynamic per-row activation
    # quantization; docs/perf.md round 5).
    "int8": jnp.int8,
}


class AttentionProviderArgs(ArgsConfigMixin):
    """`--attn_provider_training` / `--attn_provider_inference` lists of
    `module:provider` mappings (reference args.py:27-82)."""

    def __init__(self) -> None:
        self.attn_provider_training: List[str] = []
        self.attn_provider_inference: List[str] = []

    def add_args(self, parser: argparse.ArgumentParser) -> None:
        parser.add_argument("--attn_provider_training", type=str, default=None, nargs="+")
        parser.add_argument("--attn_provider_inference", type=str, default=None, nargs="+")

    def map_args(self, argparse_args: argparse.Namespace, mapped_args: "BaseArgs") -> None:
        mapped_args.attn_provider_training = argparse_args.attn_provider_training or []
        mapped_args.attn_provider_inference = argparse_args.attn_provider_inference or []

    def validate_args(self, args: "BaseArgs") -> None:
        for entry in args.attn_provider_training:
            provider = entry.split(":")[-1]
            if provider not in AttentionProviderTraining:
                raise ValueError(f"Attention provider {provider!r} is not supported for training.")
        for entry in args.attn_provider_inference:
            provider = entry.split(":")[-1]
            if provider not in AttentionProviderValidation:
                raise ValueError(f"Attention provider {provider!r} is not supported for inference.")


class BaseArgs:
    """Flat argument namespace. Attribute names and defaults mirror the reference."""

    # Parallel arguments
    parallel_backend: str = "jax"
    pp_degree: int = 1
    pp_microbatches: int = 0
    dp_degree: int = 1
    dp_shards: int = 1
    cp_degree: int = 1
    tp_degree: int = 1

    # Model arguments
    model_name: Optional[str] = None
    pretrained_model_name_or_path: Optional[str] = None
    revision: Optional[str] = None
    variant: Optional[str] = None
    cache_dir: Optional[str] = None
    tokenizer_id: Optional[str] = None
    tokenizer_2_id: Optional[str] = None
    tokenizer_3_id: Optional[str] = None
    text_encoder_id: Optional[str] = None
    text_encoder_2_id: Optional[str] = None
    text_encoder_3_id: Optional[str] = None
    transformer_id: Optional[str] = None
    vae_id: Optional[str] = None
    text_encoder_dtype: Any = jnp.bfloat16
    text_encoder_2_dtype: Any = jnp.bfloat16
    text_encoder_3_dtype: Any = jnp.bfloat16
    transformer_dtype: Any = jnp.bfloat16
    vae_dtype: Any = jnp.bfloat16
    layerwise_upcasting_modules: List[str] = []
    layerwise_upcasting_storage_dtype: Any = jnp.float8_e4m3fn
    layerwise_upcasting_skip_modules_pattern: List[str] = ["patch_embed", "pos_embed", "x_embedder", "context_embedder", "time_embed", "^proj_in$", "^proj_out$", "norm"]

    # Training type
    training_type: Optional[str] = None

    # Dataset arguments
    dataset_config: Optional[str] = None
    dataset_shuffle_buffer_size: int = 1
    enable_precomputation: bool = False
    precomputation_items: int = 512
    precomputation_dir: Optional[str] = None
    precomputation_once: bool = False
    precomputation_reuse: bool = False

    # Dataloader arguments
    dataloader_num_workers: int = 0
    pin_memory: bool = False

    # Diffusion arguments
    flow_resolution_shifting: bool = False
    flow_base_seq_len: int = 256
    flow_max_seq_len: int = 4096
    flow_base_shift: float = 0.5
    flow_max_shift: float = 1.15
    flow_shift: float = 1.0
    flow_weighting_scheme: str = "none"
    flow_logit_mean: float = 0.0
    flow_logit_std: float = 1.0
    flow_mode_scale: float = 1.29

    # Training arguments
    seed: Optional[int] = None
    batch_size: int = 1
    train_steps: int = 1000
    max_data_samples: int = 2**64
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False
    # Remat policy when gradient_checkpointing is on: full (save nothing per
    # block), ops (save matmul/attention results), block_skip (checkpoint
    # every 2nd block boundary). Mirrors reference utils/activation_checkpoint.py.
    gradient_checkpointing_type: str = "full"
    # TPU-native: number of optimizer steps fused into ONE device dispatch
    # (lax.scan over stacked same-shape batches). Amortizes per-dispatch host
    # overhead; semantics identical to running the steps one by one.
    steps_per_dispatch: int = 1
    checkpointing_steps: int = 500
    checkpointing_limit: Optional[int] = None
    # TPU-native (beyond reference): on SIGTERM (the preemption notice on cloud
    # TPU fleets) finish the in-flight step, save a full resumable checkpoint,
    # and exit cleanly instead of losing progress since the last interval.
    checkpoint_on_preemption: bool = False
    resume_from_checkpoint: Optional[str] = None
    enable_slicing: bool = False
    enable_tiling: bool = False

    # Optimizer arguments
    optimizer: str = "adamw"
    lr: float = 1e-4
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    lr_num_cycles: int = 1
    lr_power: float = 1.0
    beta1: float = 0.9
    beta2: float = 0.95
    beta3: Optional[float] = None
    weight_decay: float = 1e-4
    epsilon: float = 1e-8
    max_grad_norm: float = 1.0

    # Validation arguments
    validation_dataset_file: Optional[str] = None
    validation_steps: int = 500
    enable_model_cpu_offload: bool = False

    # Miscellaneous
    tracker_name: str = "finetrainers"
    push_to_hub: bool = False
    hub_token: Optional[str] = None
    hub_model_id: Optional[str] = None
    output_dir: str = "finetrainers-training"
    logging_dir: str = "logs"
    logging_steps: int = 1
    init_timeout: int = 300
    nccl_timeout: int = 600
    report_to: str = "none"
    verbose: int = 0

    # Performance/debug
    compile_modules: List[str] = []
    compile_scopes: Optional[List[str]] = None
    allow_tf32: bool = False
    float32_matmul_precision: str = "highest"
    enable_profiling: bool = False
    profiling_start_step: int = 2
    profiling_num_steps: int = 3

    def __init__(self) -> None:
        # Materialize mutable defaults per instance.
        for key in ("layerwise_upcasting_modules", "layerwise_upcasting_skip_modules_pattern", "compile_modules"):
            object.__setattr__(self, key, list(getattr(type(self), key)))
        object.__setattr__(self, "_registered_configs", [])

    # -------------------------------------------------------------- registration
    def register_args(self, config: ArgsConfigMixin) -> None:
        self._registered_configs.append(config)

    def __getattr__(self, name: str):
        # Called only when normal lookup fails: delegate to registered groups
        # (mirrors reference args.py:669-686).
        if name.startswith("_"):
            raise AttributeError(name)
        for config in self.__dict__.get("_registered_configs", []):
            if hasattr(config, name):
                return getattr(config, name)
        raise AttributeError(f"{type(self).__name__!r} object has no attribute {name!r}")

    def __setattr__(self, name: str, value) -> None:
        for config in self.__dict__.get("_registered_configs", []):
            if hasattr(type(config), name) or name in getattr(config, "__dict__", {}):
                setattr(config, name, value)
                return
        object.__setattr__(self, name, value)

    # -------------------------------------------------------------------- parse
    def parse_args(self, argv: Optional[List[str]] = None) -> "BaseArgs":
        argv = argv if argv is not None else sys.argv[1:]
        parser = argparse.ArgumentParser()
        _add_args(parser)
        for config in self._registered_configs:
            config.add_args(parser)

        if "--list_models" in argv:
            from .config import SUPPORTED_MODEL_CONFIGS

            print("Supported models:")
            for model_name, training_types in SUPPORTED_MODEL_CONFIGS.items():
                name = getattr(model_name, "value", model_name)
                print(f"  {name}: {sorted(t.value if hasattr(t, 'value') else t for t in training_types)}")
            sys.exit(0)

        namespace = parser.parse_args(argv)
        _map_to_args_type(namespace, self)
        for config in self._registered_configs:
            config.map_args(namespace, self)

        _validate_args(self)
        for config in self._registered_configs:
            config.validate_args(self)
        return self

    # ------------------------------------------------------------------- export
    def to_dict(self) -> Dict[str, Any]:
        """Grouped dict for tracker config (reference args.py:489-629)."""

        def _ser(v):
            if v in _DTYPE_MAP.values():
                for name, dt in _DTYPE_MAP.items():
                    if v == dt:
                        return name
            return v

        groups: Dict[str, Dict[str, Any]] = {
            "parallel_arguments": {
                k: getattr(self, k) for k in ("parallel_backend", "pp_degree", "pp_microbatches", "dp_degree", "dp_shards", "cp_degree", "tp_degree")
            },
            "model_arguments": {
                k: _ser(getattr(self, k))
                for k in (
                    "model_name", "pretrained_model_name_or_path", "revision", "variant", "cache_dir",
                    "tokenizer_id", "tokenizer_2_id", "tokenizer_3_id", "text_encoder_id", "text_encoder_2_id",
                    "text_encoder_3_id", "transformer_id", "vae_id", "text_encoder_dtype", "text_encoder_2_dtype",
                    "text_encoder_3_dtype", "transformer_dtype", "vae_dtype", "layerwise_upcasting_modules",
                    "layerwise_upcasting_storage_dtype",
                )
            },
            "dataset_arguments": {
                k: getattr(self, k)
                for k in (
                    "dataset_config", "dataset_shuffle_buffer_size", "enable_precomputation",
                    "precomputation_items", "precomputation_dir", "precomputation_once", "precomputation_reuse",
                )
            },
            "dataloader_arguments": {k: getattr(self, k) for k in ("dataloader_num_workers", "pin_memory")},
            "diffusion_arguments": {
                k: getattr(self, k)
                for k in (
                    "flow_resolution_shifting", "flow_base_seq_len", "flow_max_seq_len", "flow_base_shift",
                    "flow_max_shift", "flow_shift", "flow_weighting_scheme", "flow_logit_mean", "flow_logit_std",
                    "flow_mode_scale",
                )
            },
            "training_arguments": {
                k: getattr(self, k)
                for k in (
                    "training_type", "seed", "batch_size", "train_steps", "max_data_samples",
                    "gradient_accumulation_steps", "gradient_checkpointing", "gradient_checkpointing_type",
                    "steps_per_dispatch",
                    "checkpointing_steps",
                    "checkpointing_limit", "checkpoint_on_preemption", "resume_from_checkpoint",
                    "enable_slicing", "enable_tiling",
                )
            },
            "optimizer_arguments": {
                k: getattr(self, k)
                for k in (
                    "optimizer", "lr", "lr_scheduler", "lr_warmup_steps", "lr_num_cycles", "lr_power",
                    "beta1", "beta2", "beta3", "weight_decay", "epsilon", "max_grad_norm",
                )
            },
            "validation_arguments": {
                k: getattr(self, k) for k in ("validation_dataset_file", "validation_steps", "enable_model_cpu_offload")
            },
            "miscellaneous_arguments": {
                k: getattr(self, k)
                for k in (
                    "tracker_name", "push_to_hub", "hub_token", "hub_model_id", "output_dir", "logging_dir",
                    "logging_steps", "init_timeout", "nccl_timeout", "report_to", "verbose",
                )
            },
        }
        for config in self._registered_configs:
            groups.setdefault("extra_arguments", {}).update(config.to_dict())
        return groups


def _add_args(parser: argparse.ArgumentParser) -> None:
    # Parallel
    parser.add_argument("--parallel_backend", type=str, default="jax", choices=["jax", "ptd", "accelerate"])
    parser.add_argument("--pp_degree", type=int, default=1)
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="GPipe microbatch count when --pp_degree > 1 (0 = auto: one microbatch"
        " per data-parallel batch slice). Bubble fraction is (pp-1)/(M+pp-1).",
    )
    parser.add_argument("--dp_degree", type=int, default=1)
    parser.add_argument("--dp_shards", type=int, default=1)
    parser.add_argument("--cp_degree", type=int, default=1)
    parser.add_argument("--tp_degree", type=int, default=1)
    # Model
    parser.add_argument("--model_name", type=str, required=False)
    parser.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    parser.add_argument("--revision", type=str, default=None)
    parser.add_argument("--variant", type=str, default=None)
    parser.add_argument("--cache_dir", type=str, default=None)
    parser.add_argument("--tokenizer_id", type=str, default=None)
    parser.add_argument("--tokenizer_2_id", type=str, default=None)
    parser.add_argument("--tokenizer_3_id", type=str, default=None)
    parser.add_argument("--text_encoder_id", type=str, default=None)
    parser.add_argument("--text_encoder_2_id", type=str, default=None)
    parser.add_argument("--text_encoder_3_id", type=str, default=None)
    parser.add_argument("--transformer_id", type=str, default=None)
    parser.add_argument("--vae_id", type=str, default=None)
    parser.add_argument("--text_encoder_dtype", type=str, default="bf16")
    parser.add_argument("--text_encoder_2_dtype", type=str, default="bf16")
    parser.add_argument("--text_encoder_3_dtype", type=str, default="bf16")
    parser.add_argument("--transformer_dtype", type=str, default="bf16")
    parser.add_argument("--vae_dtype", type=str, default="bf16")
    parser.add_argument("--layerwise_upcasting_modules", type=str, default=[], nargs="+", choices=["transformer"])
    parser.add_argument(
        "--layerwise_upcasting_storage_dtype", type=str, default="float8_e4m3fn",
        # Superset of the reference's choices: "int8" additionally switches the
        # frozen matmuls to the int8 MXU compute path (see _DTYPE_MAP note).
        choices=["float8_e4m3fn", "float8_e5m2", "int8"],
    )
    parser.add_argument(
        "--layerwise_upcasting_skip_modules_pattern", type=str,
        default=["patch_embed", "pos_embed", "x_embedder", "context_embedder", "time_embed", "^proj_in$", "^proj_out$", "norm"],
        nargs="+",
    )
    # Training type
    parser.add_argument("--training_type", type=str, default=None)
    # Dataset
    parser.add_argument("--dataset_config", type=str, required=True)
    parser.add_argument("--dataset_shuffle_buffer_size", type=int, default=1)
    parser.add_argument("--enable_precomputation", action="store_true")
    parser.add_argument("--precomputation_items", type=int, default=512)
    parser.add_argument("--precomputation_dir", type=str, default=None)
    parser.add_argument("--precomputation_once", action="store_true")
    parser.add_argument("--precomputation_reuse", action="store_true")
    # Dataloader
    parser.add_argument("--dataloader_num_workers", type=int, default=0)
    parser.add_argument("--pin_memory", action="store_true")
    # Diffusion
    parser.add_argument("--flow_resolution_shifting", action="store_true")
    parser.add_argument("--flow_base_seq_len", type=int, default=256)
    parser.add_argument("--flow_max_seq_len", type=int, default=4096)
    parser.add_argument("--flow_base_shift", type=float, default=0.5)
    parser.add_argument("--flow_max_shift", type=float, default=1.15)
    parser.add_argument("--flow_shift", type=float, default=1.0)
    parser.add_argument(
        "--flow_weighting_scheme", type=str, default="none",
        choices=["sigma_sqrt", "logit_normal", "mode", "cosmap", "none"],
    )
    parser.add_argument("--flow_logit_mean", type=float, default=0.0)
    parser.add_argument("--flow_logit_std", type=float, default=1.0)
    parser.add_argument("--flow_mode_scale", type=float, default=1.29)
    # Training
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--train_steps", type=int, default=1000)
    parser.add_argument("--max_data_samples", type=int, default=2**64)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--gradient_checkpointing", action="store_true")
    parser.add_argument("--gradient_checkpointing_type", type=str, default="full",
                        choices=["full", "ops", "ops_attn", "ops_narrow", "block_skip"])
    parser.add_argument("--steps_per_dispatch", type=int, default=1)
    parser.add_argument("--checkpointing_steps", type=int, default=500)
    parser.add_argument("--checkpointing_limit", type=int, default=None)
    parser.add_argument("--checkpoint_on_preemption", action="store_true")
    parser.add_argument("--resume_from_checkpoint", type=str, default=None)
    parser.add_argument("--enable_slicing", action="store_true")
    parser.add_argument("--enable_tiling", action="store_true")
    # Optimizer
    parser.add_argument("--optimizer", type=str, default="adamw", choices=["adam", "adamw", "adam-bnb-8bit", "adamw-bnb-8bit"])
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--lr_scheduler", type=str, default="constant")
    parser.add_argument("--lr_warmup_steps", type=int, default=500)
    parser.add_argument("--lr_num_cycles", type=int, default=1)
    parser.add_argument("--lr_power", type=float, default=1.0)
    parser.add_argument("--beta1", type=float, default=0.9)
    parser.add_argument("--beta2", type=float, default=0.95)
    parser.add_argument("--beta3", type=float, default=None)
    parser.add_argument("--weight_decay", type=float, default=1e-04)
    parser.add_argument("--epsilon", type=float, default=1e-8)
    parser.add_argument("--max_grad_norm", default=1.0, type=float)
    # Validation
    parser.add_argument("--validation_dataset_file", type=str, default=None)
    parser.add_argument("--validation_steps", type=int, default=500)
    parser.add_argument("--enable_model_cpu_offload", action="store_true")
    # Miscellaneous
    parser.add_argument("--tracker_name", type=str, default="finetrainers")
    parser.add_argument("--push_to_hub", action="store_true")
    parser.add_argument("--hub_token", type=str, default=None)
    parser.add_argument("--hub_model_id", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default="finetrainers-training")
    parser.add_argument("--logging_dir", type=str, default="logs")
    parser.add_argument("--logging_steps", type=int, default=1)
    parser.add_argument("--init_timeout", type=int, default=300)
    parser.add_argument("--nccl_timeout", type=int, default=600)
    parser.add_argument("--report_to", type=str, default="none", choices=["none", "wandb", "jsonl"])
    parser.add_argument("--verbose", type=int, default=0, choices=[0, 1, 2, 3])
    # Performance/debug
    parser.add_argument("--compile_modules", type=str, default=[], nargs="+")
    parser.add_argument("--compile_scopes", type=str, default=None, nargs="+")
    parser.add_argument("--allow_tf32", action="store_true")
    parser.add_argument("--float32_matmul_precision", type=str, default="highest", choices=["highest", "high", "medium"])
    parser.add_argument("--enable_profiling", action="store_true",
                        help="Capture a jax.profiler (XPlane) trace of a few steady-state steps")
    parser.add_argument("--profiling_start_step", type=int, default=2)
    parser.add_argument("--profiling_num_steps", type=int, default=3)
    parser.add_argument("--list_models", action="store_true")


def _map_to_args_type(namespace: argparse.Namespace, args: BaseArgs) -> None:
    for key, value in vars(namespace).items():
        if key == "list_models":
            continue
        # Keys owned by registered arg groups are mapped by the group's map_args.
        if not hasattr(type(args), key):
            continue
        if key.endswith("_dtype") or key == "layerwise_upcasting_storage_dtype":
            value = _DTYPE_MAP[value]
        object.__setattr__(args, key, value)


def _validate_args(args: BaseArgs) -> None:
    world = args.pp_degree * args.dp_degree * args.dp_shards * args.cp_degree * args.tp_degree
    if world < 1:
        raise ValueError("Parallel degrees must be >= 1")
    if args.pp_degree > 1:
        # Beyond-reference: the reference raises here (trainer/sft_trainer/
        # trainer.py:91-94); this build trains pp>1 via the GPipe primitive.
        # pp composes with dp/tp/cp: the pipeline shard_map is manual over the
        # pp+dp axes only, leaving cp/tp to GSPMD (parallel/pipeline.py).
        if args.pp_microbatches and args.batch_size % args.pp_microbatches != 0:
            raise ValueError(
                f"batch_size={args.batch_size} must be divisible by pp_microbatches={args.pp_microbatches}"
            )
    if args.batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    if args.gradient_accumulation_steps < 1:
        raise ValueError("gradient_accumulation_steps must be >= 1")
    if args.train_steps < 1:
        raise ValueError("train_steps must be >= 1")
    if args.validation_dataset_file is not None:
        ext = pathlib.Path(args.validation_dataset_file).suffix
        if ext not in (".csv", ".json", ".jsonl", ".parquet", ".arrow"):
            raise ValueError("validation_dataset_file must be csv/json/jsonl/parquet/arrow")
