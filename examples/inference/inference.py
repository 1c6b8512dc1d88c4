"""Standalone inference runner (reference `examples/inference/inference.py`,
~850 LoC torch app with grouped args, dataset-file batch inference, parallel
mesh support, attention-provider selection, and tracker logging).

TPU-native re-architecture: one jitted denoise pipeline per spec; GSPMD mesh
via MeshEnv (dp for batch fan-out, tp/cp honored by the spec shardings); LoRA
loaded from peft-convention safetensors; artifacts written per rank and logged
through the tracker abstraction.

Usage (single prompt):
    python examples/inference/inference.py --model_name ltx_video \
        --pretrained_model_name_or_path /ckpts/ltx --inference_type t2v \
        --prompt "a cat" --num_frames 49 --height 512 --width 768

Batch (reference --dataset_file): CSV/JSON/JSONL/parquet rows with
prompt/image_path/... columns, same schema as the trainer's validation set.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

# Allow running straight from a checkout (`python examples/inference/inference.py`)
# without `pip install -e .`.
_REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[2])
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Honor JAX_PLATFORMS even under a sitecustomize that pins another platform
# (same escape hatch as train.py, for CPU dry runs).
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


class InferenceType:
    T2V = "text_to_video"
    T2I = "text_to_image"
    I2V = "image_to_video"
    CHOICES = (T2V, T2I, I2V)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    # ----------------------------------------------------------- model args
    g = parser.add_argument_group("model")
    g.add_argument("--model_name", type=str, required=True)
    g.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    g.add_argument("--revision", type=str, default=None)
    g.add_argument("--cache_dir", type=str, default=None)
    for comp in ("tokenizer", "tokenizer_2", "tokenizer_3", "text_encoder",
                 "text_encoder_2", "text_encoder_3", "transformer", "vae"):
        g.add_argument(f"--{comp}_id", type=str, default=None)
    for comp in ("text_encoder", "text_encoder_2", "text_encoder_3", "transformer", "vae"):
        g.add_argument(f"--{comp}_dtype", type=str, default="bf16",
                       choices=["fp32", "fp16", "bf16"])
    g.add_argument("--enable_slicing", action="store_true")
    g.add_argument("--enable_tiling", action="store_true")
    g.add_argument("--quantize_int8", action="store_true",
                   help="Quantize transformer base weights to int8 (per-output-"
                        "channel scales) and run their matmuls on the 2x-rate "
                        "int8 MXU path; LoRA deltas stay full precision. "
                        "CogView4-6B denoise: 863 -> 619 ms/step (docs/perf.md)")
    g.add_argument("--lora_weights", type=str, default=None,
                   help="Directory or safetensors file of exported LoRA weights")
    g.add_argument("--lora_scale", type=float, default=1.0)
    g.add_argument("--training_type", type=str, default="lora",
                   choices=["lora", "full-finetune", "control-lora", "control-full-finetune"],
                   help="Spec flavor the weights were trained with; control-* widens "
                        "the patch embed and conditions on --control_image_path")
    g.add_argument("--frame_conditioning_concatenate_mask", action="store_true",
                   help="Control checkpoints trained with the concatenated mask channel")
    # ------------------------------------------------------- inference args
    g = parser.add_argument_group("inference")
    g.add_argument("--inference_type", type=str, default=InferenceType.T2V,
                   choices=list(InferenceType.CHOICES))
    g.add_argument("--dataset_file", type=str, default=None,
                   help="CSV/JSON/JSONL/parquet of generation requests (reference --dataset_file)")
    g.add_argument("--prompt", type=str, default=None)
    g.add_argument("--negative_prompt", type=str, default=None)
    g.add_argument("--image_path", type=str, default=None)
    g.add_argument("--control_image_path", type=str, default=None)
    g.add_argument("--control_video_path", type=str, default=None)
    g.add_argument("--height", type=int, default=512)
    g.add_argument("--width", type=int, default=704)
    g.add_argument("--num_frames", type=int, default=49)
    g.add_argument("--frame_rate", type=int, default=25)
    g.add_argument("--num_inference_steps", type=int, default=50)
    g.add_argument("--guidance_scale", type=float, default=5.0)
    g.add_argument("--num_videos_per_prompt", type=int, default=1)
    # ------------------------------------------------------- parallel args
    g = parser.add_argument_group("parallel")
    g.add_argument("--parallel_backend", type=str, default="ptd", choices=["accelerate", "ptd"])
    g.add_argument("--pp_degree", type=int, default=1)
    g.add_argument("--dp_degree", type=int, default=1)
    g.add_argument("--dp_shards", type=int, default=1)
    g.add_argument("--cp_degree", type=int, default=1)
    g.add_argument("--tp_degree", type=int, default=1)
    # ------------------------------------------------ attention provider etc.
    g = parser.add_argument_group("attention")
    g.add_argument("--attn_provider", type=str, default=None,
                   help="Attention provider for the denoise loop (sage int8, flash, ...)")
    # ------------------------------------------------------------ misc args
    g = parser.add_argument_group("misc")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--output_dir", type=str, default="finetrainers-inference")
    g.add_argument("--tracker_name", type=str, default="finetrainers-inference")
    g.add_argument("--report_to", type=str, default="none", choices=["none", "wandb", "jsonl"])
    g.add_argument("--verbose", type=int, default=0, choices=[0, 1, 2, 3])
    return parser.parse_args(argv)


_DTYPES = {"fp32": "float32", "fp16": "float16", "bf16": "bfloat16"}


class Inference:
    """Mirrors the reference Inference runner lifecycle: init distributed ->
    load models -> (LoRA) -> build pipeline -> iterate requests -> artifacts."""

    def __init__(self, args):
        import jax.numpy as jnp

        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.logging import get_logger, set_dependency_log_level
        from finetrainers_tpu.parallel import MeshEnv, ParallelDims
        from finetrainers_tpu.trackers import initialize_trackers

        self.args = args
        self.logger = get_logger("inference")
        set_dependency_log_level(args.verbose)

        import jax

        dp_degree = args.dp_degree
        if (dp_degree, args.dp_shards, args.cp_degree, args.tp_degree) == (1, 1, 1, 1):
            # No layout requested: fan requests out data-parallel over every
            # visible device (the mesh requires degrees to cover all devices).
            dp_degree = jax.device_count()
        dims = ParallelDims(
            dp_replicate=dp_degree, dp_shard=args.dp_shards,
            cp=args.cp_degree, tp=args.tp_degree, pp=args.pp_degree,
        )
        self.mesh_env = MeshEnv(dims)

        spec_cls = _get_model_specifiction_cls(args.model_name, args.training_type)
        dt = lambda name: getattr(jnp, _DTYPES[getattr(args, f"{name}_dtype")])
        self.spec = spec_cls(
            pretrained_model_name_or_path=args.pretrained_model_name_or_path,
            tokenizer_id=args.tokenizer_id, tokenizer_2_id=args.tokenizer_2_id,
            tokenizer_3_id=args.tokenizer_3_id,
            text_encoder_id=args.text_encoder_id, text_encoder_2_id=args.text_encoder_2_id,
            text_encoder_3_id=args.text_encoder_3_id,
            transformer_id=args.transformer_id, vae_id=args.vae_id,
            text_encoder_dtype=dt("text_encoder"), text_encoder_2_dtype=dt("text_encoder_2"),
            text_encoder_3_dtype=dt("text_encoder_3"),
            transformer_dtype=dt("transformer"), vae_dtype=dt("vae"),
            revision=args.revision, cache_dir=args.cache_dir,
        )
        self.tracker = initialize_trackers(
            args.report_to, args.tracker_name,
            log_dir=os.path.join(args.output_dir, "logs"),
            is_main_process=self.mesh_env.is_main_process,
        )

    # ------------------------------------------------------------- loading
    def prepare_models(self):
        args = self.args
        if args.lora_weights:
            from finetrainers_tpu.lora import apply_lora_to_module_params, load_lora_weights

            state, config = load_lora_weights(args.lora_weights)
            # The base graph needs LoRA leaves of the adapter's rank before the
            # state dict can be inserted (reference analog: peft injects adapter
            # layers on load).
            rank = int(config.get("r", 0) or 0)
            if rank and getattr(self.spec, "lora_rank", 0) != rank:
                self.spec.lora_rank = rank
                self.spec.lora_alpha = float(config.get("lora_alpha", rank))
        if args.training_type.startswith("control"):
            # Control checkpoints widen the patch-embed input channels to accept
            # channel-concatenated control latents (3x base with the mask channel).
            base_in = self.spec.transformer_config["in_channels"]
            new_in = base_in * (3 if args.frame_conditioning_concatenate_mask else 2)
            transformer = self.spec.load_diffusion_models(new_in_features=new_in)["transformer"]
        else:
            transformer = self.spec.load_diffusion_models()["transformer"]
        if args.lora_weights:
            from finetrainers_tpu.lora import apply_auxiliary_weights

            if args.lora_scale != 1.0:
                # peft lora_scale folds into the B factors
                state = {
                    k: v * args.lora_scale if ".lora_B." in k or k.endswith("lora_b") else v
                    for k, v in state.items()
                }
            params = apply_lora_to_module_params(
                transformer.params, transformer.module, state,
                key_map=self.spec.transformer_key_map,
            )
            lora_dir = args.lora_weights
            if not os.path.isdir(lora_dir):
                lora_dir = os.path.dirname(lora_dir)
            params = apply_auxiliary_weights(
                params, os.path.join(lora_dir, "control_aux_weights.safetensors")
            )
            transformer = type(transformer)(transformer.module, params, transformer.config)
            self.logger.info(f"Loaded LoRA from {args.lora_weights} ({len(state)} tensors)")
        if args.quantize_int8:
            import jax

            from finetrainers_tpu.utils.int8 import apply_int8_storage

            # jit + donation: quantizing 12 GB of live bf16 eagerly materializes
            # per-tensor f32 absmax temporaries and OOMs a 16 GB chip; under jit
            # the casts fuse into the reductions and donated bf16 buffers free
            # as their int8 replacements are produced.
            params = jax.jit(apply_int8_storage, donate_argnums=0)(transformer.params)
            transformer = type(transformer)(transformer.module, params, transformer.config)
            self.logger.info("Quantized transformer base weights to int8 (LoRA stays full precision)")
        vae = self.spec.load_latent_models()["vae"]
        if args.enable_slicing:
            vae.enable_slicing()
        if args.enable_tiling:
            vae.enable_tiling()
        self.pipeline = self.spec.load_pipeline(transformer=transformer, vae=vae)

    # ------------------------------------------------------------- requests
    def _requests(self):
        args = self.args
        if args.dataset_file:
            from finetrainers_tpu.data import ValidationDataset

            for i, sample in enumerate(ValidationDataset(args.dataset_file)):
                yield i, {k: v for k, v in sample.items() if v is not None}
            return
        if args.prompt is None:
            raise ValueError("Provide --prompt or --dataset_file")
        request = dict(prompt=args.prompt)
        if args.negative_prompt:
            request["negative_prompt"] = args.negative_prompt
        if args.image_path:
            from finetrainers_tpu.data.utils import load_image

            request["image"] = load_image(args.image_path, to_float=False)
        if args.control_image_path:
            from finetrainers_tpu.data.utils import load_image

            request["control_image"] = load_image(args.control_image_path, to_float=False)
        if args.control_video_path:
            from finetrainers_tpu.data.utils import load_video

            request["control_video"] = load_video(args.control_video_path, to_float=False)
        yield 0, request

    # ------------------------------------------------------------------ run
    def run(self):
        import contextlib

        import jax

        from finetrainers_tpu.data.utils import save_image, save_video
        from finetrainers_tpu.ops import attention_provider

        args = self.args
        self.prepare_models()
        out_dir = pathlib.Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)

        defaults = dict(
            height=args.height, width=args.width,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale, seed=args.seed,
        )
        if args.inference_type != InferenceType.T2I:
            defaults.update(num_frames=args.num_frames, frame_rate=args.frame_rate)

        ctx = attention_provider(args.attn_provider) if args.attn_provider else contextlib.nullcontext()
        artifacts = []
        with ctx:
            for i, request in enumerate(self._requests()):
                idx, sample = request
                if jax.process_count() > 1 and idx % jax.process_count() != jax.process_index():
                    continue
                if args.inference_type == InferenceType.I2V and "image" not in sample:
                    raise ValueError("image_to_video requests need image/--image_path")
                kwargs = {**defaults, **sample}
                for rep in range(max(args.num_videos_per_prompt, 1)):
                    kwargs["seed"] = args.seed + rep
                    t0 = time.perf_counter()
                    output = self.pipeline(**kwargs)
                    elapsed = time.perf_counter() - t0
                    stem = f"output-{jax.process_index()}-{idx:04d}-{rep}"
                    if output.ndim == 4:  # (F, H, W, 3) video
                        path = out_dir / f"{stem}.mp4"
                        save_video(output, str(path))
                        kind = "video"
                    else:
                        path = out_dir / f"{stem}.png"
                        save_image(output, str(path))
                        kind = "image"
                    artifacts.append({"type": kind, "path": str(path),
                                      "caption": sample.get("prompt")})
                    self.logger.info(f"[{idx}:{rep}] {kind} in {elapsed:.1f}s -> {path}")
                    self.tracker.log({"inference/seconds": elapsed}, step=len(artifacts))
        self.tracker.log_artifacts(artifacts, step=len(artifacts))
        self.tracker.finish()
        manifest = out_dir / f"manifest-{os.getpid()}.json"
        manifest.write_text(json.dumps(artifacts, indent=2))
        return [a["path"] for a in artifacts]


def main(argv=None):
    args = parse_args(argv)
    runner = Inference(args)
    paths = runner.run()
    if paths:
        print(f"Saved {len(paths)} outputs under {args.output_dir}")
    return paths


if __name__ == "__main__":
    main()
