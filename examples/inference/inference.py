"""Standalone inference runner.

Parity with reference `examples/inference/inference.py` (~600 LoC standalone
`Inference` app mirroring the trainer structure, with T2I/T2V/I2V inference
types). Uses the same ModelSpecification pipelines as validation.

Usage:
    python examples/inference/inference.py \
        --model_name ltx_video --pretrained_model_name_or_path Lightricks/LTX-Video \
        --inference_type t2v --prompt "a cat" --height 512 --width 704 --num_frames 49 \
        --lora_weights /path/to/lora_weights/000500 --output_dir outputs/
"""

from __future__ import annotations

import argparse
import os
import pathlib
import sys


REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


class InferenceType:
    T2I = "t2i"
    T2V = "t2v"
    I2V = "i2v"


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", type=str, required=True)
    parser.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    parser.add_argument("--inference_type", type=str, default=InferenceType.T2V,
                        choices=[InferenceType.T2I, InferenceType.T2V, InferenceType.I2V])
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--negative_prompt", type=str, default=None)
    parser.add_argument("--image_path", type=str, default=None)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=704)
    parser.add_argument("--num_frames", type=int, default=49)
    parser.add_argument("--num_inference_steps", type=int, default=50)
    parser.add_argument("--guidance_scale", type=float, default=5.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lora_weights", type=str, default=None)
    parser.add_argument("--transformer_dtype", type=str, default="bf16")
    parser.add_argument("--attn_provider", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default="outputs")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from finetrainers_tpu.config import _get_model_specifiction_cls
    from finetrainers_tpu.data.utils import save_image, save_video
    from finetrainers_tpu.lora import apply_lora_state_dict, load_lora_weights
    from finetrainers_tpu.models.weight_utils import lora_peft_to_flax
    from finetrainers_tpu.ops import attention_provider

    spec_cls = _get_model_specifiction_cls(args.model_name, "lora")
    spec = spec_cls(pretrained_model_name_or_path=args.pretrained_model_name_or_path)

    diffusion = spec.load_diffusion_models()
    transformer = diffusion["transformer"]

    if args.lora_weights:
        state, config = load_lora_weights(args.lora_weights)
        if any(".lora_A." in k for k in state):
            state = lora_peft_to_flax(state)
        transformer.params = apply_lora_state_dict(transformer.params, state)
        print(f"Loaded LoRA weights from {args.lora_weights} ({len(state)} tensors)")

    pipeline = spec.load_pipeline(transformer=transformer)

    image = None
    if args.inference_type == InferenceType.I2V:
        if args.image_path is None:
            raise ValueError("--image_path is required for i2v inference")
        from finetrainers_tpu.data.utils import load_image

        image = load_image(args.image_path, to_float=False)

    kwargs = dict(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        height=args.height, width=args.width,
        num_inference_steps=args.num_inference_steps,
        guidance_scale=args.guidance_scale, seed=args.seed,
    )
    if args.inference_type != InferenceType.T2I:
        kwargs["num_frames"] = args.num_frames
    if image is not None:
        kwargs["image"] = image

    ctx = attention_provider(args.attn_provider) if args.attn_provider else None
    if ctx is not None:
        with ctx:
            output = pipeline(**kwargs)
    else:
        output = pipeline(**kwargs)

    os.makedirs(args.output_dir, exist_ok=True)
    if output.ndim == 4:  # video (F, H, W, 3)
        path = os.path.join(args.output_dir, "output.mp4")
        save_video(output, path)
    else:  # image (H, W, 3)
        path = os.path.join(args.output_dir, "output.png")
        save_image(output, path)
    print(f"Saved output to {path}")
    return path


if __name__ == "__main__":
    main()
