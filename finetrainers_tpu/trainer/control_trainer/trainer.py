"""Control trainer: channel-concat control-conditioned training.

Parity with reference `trainer/control_trainer/trainer.py:37-1021`: widens the
transformer input projection for the concatenated control channels (:92-95),
trains the injection layer at full rank alongside LoRA (:131-144), optional
QK-norm training via regex selection (:146-161), wraps the dataset in
`IterableControlDataset` (:300-301), and saves the qk-norm/injection state dict
alongside the LoRA weights (:317-344)."""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import jax
import numpy as np

from ...logging import get_logger
from ...lora import lora_mask, trainable_mask
from ...models.modeling_utils import flatten_params, unflatten_params
from ..sft_trainer.trainer import SFTTrainer
from .config import ControlType
from .data import IterableControlDataset


logger = get_logger(__name__)


class ControlTrainer(SFTTrainer):
    # ---------------------------------------------------------------- prepare
    def _prepare_models(self) -> None:
        spec = self.model_specification
        args = self.args
        if args.training_type in ("control-lora",):
            spec.lora_rank = getattr(args, "rank", 64)
            spec.lora_alpha = getattr(args, "lora_alpha", 64)
        for attr in ("frame_conditioning_type", "frame_conditioning_index",
                     "frame_conditioning_concatenate_mask"):
            if hasattr(args, attr):
                setattr(spec, attr, getattr(args, attr))

        base_in = spec.transformer_config["in_channels"]
        new_in = base_in * 2
        if getattr(args, "frame_conditioning_concatenate_mask", False):
            new_in += base_in
        # Widening happens on the *channel* count; patch multiplication is internal.
        diffusion = spec.load_diffusion_models(new_in_features=new_in)
        self.transformer = diffusion["transformer"]
        self.scheduler = diffusion["scheduler"]
        self.vae = spec.load_latent_models()["vae"]
        if getattr(args, "enable_slicing", False):
            self.vae.enable_slicing()
        if getattr(args, "enable_tiling", False):
            self.vae.enable_tiling()
        self.condition_models = spec.load_condition_models()

    def _prepare_trainable_parameters(self) -> None:
        spec = self.model_specification
        args = self.args
        params = self.transformer.params
        if args.training_type == "control-lora":
            base_mask = lora_mask(params)
            injection = spec.control_injection_layer_name
            qk_patterns = spec._qk_norm_identifiers if getattr(args, "train_qk_norm", False) else []

            def predicate(path: str) -> bool:
                if "lora_a" in path or "lora_b" in path:
                    return True
                if injection in path:
                    return True  # injection layer trains at full rank
                return any(re.search(p, path) for p in qk_patterns)

            self._trainable_mask = trainable_mask(params, predicate)
        else:
            self._trainable_mask = trainable_mask(params, lambda s: True)

        # Delegate the sharding/split plumbing to the SFT implementation.
        self._finalize_trainable(params, self._trainable_mask)

    def _prepare_dataset(self) -> None:
        super()._prepare_dataset()
        control_type = getattr(self.args, "control_type", ControlType.CANNY.value)
        self.dataset = IterableControlDataset(self.dataset, control_type=control_type)
        from ...data import DPDataLoader

        self.dataloader = DPDataLoader(
            rank=jax.process_index(),
            dataset=self.dataset,
            batch_size=1,
            num_workers=self.args.dataloader_num_workers,
            collate_fn=lambda items: items[0],
            num_replicas=jax.process_count(),
        )
        spec = self.model_specification
        vae = self.vae

        def process_latent(**sample):
            return spec.prepare_latents(
                vae=vae,
                image=sample.get("image"), video=sample.get("video"),
                control_image=sample.get("control_image"), control_video=sample.get("control_video"),
                compute_posterior=False,
            )

        self.preprocessor._processor_fn["latent"] = process_latent
        self._data_iterator = iter(self.dataloader)

    def _load_fresh_transformer(self):
        """Control transformers are loaded with the widened (2x or 3x) patch-embed
        input channels — the final-validation reload must widen identically."""
        spec = self.model_specification
        args = self.args
        base_in = spec.transformer_config["in_channels"]
        new_in = base_in * 2
        if getattr(args, "frame_conditioning_concatenate_mask", False):
            new_in += base_in
        return spec.load_diffusion_models(new_in_features=new_in)["transformer"]

    def _apply_auxiliary_exports(self, params, export_dir: str):
        """Re-apply exported qk-norm / injection-layer weights on top of the
        fresh base + LoRA (inverse of `_save_auxiliary_weights`)."""
        from ...lora import apply_auxiliary_weights

        return apply_auxiliary_weights(
            params, os.path.join(export_dir, "control_aux_weights.safetensors")
        )

    def _save_auxiliary_weights(self, directory: str, state: Dict[str, Any]) -> None:
        """Export qk-norm + injection-layer weights next to the LoRA safetensors
        (reference control trainer :317-344)."""
        from ...utils.serialization import safetensors_save_dict

        spec = self.model_specification
        flat = flatten_params(state["trainable"])
        aux = {
            k: np.asarray(v) for k, v in flat.items()
            if v is not None and "lora_" not in k
        }
        if aux:
            os.makedirs(directory, exist_ok=True)
            safetensors_save_dict(aux, os.path.join(directory, "control_aux_weights.safetensors"))

    def _prepare_checkpointing(self) -> None:
        super()._prepare_checkpointing()
        base_callback = self.checkpointer._callback_fn

        def callback(state):
            if base_callback is not None:
                base_callback(state)
            if self.mesh_env.is_main_process and self.args.training_type == "control-lora":
                step = int(self.state.train_state.step)
                self._save_auxiliary_weights(
                    os.path.join(self.args.output_dir, "lora_weights", f"{step:06d}"), state
                )

        self.checkpointer._callback_fn = callback
