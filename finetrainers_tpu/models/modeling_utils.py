"""ModelSpecification: the per-model adapter contract.

Capability parity with reference `finetrainers/models/modeling_utils.py:26-388`
(`ModelSpecification` + `ControlModelSpecification`), redesigned for JAX:

  - Components are `ModelHandle`s — (flax module, param pytree, config) triples —
    instead of torch nn.Modules; params live outside the module so the trainer can
    shard/donate/optimize them functionally.
  - `forward` is a *pure jittable function* (called inside the trainer's jitted
    train step) instead of a stateful method.
  - `apply_tensor_parallel` becomes declarative `tp_rules()` (regex → PartitionSpec),
    consumed by `parallel.sharding.make_param_shardings`.

Reference method surface kept: load_condition_models / load_latent_models /
load_diffusion_models / load_pipeline / prepare_conditions / prepare_latents /
collate_conditions / collate_latents / forward / validation / _save_lora_weights /
_save_model / _resolution_dim_keys.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..logging import get_logger


logger = get_logger(__name__)

# Keys excluded from tensor collation (reference modeling_utils.py:22).
# NOTE: original_size/target_size/crop_coords must NOT be ignored — CogView4's
# (1, 2) per-sample microconds have to stack to the batch size or the
# time_condition_embed width collapses (the reference collates them normally).
IGNORE_KEYS_FOR_COLLATION = ["height", "width", "num_frames", "frame_rate", "rope_interpolation_scale"]


@dataclasses.dataclass
class ModelHandle:
    """A model component: flax module + its params + config dict."""

    module: Any
    params: Any
    config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # Memory-bounded VAE encode modes (reference vae.enable_slicing()/enable_tiling(),
    # utils/diffusion.py:154-158); honored by `autoencoders.encode_media`.
    use_slicing: bool = False
    use_tiling: bool = False

    def apply(self, *args, **kwargs):
        return self.module.apply({"params": self.params}, *args, **kwargs)

    def enable_slicing(self) -> None:
        self.use_slicing = True

    def enable_tiling(self) -> None:
        self.use_tiling = True


class ModelSpecification:
    """Base class for model specs (reference modeling_utils.py:26-300)."""

    def __init__(
        self,
        pretrained_model_name_or_path: Optional[str] = None,
        tokenizer_id: Optional[str] = None,
        tokenizer_2_id: Optional[str] = None,
        tokenizer_3_id: Optional[str] = None,
        text_encoder_id: Optional[str] = None,
        text_encoder_2_id: Optional[str] = None,
        text_encoder_3_id: Optional[str] = None,
        transformer_id: Optional[str] = None,
        vae_id: Optional[str] = None,
        text_encoder_dtype: Any = jnp.bfloat16,
        text_encoder_2_dtype: Any = jnp.bfloat16,
        text_encoder_3_dtype: Any = jnp.bfloat16,
        transformer_dtype: Any = jnp.bfloat16,
        vae_dtype: Any = jnp.bfloat16,
        revision: Optional[str] = None,
        cache_dir: Optional[str] = None,
    ) -> None:
        self.pretrained_model_name_or_path = pretrained_model_name_or_path
        self.tokenizer_id = tokenizer_id
        self.tokenizer_2_id = tokenizer_2_id
        self.tokenizer_3_id = tokenizer_3_id
        self.text_encoder_id = text_encoder_id
        self.text_encoder_2_id = text_encoder_2_id
        self.text_encoder_3_id = text_encoder_3_id
        self.transformer_id = transformer_id
        self.vae_id = vae_id
        self.text_encoder_dtype = text_encoder_dtype
        self.text_encoder_2_dtype = text_encoder_2_dtype
        self.text_encoder_3_dtype = text_encoder_3_dtype
        self.transformer_dtype = transformer_dtype
        self.vae_dtype = vae_dtype
        self.revision = revision
        self.cache_dir = cache_dir
        self.transformer_config: Dict[str, Any] = {}
        self.vae_config: Dict[str, Any] = {}
        # Runtime compile/memory knobs the trainer sets before load_diffusion_models:
        # use_scan: None = auto (scan-over-layers for deep stacks); gradient_checkpointing:
        # None | "full" | "ops" | "block_skip" (per-block remat inside the stack).
        self.use_scan: Optional[bool] = None
        self.gradient_checkpointing: Optional[str] = None

    # Per-family overrides for diffusers-format export/import.
    transformer_key_map = None  # Callable[[str], str] flax key -> torch key
    transformer_class_name: Optional[str] = None  # diffusers _class_name for config.json

    def _transformer_runtime_kwargs(self) -> Dict[str, Any]:
        return {"use_scan": self.use_scan, "gradient_checkpointing": self.gradient_checkpointing}

    # ------------------------------------------------------------------ loading
    def load_condition_models(self) -> Dict[str, Any]:
        """Tokenizers + text encoders (as ModelHandles / tokenizer objects)."""
        raise NotImplementedError

    def load_latent_models(self) -> Dict[str, Any]:
        """VAE handle."""
        raise NotImplementedError

    def load_diffusion_models(self) -> Dict[str, Any]:
        """Transformer handle + scheduler."""
        raise NotImplementedError

    def load_pipeline(self, **kwargs) -> Any:
        """Inference/validation pipeline."""
        raise NotImplementedError

    # ------------------------------------------------------------ data prep
    def prepare_conditions(self, **kwargs) -> Dict[str, Any]:
        """Caption -> text-encoder embeddings (host-side, precompute-friendly)."""
        raise NotImplementedError

    def prepare_latents(self, **kwargs) -> Dict[str, Any]:
        """Media -> VAE latents/moments (host-side, precompute-friendly)."""
        raise NotImplementedError

    def collate_conditions(self, data: List[Dict[str, Any]]) -> Dict[str, Any]:
        return _default_collate(data)

    def collate_latents(self, data: List[Dict[str, Any]]) -> Dict[str, Any]:
        return _default_collate(data)

    # ---------------------------------------------------------------- training
    def forward(
        self,
        transformer: ModelHandle,
        condition_model_conditions: Dict[str, jax.Array],
        latent_model_conditions: Dict[str, jax.Array],
        sigmas: jax.Array,
        rng: jax.Array,
        compute_posterior: bool = True,
        **kwargs,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Pure training forward: returns (pred, target, sigmas). Jittable."""
        raise NotImplementedError

    # -------------------------------------------------------------- validation
    def validation(self, pipeline, **kwargs) -> List[Any]:
        raise NotImplementedError

    # ------------------------------------------------------------------ export
    def _save_lora_weights(self, directory: str, lora_params, lora_config: Dict[str, Any],
                           scheduler=None, module=None) -> None:
        """Export inference-ready LoRA in peft/diffusers key convention
        (reference trainer/sft_trainer/trainer.py:284-298). Stacked (scanned)
        params are unstacked to per-block layout first."""
        from ..lora import save_lora_weights
        from .weight_utils import maybe_unstack_params

        if module is not None:
            lora_params = maybe_unstack_params(lora_params, module)
        save_lora_weights(directory, lora_params, lora_config, key_map=self.transformer_key_map)

    def _save_model(self, directory: str, transformer: ModelHandle, scheduler=None) -> None:
        """Export the transformer in diffusers format: config.json +
        diffusion_pytorch_model.safetensors with torch-convention keys
        (reference trainer/sft_trainer/trainer.py:300-306)."""
        import json
        import os

        from ..utils.serialization import safetensors_save_dict
        from .weight_utils import flax_params_to_torch_state_dict, maybe_unstack_params

        os.makedirs(directory, exist_ok=True)
        params = maybe_unstack_params(transformer.params, transformer.module)
        state = flax_params_to_torch_state_dict(params, key_map=self.transformer_key_map)
        safetensors_save_dict(
            {k: np.ascontiguousarray(v) for k, v in state.items()},
            os.path.join(directory, "diffusion_pytorch_model.safetensors"),
        )
        config = {k: _jsonable_config(v) for k, v in (transformer.config or {}).items()}
        if self.transformer_class_name:
            config["_class_name"] = self.transformer_class_name
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2)

    def _component_dir(self, explicit_id: Optional[str], subfolder: str) -> Optional[str]:
        """Resolve a local HF component directory (explicit id or
        <pretrained_model_name_or_path>/<subfolder>)."""
        import os

        for candidate in (
            explicit_id,
            os.path.join(self.pretrained_model_name_or_path or "", subfolder),
        ):
            if candidate and os.path.isdir(candidate) and os.path.exists(
                os.path.join(candidate, "config.json")
            ):
                return candidate
        return None

    def _load_text_tower(self, handle_cls, explicit_id: Optional[str], subfolder: str,
                         fallback_fn: Callable[[], Any], **kwargs):
        """Load a real flax text/vision tower from a local checkpoint dir,
        degrading loudly to the offline fallback (HashEncoder) otherwise."""
        path = self._component_dir(explicit_id, subfolder)
        if path is not None:
            try:
                tower = handle_cls(path, **kwargs)
                logger.info(f"Loaded {handle_cls.__name__} from {path}")
                return tower
            except Exception as e:
                logger.warning(
                    f"Failed to load {handle_cls.__name__} from {path}: {e}; using offline fallback"
                )
        return fallback_fn()

    def _load_image_vae(self, default_scaling: float = 0.18215,
                        default_shift: Optional[float] = None) -> Optional["ModelHandle"]:
        """Build the faithful 2D AutoencoderKL from a local diffusers `vae/`
        directory (config.json [+ safetensors weights]). Returns None when no
        checkpoint directory exists (callers keep their offline fallback).
        Latent statistics (scaling/shift) come from the checkpoint config —
        the reference encodes through the real pretrained VAEs
        (e.g. flux/base_specification.py prepare_latents)."""
        vae_dir = self._component_dir(self.vae_id, "vae")
        if vae_dir is None:
            return None
        import jax

        from .autoencoder_kl import AutoencoderKL, AutoencoderKLConfig, load_autoencoder_kl_params
        from .weight_utils import load_diffusers_checkpoint_dir, load_diffusers_config

        hf_cfg = load_diffusers_config(vae_dir)
        cfg = AutoencoderKLConfig.from_hf(hf_cfg)
        module = AutoencoderKL(cfg, dtype=self.vae_dtype)
        ratio = cfg.spatial_compression_ratio
        example = jnp.zeros((1, cfg.in_channels, ratio, ratio), jnp.float32)
        try:
            state = load_diffusers_checkpoint_dir(vae_dir)
            abstract = jax.eval_shape(
                lambda: module.init(jax.random.PRNGKey(0), example)["params"]
            )
            params = load_autoencoder_kl_params(state, abstract)
            logger.info(f"Loaded AutoencoderKL weights from {vae_dir} ({len(state)} tensors)")
        except FileNotFoundError:
            logger.warning(f"{vae_dir} has a config but no weights; using random-init VAE")
            params = module.init(jax.random.PRNGKey(0), example)["params"]
        config = {
            "latent_channels": cfg.latent_channels,
            "spatial_compression_ratio": ratio,
            "scaling_factor": hf_cfg.get("scaling_factor", default_scaling),
            "shift_factor": hf_cfg.get("shift_factor", default_shift),
        }
        return ModelHandle(module, params, config)

    def _load_video_vae(self, module_cls, config_cls, loader,
                        default_scaling: float = 1.0) -> Optional["ModelHandle"]:
        """Build a faithful per-family causal 3D VAE (AutoencoderKLWan /
        AutoencoderKLLTXVideo / AutoencoderKLHunyuanVideo / AutoencoderKLCogVideoX
        flax ports) from a local diffusers `vae/` directory, loading its weights
        AND latent statistics. Returns None when no checkpoint dir exists
        (callers keep their structural offline fallback). Reference bar: the
        specs encode through the real pretrained VAEs
        (e.g. wan/base_specification.py:420-474)."""
        import jax

        from .weight_utils import load_diffusers_checkpoint_dir, load_diffusers_config

        vae_dir = self._component_dir(self.vae_id, "vae")
        if vae_dir is None:
            return None
        hf_cfg = load_diffusers_config(vae_dir)
        cfg = config_cls.from_hf(hf_cfg)
        module = module_cls(cfg, dtype=self.vae_dtype)
        ratio = cfg.spatial_compression_ratio
        example = jnp.zeros((1, hf_cfg.get("in_channels", 3), 1, ratio, ratio), jnp.float32)
        try:
            state = load_diffusers_checkpoint_dir(vae_dir)
            abstract = jax.eval_shape(
                lambda: module.init(jax.random.PRNGKey(0), example)["params"]
            )
            params = loader(state, abstract)
            logger.info(f"Loaded {module_cls.__name__} weights from {vae_dir} ({len(state)} tensors)")
        except FileNotFoundError:
            logger.warning(f"{vae_dir} has a config but no weights; using random-init VAE")
            params = module.init(jax.random.PRNGKey(0), example)["params"]
        latent_ch = getattr(cfg, "z_dim", None) or getattr(cfg, "latent_channels", None)
        mean = hf_cfg.get("latents_mean")
        std = hf_cfg.get("latents_std")
        config = {
            "latent_channels": latent_ch,
            "spatial_compression_ratio": ratio,
            "temporal_compression_ratio": cfg.temporal_compression_ratio,
            "scaling_factor": hf_cfg.get("scaling_factor", default_scaling),
            "latents_mean": np.asarray(mean, np.float32) if mean is not None
            else np.zeros((latent_ch,), np.float32),
            "latents_std": np.asarray(std, np.float32) if std is not None
            else np.ones((latent_ch,), np.float32),
        }
        return ModelHandle(module, params, config)

    def _maybe_load_pretrained_transformer(self, params, converter, subfolder: str = "transformer",
                                           module=None):
        """If the pretrained path is a local diffusers directory, convert its
        weights into `params` (LoRA leaves keep their fresh init); otherwise
        return `params` unchanged (hub download requires network). For scanned
        modules the converter runs in per-block layout and is re-stacked."""
        import os

        from .weight_utils import load_diffusers_checkpoint_dir, load_pretrained_into_params

        for candidate in (
            self.transformer_id,
            os.path.join(self.pretrained_model_name_or_path or "", subfolder),
        ):
            if candidate and os.path.isdir(candidate) and (
                os.path.exists(os.path.join(candidate, "config.json"))
                or any(f.endswith(".safetensors") for f in os.listdir(candidate))
            ):
                state = load_diffusers_checkpoint_dir(candidate)
                logger.info(f"Loading transformer weights from {candidate} ({len(state)} tensors)")
                return load_pretrained_into_params(state, params, converter, module=module)
        return params

    # ------------------------------------------------------------- parallelism
    def tp_rules(self) -> List[Tuple[str, Any]]:
        """Tensor-parallel sharding rules: (param path regex, PartitionSpec).
        Replaces reference apply_tensor_parallel (modeling_utils.py:233-245)."""
        return []

    def cp_plan(self) -> Dict[str, Any]:
        """Context-parallel metadata: which batch keys carry the sharded sequence
        dim (replaces the reference's CPInput/CPOutput hook plan, _metadata.py:16-71)."""
        return {}

    @property
    def _resolution_dim_keys(self) -> Dict[str, Tuple[int, ...]]:
        """Which tensor + dims key resolution-bucketed batching (reference
        per-spec `_resolution_dim_keys`)."""
        raise NotImplementedError


class ControlModelSpecification(ModelSpecification):
    """Adds channel-concat control conditioning (reference modeling_utils.py:303-388)."""

    @property
    def control_injection_layer_name(self) -> str:
        raise NotImplementedError

    @property
    def _original_control_layer_in_features(self) -> int:
        raise NotImplementedError

    @property
    def _original_control_layer_out_features(self) -> int:
        raise NotImplementedError

    @property
    def _qk_norm_identifiers(self) -> List[str]:
        return []

    def load_diffusion_models(self, new_in_features: Optional[int] = None) -> Dict[str, Any]:
        raise NotImplementedError

    def control_lora_rank_pattern(self, rank: int) -> Dict[str, int]:
        """The injection layer trains at full rank (reference control trainer :131-144)."""
        return {self.control_injection_layer_name: self._original_control_layer_out_features}

    def control_lora_alpha_pattern(self, alpha: float) -> Dict[str, float]:
        return {self.control_injection_layer_name: self._original_control_layer_out_features}


# ------------------------------------------------------------------- helpers


def _jsonable_config(v):
    if isinstance(v, (list, tuple)):
        return [_jsonable_config(x) for x in v]
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    return str(v)


def _default_collate(data: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack tensors across samples except IGNORE_KEYS_FOR_COLLATION
    (reference modeling_utils.py:156-181)."""
    if len(data) == 0:
        return {}
    out: Dict[str, Any] = {}
    for key in data[0]:
        values = [d[key] for d in data]
        if key in IGNORE_KEYS_FOR_COLLATION:
            out[key] = values[0]
            continue
        first = values[0]
        if isinstance(first, (np.ndarray, jax.Array)) and getattr(first, "ndim", 0) > 0:
            arrs = [np.asarray(v) for v in values]
            if arrs[0].shape[0] == 1:
                # Samples already carry a leading batch dim of 1 (prepare_* outputs).
                out[key] = np.concatenate(arrs, axis=0)
            else:
                out[key] = np.stack(arrs)
        else:
            out[key] = values[0]
    return out


def flatten_params(params, prefix: str = "", sep: str = ".") -> Dict[str, Any]:
    flat = {}
    if isinstance(params, dict):
        for k, v in params.items():
            key = f"{prefix}{sep}{k}" if prefix else str(k)
            flat.update(flatten_params(v, key, sep))
    else:
        flat[prefix] = params
    return flat


def unflatten_params(flat: Dict[str, Any], sep: str = ".") -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def instance_jit(obj, key, make_fn, **jit_kwargs):
    """Per-instance jit cache for the pipelines' denoise steps.

    Defining `@jax.jit` closures inside `__call__` creates a fresh PjitFunction
    per request, so batch inference re-traced and re-compiled the denoise step
    for EVERY prompt. Caching on the pipeline instance keyed by the static
    configuration keeps one compiled executable per (flags, shapes) — jit's own
    shape cache handles resolution changes. `make_fn` is only invoked on a
    cache miss and must take every per-request tensor as an argument (anything
    it closes over becomes a baked-in constant)."""
    cache = obj.__dict__.setdefault("_jit_cache", {})
    if key not in cache:
        cache[key] = jax.jit(make_fn(), **jit_kwargs)
    return cache[key]
