"""Model/training-type registry. Parity with reference `finetrainers/config.py:13-75`."""

from __future__ import annotations

import importlib
from enum import Enum
from typing import Dict, Tuple


class ModelType(str, Enum):
    COGVIDEOX = "cogvideox"
    COGVIEW4 = "cogview4"
    FLUX = "flux"
    HUNYUAN_VIDEO = "hunyuan_video"
    LTX_VIDEO = "ltx_video"
    WAN = "wan"
    DUMMY = "dummy"  # tiny test-only DiT (this framework's addition for CPU CI)


class TrainingType(str, Enum):
    LORA = "lora"
    FULL_FINETUNE = "full-finetune"
    CONTROL_LORA = "control-lora"
    CONTROL_FULL_FINETUNE = "control-full-finetune"


_SFT = (TrainingType.LORA, TrainingType.FULL_FINETUNE)
_CONTROL = (TrainingType.CONTROL_LORA, TrainingType.CONTROL_FULL_FINETUNE)

# model -> {training types}: (module path, class name). Imports resolve lazily so
# the CLI starts fast and partial installs still work.
_REGISTRY: Dict[ModelType, Dict[TrainingType, Tuple[str, str]]] = {
    ModelType.COGVIDEOX: {t: ("finetrainers_tpu.models.cogvideox", "CogVideoXModelSpecification") for t in _SFT},
    ModelType.COGVIEW4: {
        **{t: ("finetrainers_tpu.models.cogview4", "CogView4ModelSpecification") for t in _SFT},
        **{t: ("finetrainers_tpu.models.cogview4", "CogView4ControlModelSpecification") for t in _CONTROL},
    },
    ModelType.FLUX: {t: ("finetrainers_tpu.models.flux", "FluxModelSpecification") for t in _SFT},
    ModelType.HUNYUAN_VIDEO: {
        t: ("finetrainers_tpu.models.hunyuan_video", "HunyuanVideoModelSpecification") for t in _SFT
    },
    ModelType.LTX_VIDEO: {t: ("finetrainers_tpu.models.ltx_video", "LTXVideoModelSpecification") for t in _SFT},
    ModelType.WAN: {
        **{t: ("finetrainers_tpu.models.wan", "WanModelSpecification") for t in _SFT},
        **{t: ("finetrainers_tpu.models.wan", "WanControlModelSpecification") for t in _CONTROL},
    },
    ModelType.DUMMY: {t: ("finetrainers_tpu.models.dummy", "DummyModelSpecification") for t in _SFT},
}


class _LazySupportedConfigs:
    """Dict-like view over the registry (keys/values resolve imports on access)."""

    def __getitem__(self, key):
        return {t: _resolve(*ref) for t, ref in _REGISTRY[ModelType(key)].items()}

    def __contains__(self, key):
        try:
            return ModelType(key) in _REGISTRY
        except ValueError:
            return False

    def items(self):
        return [(m, self[m]) for m in _REGISTRY]

    def keys(self):
        return _REGISTRY.keys()


SUPPORTED_MODEL_CONFIGS = _LazySupportedConfigs()


def _resolve(module_path: str, cls_name: str):
    module = importlib.import_module(module_path)
    return getattr(module, cls_name)


def _get_model_specifiction_cls(model_name: str, training_type: str):
    """(Name kept reference-compatible, typo included: reference config.py:66.)"""
    model_type = ModelType(model_name)
    if model_type not in _REGISTRY:
        raise ValueError(
            f"Model {model_name!r} is not supported. Supported models: {sorted(m.value for m in _REGISTRY)}"
        )
    tt = TrainingType(training_type)
    if tt not in _REGISTRY[model_type]:
        raise ValueError(
            f"Training type {training_type!r} is not supported for model {model_name!r}. "
            f"Supported training types: {sorted(t.value for t in _REGISTRY[model_type])}"
        )
    return _resolve(*_REGISTRY[model_type][tt])


get_model_specification_cls = _get_model_specifiction_cls
