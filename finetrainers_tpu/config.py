"""Model/training-type registry. Parity with reference `finetrainers/config.py:13-75`."""

from __future__ import annotations

from enum import Enum
from typing import Dict, Type


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


def _specs() -> Dict[ModelType, Dict[TrainingType, Type]]:
    # Lazy import to avoid pulling heavy model modules at CLI startup.
    from .models.cogvideox import CogVideoXModelSpecification
    from .models.cogview4 import CogView4ControlModelSpecification, CogView4ModelSpecification
    from .models.dummy import DummyModelSpecification
    from .models.flux import FluxModelSpecification
    from .models.hunyuan_video import HunyuanVideoModelSpecification
    from .models.ltx_video import LTXVideoModelSpecification
    from .models.wan import WanControlModelSpecification, WanModelSpecification

    return {
        ModelType.COGVIDEOX: {
            TrainingType.LORA: CogVideoXModelSpecification,
            TrainingType.FULL_FINETUNE: CogVideoXModelSpecification,
        },
        ModelType.COGVIEW4: {
            TrainingType.LORA: CogView4ModelSpecification,
            TrainingType.FULL_FINETUNE: CogView4ModelSpecification,
            TrainingType.CONTROL_LORA: CogView4ControlModelSpecification,
            TrainingType.CONTROL_FULL_FINETUNE: CogView4ControlModelSpecification,
        },
        ModelType.FLUX: {
            TrainingType.LORA: FluxModelSpecification,
            TrainingType.FULL_FINETUNE: FluxModelSpecification,
        },
        ModelType.HUNYUAN_VIDEO: {
            TrainingType.LORA: HunyuanVideoModelSpecification,
            TrainingType.FULL_FINETUNE: HunyuanVideoModelSpecification,
        },
        ModelType.LTX_VIDEO: {
            TrainingType.LORA: LTXVideoModelSpecification,
            TrainingType.FULL_FINETUNE: LTXVideoModelSpecification,
        },
        ModelType.WAN: {
            TrainingType.LORA: WanModelSpecification,
            TrainingType.FULL_FINETUNE: WanModelSpecification,
            TrainingType.CONTROL_LORA: WanControlModelSpecification,
            TrainingType.CONTROL_FULL_FINETUNE: WanControlModelSpecification,
        },
        ModelType.DUMMY: {
            TrainingType.LORA: DummyModelSpecification,
            TrainingType.FULL_FINETUNE: DummyModelSpecification,
        },
    }


class _LazySupportedConfigs:
    """Dict-like view that defers model imports until first access."""

    def _get(self):
        return _specs()

    def __getitem__(self, key):
        return self._get()[ModelType(key)]

    def __contains__(self, key):
        try:
            return ModelType(key) in self._get()
        except ValueError:
            return False

    def items(self):
        return self._get().items()

    def keys(self):
        return self._get().keys()


SUPPORTED_MODEL_CONFIGS = _LazySupportedConfigs()


def _get_model_specifiction_cls(model_name: str, training_type: str):
    """(Name kept reference-compatible, typo included: config.py:66.)"""
    model_type = ModelType(model_name)
    specs = _specs()
    if model_type not in specs:
        raise ValueError(
            f"Model {model_name!r} is not supported. Supported models: {sorted(m.value for m in specs)}"
        )
    tt = TrainingType(training_type)
    if tt not in specs[model_type]:
        raise ValueError(
            f"Training type {training_type!r} is not supported for model {model_name!r}. "
            f"Supported training types: {sorted(t.value for t in specs[model_type])}"
        )
    return specs[model_type][tt]


get_model_specification_cls = _get_model_specifiction_cls
