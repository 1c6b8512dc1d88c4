"""Hub helpers: model card + optional push. Parity with reference `utils/hub.py`
(save_model_card); pushing requires network and gates gracefully offline."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional


MODEL_CARD_TEMPLATE = """---
base_model: {base_model}
library_name: finetrainers-tpu
license: other
tags:
- text-to-{media}
- diffusers
- lora
- template:sd-lora
---

# {model_name} LoRA — trained with finetrainers-tpu

This is a fine-tune of [`{base_model}`]({base_model_url}) trained with the
TPU-native finetrainers framework (JAX/XLA/Pallas).

## Training details

{training_details}

## Usage

Load the LoRA weights with diffusers (`pipe.load_lora_weights(...)`) or with
finetrainers-tpu (`finetrainers_tpu.lora.load_lora_weights`).

## Validation prompts

{validation_prompts}
"""


def save_model_card(
    output_dir: str,
    base_model: str,
    model_name: Optional[str] = None,
    training_details: Optional[Dict[str, Any]] = None,
    validation_prompts: Optional[List[str]] = None,
    media: str = "video",
) -> str:
    details = "\n".join(f"- **{k}**: {v}" for k, v in (training_details or {}).items()) or "- n/a"
    prompts = "\n".join(f"- {p}" for p in (validation_prompts or [])) or "- n/a"
    card = MODEL_CARD_TEMPLATE.format(
        base_model=base_model,
        base_model_url=f"https://huggingface.co/{base_model}",
        model_name=model_name or os.path.basename(output_dir.rstrip("/")),
        training_details=details,
        validation_prompts=prompts,
        media=media,
    )
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "README.md")
    with open(path, "w") as f:
        f.write(card)
    return path


def push_to_hub(repo_id: str, folder_path: str, token: Optional[str] = None) -> Optional[str]:
    """Upload the output folder to the Hub; returns the repo url or None offline."""
    try:
        from huggingface_hub import HfApi

        api = HfApi(token=token)
        api.create_repo(repo_id, exist_ok=True)
        api.upload_folder(repo_id=repo_id, folder_path=folder_path)
        return f"https://huggingface.co/{repo_id}"
    except Exception as e:  # offline or auth failure: report, don't crash training
        from ..logging import get_logger

        get_logger(__name__).warning(f"push_to_hub failed ({e}); artifacts remain local")
        return None
