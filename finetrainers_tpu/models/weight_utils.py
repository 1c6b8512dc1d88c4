"""Weight conversion between diffusers/PyTorch checkpoints and flax param trees.

The reference loads diffusers checkpoints directly; this framework stores params
as flax pytrees, so per-model converters map key names + transpose Linear kernels
(torch Linear weight is (out, in); flax Dense kernel is (in, out)).

Conventions used by every converter here:
  - flax block lists are suffixed modules: "transformer_blocks_0" <-> torch
    "transformer_blocks.0".
  - "kernel" <-> "weight" (transposed), "bias" <-> "bias",
    RMS/LayerNorm "scale" <-> "weight".
  - LoRA: flax "lora_a" (in, r) <-> peft "lora_A.weight" (r, in) transposed,
    "lora_b" (r, out) <-> "lora_B.weight" (out, r) transposed.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import numpy as np

from .modeling_utils import flatten_params, unflatten_params


def _is_linear_kernel(flax_key: str) -> bool:
    return flax_key.endswith(".kernel")


_BLOCK_LIST_NAMES = (
    "transformer_blocks", "single_transformer_blocks", "temporal_transformer_blocks",
    "blocks", "layers", "down_blocks", "up_blocks", "mid_blocks", "resnets",
)
_BLOCK_RE = re.compile(r"\b(" + "|".join(_BLOCK_LIST_NAMES) + r")_(\d+)\.")


def flax_key_to_torch(flax_key: str) -> str:
    """Generic name mapping: transformer_blocks_0.attn1.to_q.kernel ->
    transformer_blocks.0.attn1.to_q.weight. Only known block-list names get the
    `_N` -> `.N` treatment (plain module names like `linear_1` keep their
    underscore)."""
    key = _BLOCK_RE.sub(r"\1.\2.", flax_key)
    key = key.replace(".kernel", ".weight")
    key = re.sub(r"\.scale$", ".weight", key)
    return key


def torch_state_dict_to_flax(
    state_dict: Dict[str, np.ndarray],
    flax_params_abstract: Dict[str, Any],
    key_map: Optional[Callable[[str], str]] = None,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax param tree from a torch state dict.

    flax_params_abstract: pytree (or eval_shape result) giving target keys/shapes.
    key_map: flax flat key -> torch key (default: `flax_key_to_torch`).
    """
    key_map = key_map or flax_key_to_torch
    flat_target = flatten_params(flax_params_abstract)
    out: Dict[str, np.ndarray] = {}
    missing = []
    for flax_key, target in flat_target.items():
        torch_key = key_map(flax_key)
        if torch_key not in state_dict:
            if ".lora_a" in flax_key or ".lora_b" in flax_key:
                # Fresh adapters: keep the initialized values (checkpoints don't
                # carry LoRA factors; they load separately via lora_peft_to_flax).
                try:
                    out[flax_key] = np.asarray(target)
                except TypeError:  # abstract target (ShapeDtypeStruct)
                    out[flax_key] = np.zeros(target.shape, _np_dtype(target))
                continue
            if strict:
                missing.append((flax_key, torch_key))
                continue
            out[flax_key] = np.zeros(target.shape, _np_dtype(target))
            continue
        value = np.asarray(state_dict[torch_key])
        if _is_linear_kernel(flax_key) and value.ndim == 2:
            value = value.T
        if tuple(value.shape) != tuple(target.shape):
            raise ValueError(
                f"Shape mismatch for {flax_key} <- {torch_key}: {value.shape} vs {target.shape}"
            )
        out[flax_key] = value.astype(_np_dtype(target))
    if missing:
        raise KeyError(f"{len(missing)} keys missing from checkpoint, e.g. {missing[:3]}")
    return unflatten_params(out)


def flax_params_to_torch_state_dict(
    params: Dict[str, Any], key_map: Optional[Callable[[str], str]] = None,
    include_lora: bool = False,
) -> Dict[str, np.ndarray]:
    """Inverse conversion for diffusers-format export. LoRA factors are excluded
    by default (they export separately in peft convention, or get merged)."""
    key_map = key_map or flax_key_to_torch
    flat = flatten_params(params)
    out = {}
    for flax_key, value in flat.items():
        if not include_lora and (".lora_a" in flax_key or ".lora_b" in flax_key):
            continue
        value = np.asarray(value)
        if _is_linear_kernel(flax_key) and value.ndim == 2:
            value = value.T
        out[key_map(flax_key)] = value
    return out


def _peft_key_for(flax_lora_key: str, key_map: Optional[Callable[[str], str]] = None) -> str:
    """flax '<module path>.lora_a' -> peft '<torch module path>.lora_A.weight',
    routing the module path through the per-model key_map (so e.g. LTX's
    'ff_net_0_proj' becomes 'ff.net.0.proj' exactly as diffusers expects)."""
    key_map = key_map or flax_key_to_torch
    base, leaf = flax_lora_key.rsplit(".", 1)
    torch_base = key_map(f"{base}.kernel")
    assert torch_base.endswith(".weight")
    torch_base = torch_base[: -len(".weight")]
    suffix = "lora_A.weight" if leaf == "lora_a" else "lora_B.weight"
    return f"{torch_base}.{suffix}"


def lora_flax_to_peft(
    lora_state: Dict[str, np.ndarray],
    prefix: str = "transformer",
    key_map: Optional[Callable[[str], str]] = None,
) -> Dict[str, np.ndarray]:
    """Our flat LoRA state -> peft/diffusers-convention keys
    (`transformer.transformer_blocks.0.attn1.to_q.lora_A.weight`), transposed to
    torch layout (reference export: trainer/sft_trainer/trainer.py:284-298)."""
    out = {}
    for key, value in lora_state.items():
        out[f"{prefix}.{_peft_key_for(key, key_map)}"] = np.ascontiguousarray(np.asarray(value).T)
    return out


def lora_peft_to_flax(
    state_dict: Dict[str, np.ndarray],
    prefix: str = "transformer",
    key_map: Optional[Callable[[str], str]] = None,
    abstract_lora_keys: Optional[list] = None,
) -> Dict[str, np.ndarray]:
    """Inverse of `lora_flax_to_peft`. Because key_maps are one-way string
    rewrites, the mapping is built forward: when `abstract_lora_keys` (the flax
    LoRA key list of the target tree) is given, each is mapped peft-ward and
    matched; otherwise a generic reverse rewrite is used."""
    out = {}
    if abstract_lora_keys:
        reverse = {f"{prefix}.{_peft_key_for(k, key_map)}": k for k in abstract_lora_keys}
        for key, value in state_dict.items():
            flax_key = reverse.get(key)
            if flax_key is not None:
                out[flax_key] = np.asarray(value).T
        return out
    for key, value in state_dict.items():
        k = key
        if k.startswith(prefix + "."):
            k = k[len(prefix) + 1 :]
        k = k.replace(".lora_A.weight", ".lora_a").replace(".lora_B.weight", ".lora_b")
        # re-suffix block indices: transformer_blocks.0. -> transformer_blocks_0.
        k = re.sub(r"\.(\d+)\.", lambda m: f"_{m.group(1)}.", k)
        out[k] = np.asarray(value).T
    return out


# ----------------------------------------------------------- scan (stacked) layout

_SCAN_SUFFIX = "_scan"


def scan_stacks_of(module) -> list:
    """[(list_name, length, group)] for a transformer module with scan resolved
    on; [] otherwise. Modules advertise stacks via a `scan_stacks()` method."""
    fn = getattr(module, "scan_stacks", None)
    return list(fn()) if fn is not None else []


def stack_params_for_scan(params: Dict[str, Any], scan_stacks) -> Dict[str, Any]:
    """Per-block subtrees '<list>_<i>.*' -> '<list>_scan.block[_j].*' with a
    leading layer axis (the layout nn.scan produces). Trailing remainder blocks
    (length % group != 0) keep their per-block keys."""
    flat = flatten_params(params)
    out: Dict[str, Any] = {}
    buckets: Dict[str, list] = {}
    specs = {name: (length, group) for name, length, group in scan_stacks}
    patterns = {
        name: re.compile(rf"^{re.escape(name)}_(\d+)\.(.+)$") for name in specs
    }
    for key, value in flat.items():
        if value is None:  # split-tree placeholder: drop
            continue
        placed = False
        for name, (length, group) in specs.items():
            m = patterns[name].match(key)
            if m:
                i, rest = int(m.group(1)), m.group(2)
                n_scan = length // group
                if i < n_scan * group:
                    it, j = divmod(i, group)
                    blk = "block" if group == 1 else f"block_{j}"
                    stacked_key = f"{name}{_SCAN_SUFFIX}.{blk}.{rest}"
                    buckets.setdefault(stacked_key, [None] * n_scan)[it] = value
                    placed = True
                break
        if not placed:
            out[key] = value
    for stacked_key, arrs in buckets.items():
        assert all(a is not None for a in arrs), f"missing layers for {stacked_key}"
        out[stacked_key] = np.stack([np.asarray(a) for a in arrs], axis=0)
    return unflatten_params(out)


def unstack_params_from_scan(params: Dict[str, Any], scan_stacks) -> Dict[str, Any]:
    """Inverse of `stack_params_for_scan` (for per-block exports / converters)."""
    flat = flatten_params(params)
    out: Dict[str, Any] = {}
    specs = {name: (length, group) for name, length, group in scan_stacks}
    patterns = {
        name: re.compile(rf"^{re.escape(name)}{_SCAN_SUFFIX}\.block(?:_(\d+))?\.(.+)$")
        for name in specs
    }
    for key, value in flat.items():
        if value is None:  # split-tree placeholder (frozen/trainable slot): drop
            continue
        placed = False
        for name, (length, group) in specs.items():
            m = patterns[name].match(key)
            if m:
                j = int(m.group(1) or 0)
                rest = m.group(2)
                if not hasattr(value, "__getitem__"):
                    value = np.asarray(value)
                for it in range(value.shape[0]):
                    out[f"{name}_{it * group + j}.{rest}"] = value[it]
                placed = True
                break
        if not placed:
            out[key] = value
    return unflatten_params(out)


def maybe_unstack_params(params: Dict[str, Any], module) -> Dict[str, Any]:
    stacks = scan_stacks_of(module)
    return unstack_params_from_scan(params, stacks) if stacks else params


def load_pretrained_into_params(
    state_dict: Dict[str, np.ndarray],
    params: Dict[str, Any],
    converter: Callable[[Dict[str, np.ndarray], Dict[str, Any]], Dict[str, Any]],
    module=None,
) -> Dict[str, Any]:
    """Convert a torch state dict into a (possibly scan-stacked) param tree.

    Converters speak the per-block layout; for scanned modules the target is
    unstacked to ShapeDtypeStructs first, converted, then re-stacked. LoRA
    leaves always keep the values already in `params` (fresh adapter init —
    checkpoints don't carry LoRA factors)."""
    import jax

    stacks = scan_stacks_of(module) if module is not None else []
    if not stacks:
        return converter(state_dict, params)
    # Build the per-block abstract target from the stacked concrete tree
    # (shape/dtype carriers that survive the unstack slicing).
    flat_abs = flatten_params(params)
    per_block = unstack_params_from_scan(
        unflatten_params({k: _AbsSlice(v) for k, v in flat_abs.items()}), stacks
    )
    converted = converter(state_dict, per_block)
    stacked = stack_params_for_scan(converted, stacks)
    flat_new = flatten_params(stacked)
    flat_old = flatten_params(params)
    merged = {}
    for key, old in flat_old.items():
        if ".lora_a" in key or ".lora_b" in key:
            merged[key] = old
        else:
            merged[key] = np.asarray(flat_new[key]).astype(_np_dtype(old))
    return unflatten_params(merged)


class _AbsSlice:
    """Shape/dtype carrier that supports leading-axis slicing + np.stack round
    trips, so unstack/stack work on abstract trees."""

    def __init__(self, ref):
        self.shape = tuple(ref.shape)
        self.dtype = ref.dtype

    def __getitem__(self, idx):
        assert isinstance(idx, int)
        out = object.__new__(_AbsSlice)
        out.shape = self.shape[1:]
        out.dtype = self.dtype
        return out


def load_diffusers_checkpoint_dir(path: str) -> Dict[str, np.ndarray]:
    """Read a diffusers-format model directory: config.json + one or more
    safetensors shards (diffusion_pytorch_model*.safetensors), returning the merged
    state dict (the torch-side input to the per-model converters)."""
    import json
    import pathlib

    from ..utils.serialization import safetensors_load_dict

    root = pathlib.Path(path)
    index = root / "diffusion_pytorch_model.safetensors.index.json"
    state: Dict[str, np.ndarray] = {}
    if index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
        for shard in shards:
            state.update(safetensors_load_dict(str(root / shard)))
    else:
        shards = sorted(root.glob("diffusion_pytorch_model*.safetensors")) or sorted(
            root.glob("*.safetensors")
        )
        if not shards:
            raise FileNotFoundError(f"No safetensors shards found under {path}")
        for shard in shards:
            state.update(safetensors_load_dict(str(shard)))
    return state


def load_diffusers_config(path: str) -> Dict[str, Any]:
    import json
    import pathlib

    return json.loads((pathlib.Path(path) / "config.json").read_text())


def _np_dtype(target) -> np.dtype:
    dtype = getattr(target, "dtype", np.float32)
    try:
        return np.dtype(dtype)
    except TypeError:
        import jax.numpy as jnp

        return np.dtype(jnp.dtype(dtype))
