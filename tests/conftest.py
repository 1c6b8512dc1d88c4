"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4 implication —
multi-device tests run in-process instead of the reference's torchrun launches).

Must run before jax initializes its backend. The axon sitecustomize pins
JAX_PLATFORMS=axon, so we override via jax.config as well. Pallas kernels run in
interpreter mode on CPU (see ops/flash_attention._interpret)."""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
# No network in CI: skip huggingface_hub's 5x retry loop (60s per miss).
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
