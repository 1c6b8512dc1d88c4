"""Flow-matching and diffusion math, as pure jittable JAX functions.

Capability parity with reference `finetrainers/functional/diffusion.py:4-11` and
`finetrainers/utils/diffusion.py:11-151` — reimplemented TPU-first: everything here is
shape-static, dtype-explicit and traceable under `jax.jit`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def flow_match_xt(x0: jax.Array, n: jax.Array, t: jax.Array) -> jax.Array:
    """Forward process of flow matching: interpolate data toward noise.

    ``t`` broadcasts against ``x0`` (callers pass per-sample sigmas expanded to
    the data rank).
    """
    return (1.0 - t) * x0 + t * n


def flow_match_target(n: jax.Array, x0: jax.Array) -> jax.Array:
    """Velocity target for flow matching."""
    return n - x0


def default_flow_shift(sigmas: jax.Array, shift: float = 1.0) -> jax.Array:
    """Timestep shift: sigma' = s*sigma / (1 + (s-1)*sigma)."""
    return (sigmas * shift) / (1.0 + (shift - 1.0) * sigmas)


def resolution_dependent_timestep_flow_shift(
    latents: jax.Array,
    sigmas: jax.Array,
    base_image_seq_len: int = 256,
    max_image_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> jax.Array:
    """Shift sigmas as a linear function of the latent sequence length.

    Mirrors the reference behavior (utils/diffusion.py:11-31): 4D latents use h*w,
    5D latents use f*h*w as the sequence length proxy. Note the exponential mu->shift
    convention of FLUX is NOT applied here, matching the reference's linear form.
    """
    if latents.ndim == 4:
        seq_len = latents.shape[2] * latents.shape[3]
    elif latents.ndim == 5:
        seq_len = latents.shape[2] * latents.shape[3] * latents.shape[4]
    else:
        raise ValueError(f"Expected 4D or 5D latents, got {latents.ndim}D")

    m = (max_shift - base_shift) / (max_image_seq_len - base_image_seq_len)
    b = base_shift - m * base_image_seq_len
    mu = m * seq_len + b
    return default_flow_shift(sigmas, shift=mu)


def compute_density_for_timestep_sampling(
    rng: jax.Array,
    weighting_scheme: str,
    batch_size: int,
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
) -> jax.Array:
    """Sample u in [0,1) controlling which timesteps get trained (SD3 §3.1 schemes).

    Reference behavior: utils/diffusion.py:39-65.
    """
    if weighting_scheme == "logit_normal":
        u = logit_mean + logit_std * jax.random.normal(rng, (batch_size,), dtype=jnp.float32)
        u = jax.nn.sigmoid(u)
    elif weighting_scheme == "mode":
        u = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        u = 1.0 - u - mode_scale * (jnp.cos(math.pi * u / 2.0) ** 2 - 1.0 + u)
    else:
        u = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
    return u


def compute_loss_weighting(
    weighting_scheme: str,
    sigmas: Optional[jax.Array] = None,
    alphas: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-sample loss weights.

    Flow-matching schemes follow SD3 (`sigma_sqrt`, `cosmap`, else ones); the DDIM
    path (CogVideoX) uses 1/(1-alpha) (reference utils/diffusion.py:120-135).
    """
    if alphas is not None:
        return 1.0 / (1.0 - alphas)
    if weighting_scheme == "sigma_sqrt":
        return (sigmas**-2.0).astype(jnp.float32)
    if weighting_scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas**2
        return 2.0 / (math.pi * bot)
    return jnp.ones_like(sigmas)
