"""Noise schedulers (training-side sigma tables + inference-side stepping).

The reference delegates to diffusers' FlowMatchEulerDiscreteScheduler and
CogVideoXDDIMScheduler (reference `utils/diffusion.py:69-117`); this module
implements both natively in JAX (diffusers is not a dependency here).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .functional.diffusion import compute_density_for_timestep_sampling, default_flow_shift


@dataclasses.dataclass
class FlowMatchEulerScheduler:
    """Flow-matching Euler scheduler (diffusers FlowMatchEulerDiscreteScheduler
    semantics: sigmas = t/N for t = N..1, optional static shift)."""

    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False

    @property
    def sigmas(self) -> jax.Array:
        ts = jnp.arange(self.num_train_timesteps, 0, -1, dtype=jnp.float32)
        sigmas = ts / self.num_train_timesteps
        if not self.use_dynamic_shifting:
            sigmas = default_flow_shift(sigmas, self.shift)
        return sigmas

    @property
    def alphas(self) -> Optional[jax.Array]:
        return None

    def training_sigmas(
        self,
        rng: jax.Array,
        batch_size: int,
        flow_weighting_scheme: str = "none",
        flow_logit_mean: float = 0.0,
        flow_logit_std: float = 1.0,
        flow_mode_scale: float = 1.29,
    ) -> jax.Array:
        """Sample per-example training sigmas (reference prepare_sigmas,
        utils/diffusion.py:87-117). Jittable."""
        u = compute_density_for_timestep_sampling(
            rng, flow_weighting_scheme, batch_size, flow_logit_mean, flow_logit_std, flow_mode_scale
        )
        indices = jnp.clip((u * self.num_train_timesteps).astype(jnp.int32), 0, self.num_train_timesteps - 1)
        return self.sigmas[indices]

    # ----------------------------------------------------------- inference
    def inference_sigmas(self, num_steps: int, shift: Optional[float] = None, mu: Optional[float] = None) -> np.ndarray:
        sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float32)
        if mu is not None:
            # dynamic (resolution-dependent) exponential shifting
            sigmas = np.exp(mu) / (np.exp(mu) + (1.0 / sigmas - 1.0))
        else:
            s = self.shift if shift is None else shift
            sigmas = s * sigmas / (1.0 + (s - 1.0) * sigmas)
        return np.concatenate([sigmas, [0.0]]).astype(np.float32)

    def step(self, model_output: jax.Array, sigma: jax.Array, sigma_next: jax.Array, sample: jax.Array) -> jax.Array:
        """Euler step: x_{t-1} = x_t + (sigma_next - sigma) * v."""
        return sample + (sigma_next - sigma) * model_output


@dataclasses.dataclass
class CogVideoXDDIMScheduler:
    """CogVideoX's DDIM scheduler training surface: scaled-linear betas with SNR
    shift and zero-terminal-SNR rescale (public CogVideoX config values)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    snr_shift_scale: float = 3.0
    rescale_betas_zero_snr: bool = True

    def __post_init__(self):
        betas = np.linspace(self.beta_start**0.5, self.beta_end**0.5, self.num_train_timesteps, dtype=np.float64) ** 2
        alphas_cumprod = np.cumprod(1.0 - betas)
        # SNR shift: alpha' = alpha / (scale - (scale-1) * alpha)
        alphas_cumprod = alphas_cumprod / (self.snr_shift_scale - (self.snr_shift_scale - 1.0) * alphas_cumprod)
        if self.rescale_betas_zero_snr:
            # Lin et al. 2023, zero-terminal-SNR: rescale sqrt(alpha_bar)
            sqrt_ac = np.sqrt(alphas_cumprod)
            sqrt_ac_0, sqrt_ac_T = sqrt_ac[0].copy(), sqrt_ac[-1].copy()
            sqrt_ac -= sqrt_ac_T
            sqrt_ac *= sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T)
            alphas_cumprod = sqrt_ac**2
        self._alphas_cumprod = jnp.asarray(alphas_cumprod, dtype=jnp.float32)

    @property
    def alphas_cumprod(self) -> jax.Array:
        return self._alphas_cumprod

    @property
    def alphas(self) -> jax.Array:
        return self._alphas_cumprod

    @property
    def sigmas(self) -> jax.Array:
        # Reference maps DDIM timesteps onto [0,1] "sigmas" = t/N where
        # scheduler.timesteps = {N-1, ..., 0} (utils/diffusion.py:77-84), so the
        # grid is {999/1000, ..., 0} and (sigma*N).long() round-trips to t.
        ts = jnp.arange(self.num_train_timesteps - 1, -1, -1, dtype=jnp.float32)
        return ts / self.num_train_timesteps

    def training_sigmas(self, rng: jax.Array, batch_size: int, **_) -> jax.Array:
        u = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        indices = jnp.clip((u * self.num_train_timesteps).astype(jnp.int32), 0, self.num_train_timesteps - 1)
        return self.sigmas[indices]

    def add_noise(self, latents: jax.Array, noise: jax.Array, timesteps: jax.Array) -> jax.Array:
        a = self._alphas_cumprod[timesteps]
        while a.ndim < latents.ndim:
            a = a[..., None]
        return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise
