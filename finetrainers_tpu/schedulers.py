"""Noise schedulers (training-side sigma tables + inference-side stepping).

The reference delegates to diffusers' FlowMatchEulerDiscreteScheduler and
CogVideoXDDIMScheduler (reference `utils/diffusion.py:69-117`); this module
implements both natively in JAX (diffusers is not a dependency here).

Beyond Euler, this module carries checkpoint-faithful multistep samplers:
UniPC (predictor-corrector, Zhao et al. 2023 — the scheduler Wan 2.1
checkpoints ship in their `model_index.json`) and DPM-Solver++(2M), both in
their flow-matching form (alpha_t = 1 - sigma_t, x0 = x - sigma * v). The
reference gets these for free by loading the diffusers pipeline's scheduler
at validation time (`/root/reference/finetrainers/models/wan/
base_specification.py:338-352`); here `load_scheduler` reads the checkpoint's
`scheduler/scheduler_config.json` and maps `_class_name` onto the native
implementations, defaulting to the family's Euler config.

Design: all per-step solver coefficients are pure host-side float64 numpy
(`_uni_p_coeffs` / `_uni_c_coeffs` / `_dpm_coeffs` — unit-tested against
hand-derived values), and the device work is a single fused linear
combination of the sample and the x0-prediction history. Samplers are
host-side stateful objects created per denoise run via
`scheduler.make_sampler(sigmas)`; pipelines call `sampler.update(pred, i,
sample)` with the jitted model output.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
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

    def make_sampler(self, sigmas: np.ndarray) -> "_EulerSampler":
        """Host-side sampler for one denoise run over the given sigma grid
        (len = num_steps + 1, trailing 0.0). `update(pred, i, sample)` advances
        sample from sigmas[i] to sigmas[i+1]."""
        return _EulerSampler(np.asarray(sigmas, np.float64))


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


# ============================================================ multistep samplers
#
# All solver math below is in lambda = log(alpha/sigma) space with the flow
# parameterization alpha = 1 - sigma; the model's velocity output converts to a
# data prediction as x0 = x - sigma * v. Per-step coefficients are host-side
# float64; the device update is one fused linear combination.


@functools.lru_cache(maxsize=64)
def _combine_jit(n_terms: int):
    """jit(coeffs, *arrays) -> sum_k coeffs[k] * arrays[k], one per arity."""

    def combine(coeffs, *arrays):
        out = coeffs[0].astype(arrays[0].dtype) * arrays[0]
        for c, a in zip(coeffs[1:], arrays[1:]):
            out = out + c.astype(a.dtype) * a
        return out

    return jax.jit(combine)


def _combine(coeffs, *arrays):
    return _combine_jit(len(arrays))(jnp.asarray(np.asarray(coeffs, np.float32)), *arrays)


def _flow_lambda(sigma: np.ndarray) -> np.ndarray:
    """lambda_t = log(alpha_t) - log(sigma_t) with alpha = 1 - sigma (flow).
    -inf at sigma=1 and +inf at sigma=0 are meaningful limits the order-1
    formulas pass through exactly (expm1(-inf) = -1)."""
    sigma = np.asarray(sigma, np.float64)
    with np.errstate(divide="ignore"):
        return np.log1p(-sigma) - np.log(sigma)


def _unipc_Rb(order: int, rks: np.ndarray, hh: float, solver_type: str):
    """The UniPC B(h) linear system (UniPC paper eq. 16-17 construction):
    R[i-1] = rks**(i-1), b[i-1] = i! * phi_{i+1}(hh) / B(h) — built by the
    published recurrence h_phi_{k+1} = h_phi_k / hh - 1/(k+1)!.

    The division by B_h is essential: the solved rhos are later multiplied
    back by B_h in the update, so omitting it scales every SOLVED correction
    term by an extra B_h ~ -h — an order-reducing bug this repo shipped until
    round 5, invisible to the order-1/2 special cases (rhos=[0.5], which
    bypass the solve) and caught by a convergence-slope test
    (tests/test_schedulers.py::TestUniPCOrder3)."""
    R, b = [], []
    h_phi_1 = np.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1.0
    fact = 1.0
    B_h = hh if solver_type == "bh1" else np.expm1(hh)
    for i in range(1, order + 1):
        R.append(rks ** (i - 1))
        b.append(h_phi_k * fact / B_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    return np.stack(R), np.asarray(b), h_phi_1, B_h


def _uni_p_coeffs(sigmas: np.ndarray, i: int, order: int, solver_type: str = "bh2") -> np.ndarray:
    """Predictor (UniP) coefficients stepping sigmas[i] -> sigmas[i+1] given the
    x0-prediction history [m0 (at i), m1 (at i-1), ..., m_{order-1}].

    Returns coeffs c with prev = c[0]*sample + c[1]*m0 + ... + c[order]*m_{order-1}.
    """
    sigmas = np.asarray(sigmas, np.float64)
    sigma_t, sigma_s0 = sigmas[i + 1], sigmas[i]
    if sigma_t == 0.0:
        # Final step: h -> inf limit of the order-1 update is exactly m0.
        return np.concatenate([[0.0, 1.0], np.zeros(order - 1)])
    alpha_t = 1.0 - sigma_t
    lam_t, lam_s0 = _flow_lambda(sigma_t), _flow_lambda(sigma_s0)
    h = lam_t - lam_s0
    hh = -h  # predict_x0 convention
    # History points at the lambda = +-inf grid ends (sigma exactly 1 or 0 —
    # e.g. the first point of inference_sigmas) carry no usable multistep
    # information: cap the effective order to the finite-lambda suffix instead
    # of letting inf - inf = nan propagate through the solve (first reachable
    # at order 3, the orders that bypass the rho solve stay finite by luck).
    req_order = order
    while order > 1 and not np.isfinite(_flow_lambda(sigmas[i - (order - 1)])):
        order -= 1
    rks = np.asarray([(_flow_lambda(sigmas[i - k]) - lam_s0) / h for k in range(1, order)], np.float64)
    R, b, h_phi_1, B_h = _unipc_Rb(order, np.concatenate([rks, [1.0]]), hh, solver_type)
    if order == 1:
        rhos_p = np.zeros(0)
    elif order == 2:
        rhos_p = np.asarray([0.5])
    else:
        rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
    coeffs = np.zeros(req_order + 1, np.float64)
    coeffs[0] = sigma_t / sigma_s0
    coeffs[1] = -alpha_t * h_phi_1
    for k in range(1, order):  # residual terms on D1s_k = (m_k - m0) / rks_k
        w = -alpha_t * B_h * rhos_p[k - 1] / rks[k - 1]
        coeffs[k + 1] += w
        coeffs[1] -= w
    return coeffs


def _uni_c_coeffs(sigmas: np.ndarray, i: int, order: int, solver_type: str = "bh2") -> np.ndarray:
    """Corrector (UniC) coefficients refining the step sigmas[i-1] -> sigmas[i],
    given history [m0 (at i-1), ..., m_{order-1}] and the fresh prediction x0_t
    at sigmas[i] (evaluated on the predictor's output).

    Returns c with corrected = c[0]*last_sample + c[1]*m0 + ... + c[order]*m_{order-1}
    + c[order+1]*x0_t.
    """
    sigmas = np.asarray(sigmas, np.float64)
    sigma_t, sigma_s0 = sigmas[i], sigmas[i - 1]
    alpha_t = 1.0 - sigma_t
    lam_t, lam_s0 = _flow_lambda(sigma_t), _flow_lambda(sigma_s0)
    h = lam_t - lam_s0
    hh = -h
    # Same finite-lambda order cap as _uni_p_coeffs (sigma = 1/0 history).
    req_order = order
    while order > 1 and not np.isfinite(_flow_lambda(sigmas[i - 1 - (order - 1)])):
        order -= 1
    rks = np.asarray([(_flow_lambda(sigmas[i - 1 - k]) - lam_s0) / h for k in range(1, order)], np.float64)
    R, b, h_phi_1, B_h = _unipc_Rb(order, np.concatenate([rks, [1.0]]), hh, solver_type)
    if order == 1:
        rhos_c = np.asarray([0.5])
    else:
        rhos_c = np.linalg.solve(R, b)
    coeffs = np.zeros(req_order + 2, np.float64)
    coeffs[0] = sigma_t / sigma_s0
    coeffs[1] = -alpha_t * h_phi_1
    for k in range(1, order):
        w = -alpha_t * B_h * rhos_c[k - 1] / rks[k - 1]
        coeffs[k + 1] += w
        coeffs[1] -= w
    w_t = -alpha_t * B_h * rhos_c[-1]  # on D1_t = x0_t - m0
    coeffs[req_order + 1] = w_t  # x0_t slot stays LAST in the caller's layout
    coeffs[1] -= w_t
    return coeffs


def _dpm_coeffs(sigmas: np.ndarray, i: int, order: int) -> np.ndarray:
    """DPM-Solver++(2M) coefficients (Lu et al. 2022, data-prediction multistep)
    stepping sigmas[i] -> sigmas[i+1] with history [m0 (at i), m1 (at i-1)].

    Returns c with prev = c[0]*sample + c[1]*m0 + c[2]*m1 (c[2]=0 for order 1).
    """
    sigmas = np.asarray(sigmas, np.float64)
    sigma_t, sigma_s0 = sigmas[i + 1], sigmas[i]
    if sigma_t == 0.0:
        return np.asarray([0.0, 1.0, 0.0])
    alpha_t = 1.0 - sigma_t
    lam_t, lam_s0 = _flow_lambda(sigma_t), _flow_lambda(sigma_s0)
    h = lam_t - lam_s0
    base = -alpha_t * np.expm1(-h)  # -alpha_t * (e^{-h} - 1) > 0
    coeffs = np.asarray([sigma_t / sigma_s0, base, 0.0])
    if order >= 2:
        h_last = lam_s0 - _flow_lambda(sigmas[i - 1])
        r0 = h_last / h
        coeffs[1] = base * (1.0 + 1.0 / (2.0 * r0))
        coeffs[2] = base * (-1.0 / (2.0 * r0))
    return coeffs


class _EulerSampler:
    """sampler protocol: update(pred, i, sample) -> sample at sigmas[i+1]."""

    def __init__(self, sigmas: np.ndarray):
        self.sigmas = sigmas

    def update(self, pred: jax.Array, i: int, sample: jax.Array) -> jax.Array:
        dt = self.sigmas[i + 1] - self.sigmas[i]
        return _combine([1.0, dt], sample, pred)


class UniPCSampler:
    """Stateful UniPC predictor-corrector run over one sigma grid.

    Step i: (1) convert pred at sigmas[i] to x0; (2) correct the previous
    predictor output using this fresh evaluation (UniC); (3) predict the sample
    at sigmas[i+1] from the corrected sample + x0 history (UniP). History holds
    the pre-correction conversions; predictor order ramps up over the first
    steps and (lower_order_final) back down at the tail so the final step is
    the exact order-1 limit.
    """

    def __init__(self, sigmas, solver_order=2, solver_type="bh2",
                 lower_order_final=True, use_corrector=True):
        self.sigmas = np.asarray(sigmas, np.float64)
        self.solver_order = int(solver_order)
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final
        self.use_corrector = use_corrector
        self.history: list = []  # x0 preds, most recent LAST
        self.last_sample = None
        self.this_order = 1  # order the next corrector call uses

    def update(self, pred: jax.Array, i: int, sample: jax.Array) -> jax.Array:
        sigma_i = float(self.sigmas[i])
        x0 = _combine([1.0, -sigma_i], sample, pred)
        if i > 0 and self.use_corrector and self.last_sample is not None:
            order = min(self.this_order, len(self.history))
            coeffs = _uni_c_coeffs(self.sigmas, i, order, self.solver_type)
            ms = self.history[::-1][:order]  # m0 most recent first
            sample = _combine(coeffs, self.last_sample, *ms, x0)
        self.history.append(x0)
        if len(self.history) > self.solver_order:
            self.history.pop(0)
        num_steps = len(self.sigmas) - 1
        order = min(self.solver_order, len(self.history))
        if self.lower_order_final:
            order = min(order, num_steps - i)
        self.this_order = order
        self.last_sample = sample
        coeffs = _uni_p_coeffs(self.sigmas, i, order, self.solver_type)
        ms = self.history[::-1][:order]
        return _combine(coeffs, sample, *ms)


class DPMSolverSampler:
    """DPM-Solver++(2M): second-order multistep on the x0 history (no corrector)."""

    def __init__(self, sigmas, solver_order=2, lower_order_final=True):
        self.sigmas = np.asarray(sigmas, np.float64)
        self.solver_order = min(int(solver_order), 2)
        self.lower_order_final = lower_order_final
        self.history: list = []

    def update(self, pred: jax.Array, i: int, sample: jax.Array) -> jax.Array:
        sigma_i = float(self.sigmas[i])
        x0 = _combine([1.0, -sigma_i], sample, pred)
        self.history.append(x0)
        if len(self.history) > 2:
            self.history.pop(0)
        num_steps = len(self.sigmas) - 1
        order = min(self.solver_order, len(self.history))
        if self.lower_order_final:
            order = min(order, num_steps - i)
        coeffs = _dpm_coeffs(self.sigmas, i, order)
        ms = (self.history[::-1] + [self.history[-1]])[:2]  # m1 dup unused when order 1
        return _combine(coeffs, sample, *ms)


@dataclasses.dataclass
class UniPCFlowScheduler(FlowMatchEulerScheduler):
    """Flow-matching UniPC multistep scheduler (the scheduler class Wan 2.1
    checkpoints ship; diffusers `UniPCMultistepScheduler` with
    prediction_type='flow_prediction'). Training surface is identical to
    flow-match Euler; inference uses the predictor-corrector sampler."""

    solver_order: int = 2
    solver_type: str = "bh2"
    lower_order_final: bool = True
    use_corrector: bool = True

    def make_sampler(self, sigmas: np.ndarray) -> UniPCSampler:
        return UniPCSampler(sigmas, self.solver_order, self.solver_type,
                            self.lower_order_final, self.use_corrector)


@dataclasses.dataclass
class DPMSolverFlowScheduler(FlowMatchEulerScheduler):
    """Flow-matching DPM-Solver++(2M) (diffusers `DPMSolverMultistepScheduler`,
    algorithm_type='dpmsolver++', flow prediction)."""

    solver_order: int = 2
    lower_order_final: bool = True

    def make_sampler(self, sigmas: np.ndarray) -> DPMSolverSampler:
        return DPMSolverSampler(sigmas, self.solver_order, self.lower_order_final)


def load_scheduler(pretrained_model_name_or_path: Optional[str], default):
    """Checkpoint-faithful scheduler selection: read the diffusers-layout
    `scheduler/scheduler_config.json` under the model directory and map its
    `_class_name` onto the native scheduler, keeping the family default's shift
    when the config does not carry one. Falls back to `default` when the path
    is remote/absent or the class is unknown (mirrors the reference picking up
    the checkpoint's own scheduler via `DiffusionPipeline.from_pretrained`,
    `/root/reference/finetrainers/models/wan/base_specification.py:338-352`)."""
    if not pretrained_model_name_or_path:
        return default
    cfg_path = os.path.join(str(pretrained_model_name_or_path), "scheduler", "scheduler_config.json")
    if not os.path.isfile(cfg_path):
        return default
    with open(cfg_path) as f:
        cfg = json.load(f)
    name = cfg.get("_class_name", "")
    num_train = int(cfg.get("num_train_timesteps", 1000))
    shift = float(cfg.get("shift", cfg.get("flow_shift", getattr(default, "shift", 1.0))))
    dyn = bool(cfg.get("use_dynamic_shifting", getattr(default, "use_dynamic_shifting", False)))
    if name in ("UniPCMultistepScheduler", "FlowUniPCMultistepScheduler"):
        return UniPCFlowScheduler(
            num_train_timesteps=num_train, shift=shift, use_dynamic_shifting=dyn,
            solver_order=int(cfg.get("solver_order", 2)),
            solver_type=str(cfg.get("solver_type", "bh2")),
            lower_order_final=bool(cfg.get("lower_order_final", True)),
            use_corrector=len(cfg.get("disable_corrector", [])) == 0,
        )
    if name in ("DPMSolverMultistepScheduler", "FlowDPMSolverMultistepScheduler"):
        return DPMSolverFlowScheduler(
            num_train_timesteps=num_train, shift=shift, use_dynamic_shifting=dyn,
            solver_order=int(cfg.get("solver_order", 2)),
            lower_order_final=bool(cfg.get("lower_order_final", True)),
        )
    if name == "FlowMatchEulerDiscreteScheduler":
        return FlowMatchEulerScheduler(num_train_timesteps=num_train, shift=shift, use_dynamic_shifting=dyn)
    if name in ("CogVideoXDDIMScheduler", "DDIMScheduler"):
        if not isinstance(default, CogVideoXDDIMScheduler):
            # A DDIM scheduler config under a flow-matching family: the DDIM
            # class has no inference_sigmas/make_sampler surface, so honoring
            # the config would crash at validation — keep the family default
            # instead (ADVICE r4).
            return default
        return CogVideoXDDIMScheduler(
            num_train_timesteps=num_train,
            beta_start=float(cfg.get("beta_start", 0.00085)),
            beta_end=float(cfg.get("beta_end", 0.012)),
            snr_shift_scale=float(cfg.get("snr_shift_scale", 3.0)),
            rescale_betas_zero_snr=bool(cfg.get("rescale_betas_zero_snr", True)),
        )
    return default
