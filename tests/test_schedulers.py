"""Scheduler unit tests (reference delegates these semantics to diffusers'
FlowMatchEulerDiscreteScheduler / CogVideoXDDIMScheduler; here they are native
JAX and must satisfy the same invariants)."""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from finetrainers_tpu.schedulers import CogVideoXDDIMScheduler, FlowMatchEulerScheduler


class TestFlowMatchEuler:
    def test_sigma_table_range_and_order(self):
        s = np.asarray(FlowMatchEulerScheduler().sigmas)
        assert s[0] == 1.0 and s[-1] > 0.0
        assert np.all(np.diff(s) < 0)  # strictly decreasing t=N..1

    def test_static_shift_raises_sigmas(self):
        plain = np.asarray(FlowMatchEulerScheduler(shift=1.0).sigmas)
        shifted = np.asarray(FlowMatchEulerScheduler(shift=3.0).sigmas)
        # shift > 1 pushes mass toward sigma=1 (more noise), except endpoints
        assert np.all(shifted[1:-1] > plain[1:-1])

    def test_training_sigmas_shape_and_bounds(self):
        sig = FlowMatchEulerScheduler().training_sigmas(jax.random.PRNGKey(0), 64)
        assert sig.shape == (64,)
        assert float(sig.min()) > 0.0 and float(sig.max()) <= 1.0

    def test_training_sigmas_jittable(self):
        sched = FlowMatchEulerScheduler()
        out = jax.jit(lambda r: sched.training_sigmas(r, 4, flow_weighting_scheme="logit_normal"))(
            jax.random.PRNGKey(1)
        )
        assert out.shape == (4,)

    def test_inference_sigmas_terminate_at_zero(self):
        s = FlowMatchEulerScheduler(shift=3.0).inference_sigmas(10)
        assert len(s) == 11
        assert s[0] <= 1.0 and s[-1] == 0.0
        assert np.all(np.diff(s) < 0)

    def test_euler_step_integrates_exactly_for_constant_velocity(self):
        # dx/dsigma = v constant: integrating from 1 to 0 recovers x0 = x1 - v.
        sched = FlowMatchEulerScheduler()
        sigmas = sched.inference_sigmas(7, shift=1.0)
        x = jnp.ones((2, 3))
        v = jnp.full((2, 3), 2.0)
        for i in range(len(sigmas) - 1):
            x = sched.step(v, float(sigmas[i]), float(sigmas[i + 1]), x)
        np.testing.assert_allclose(np.asarray(x), 1.0 - 2.0 * sigmas[0], rtol=1e-5)


class TestCogVideoXDDIM:
    def test_zero_terminal_snr(self):
        a = np.asarray(CogVideoXDDIMScheduler().alphas_cumprod)
        assert a[-1] == 0.0  # zero terminal SNR rescale
        assert 0.99 < a[0] <= 1.0
        assert np.all(np.diff(a) <= 0)

    def test_snr_shift_lowers_alphas(self):
        shifted = np.asarray(CogVideoXDDIMScheduler(snr_shift_scale=3.0, rescale_betas_zero_snr=False).alphas_cumprod)
        plain = np.asarray(CogVideoXDDIMScheduler(snr_shift_scale=1.0, rescale_betas_zero_snr=False).alphas_cumprod)
        assert np.all(shifted < plain)

    def test_add_noise_interpolates(self):
        sched = CogVideoXDDIMScheduler()
        latents = jnp.ones((2, 4))
        noise = jnp.zeros((2, 4))
        early = np.asarray(sched.add_noise(latents, noise, jnp.asarray([10, 10])))
        late = np.asarray(sched.add_noise(latents, noise, jnp.asarray([990, 990])))
        assert early.mean() > late.mean()  # more noise (zeros) later
