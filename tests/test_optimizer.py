"""Optimizer / LR schedule tests (reference optimizer.py:92-437 surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from finetrainers_tpu.optimizer import get_lr_scheduler, get_optimizer


class TestSchedules:
    def test_constant(self):
        sched = get_lr_scheduler("constant", lr=1e-3)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(10000)) == pytest.approx(1e-3)

    def test_constant_with_warmup(self):
        sched = get_lr_scheduler("constant_with_warmup", lr=1e-3, warmup_steps=100)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(50)) == pytest.approx(5e-4)
        assert float(sched(200)) == pytest.approx(1e-3)

    def test_linear_decay(self):
        sched = get_lr_scheduler("linear", lr=1e-3, warmup_steps=10, train_steps=110)
        assert float(sched(10)) == pytest.approx(1e-3)
        assert float(sched(110)) == pytest.approx(0.0, abs=1e-8)

    def test_cosine(self):
        # num_cycles=0.5 = classic half-cosine decay to zero (diffusers semantics)
        sched = get_lr_scheduler("cosine", lr=1e-3, warmup_steps=0, train_steps=100, num_cycles=0.5)
        assert float(sched(0)) == pytest.approx(1e-3, rel=1e-3)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)

    def test_polynomial(self):
        sched = get_lr_scheduler("polynomial", lr=1e-3, warmup_steps=0, train_steps=100, power=2.0)
        assert float(sched(0)) == pytest.approx(1e-3, rel=1e-3)
        assert float(sched(100)) == pytest.approx(1e-7, rel=1e-2)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_lr_scheduler("nonexistent", lr=1.0)


class TestOptimizer:
    @pytest.mark.parametrize("name", ["adam", "adamw"])
    def test_step_reduces_loss(self, name):
        opt = get_optimizer(name, learning_rate=0.1, max_grad_norm=1.0)
        params = {"w": jnp.asarray([2.0, -3.0])}
        state = opt.init(params)

        def loss_fn(p):
            return jnp.sum(p["w"] ** 2)

        import jax

        for _ in range(50):
            grads = jax.grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss_fn(params)) < 0.5

    def test_grad_clipping_present(self):
        opt = get_optimizer("adamw", learning_rate=1.0, max_grad_norm=0.5)
        params = {"w": jnp.asarray([0.0])}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.asarray([100.0])}, state, params)
        # clipped global norm -> adam normalizes anyway; just check finite
        assert np.isfinite(float(updates["w"][0]))

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_optimizer("sgd-fancy", learning_rate=0.1)


class TestAdam8bit:
    """bnb-8bit parity (reference optimizer.py:92-188): int8 moment storage must
    track fp32 adam closely and actually store int8."""

    def _trajectory(self, opt, steps=30):
        import jax

        params = {"w": jnp.linspace(-2.0, 2.0, 8192).reshape(2, 4096)}

        def loss_fn(p):
            return jnp.sum((p["w"] - 1.0) ** 2)

        state = opt.init(params)
        for _ in range(steps):
            grads = jax.grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        return params, state

    def test_states_are_int8(self):
        from finetrainers_tpu.optim8bit import ScaleByAdam8bitState, _Quantized

        opt = get_optimizer("adamw-bnb-8bit", learning_rate=1e-2)
        params = {"w": jnp.zeros((2, 4096)), "small": jnp.zeros((8,))}
        state = opt.init(params)
        inner = next(s for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: isinstance(x, ScaleByAdam8bitState))
            if isinstance(s, ScaleByAdam8bitState))
        assert isinstance(inner.mu["w"], _Quantized)
        assert inner.mu["w"].codes.dtype == jnp.int8
        assert inner.mu["w"].codes.shape == (2, 4096)
        assert inner.mu["w"].scales.shape == (2, 1)
        # small tensors stay fp32 (bnb min_8bit_size parity)
        assert not isinstance(inner.mu["small"], _Quantized)
        assert inner.nu["small"].dtype == jnp.float32

    def test_tracks_fp32_adamw(self):
        p8, _ = self._trajectory(get_optimizer("adamw-bnb-8bit", learning_rate=1e-2))
        p32, _ = self._trajectory(get_optimizer("adamw", learning_rate=1e-2))
        # Quantization noise stays small relative to the parameter scale.
        err = float(jnp.max(jnp.abs(p8["w"] - p32["w"])))
        assert err < 5e-2, err

    def test_loss_decreases(self):
        import jax

        opt = get_optimizer("adam-bnb-8bit", learning_rate=5e-2)
        params = {"w": jnp.linspace(-2.0, 2.0, 8192).reshape(2, 4096)}

        def loss_fn(p):
            return jnp.mean((p["w"] - 0.5) ** 2)

        before = float(loss_fn(params))
        state = opt.init(params)
        for _ in range(40):
            grads = jax.grad(loss_fn)(params)
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss_fn(params)) < before * 0.2
