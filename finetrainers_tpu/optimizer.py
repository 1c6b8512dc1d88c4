"""Optimizers and LR schedules, built on optax.

Parity with reference `finetrainers/optimizer.py:92-437`: adam/adamw, the
bitsandbytes 8-bit variants (int8-quantized moment storage, `optim8bit.py`), and
the full scheduler set: constant, constant_with_warmup, piecewise_constant, linear,
cosine, cosine_with_restarts, polynomial.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import optax


SUPPORTED_OPTIMIZERS = ["adam", "adamw", "adam-bnb-8bit", "adamw-bnb-8bit"]
SUPPORTED_SCHEDULERS = [
    "constant",
    "constant_with_warmup",
    "piecewise_constant",
    "linear",
    "cosine",
    "cosine_with_restarts",
    "polynomial",
]


def get_lr_scheduler(
    name: str,
    lr: float,
    warmup_steps: int = 0,
    train_steps: int = 1000,
    num_cycles: int = 1,
    power: float = 1.0,
    step_rules: Optional[str] = None,
    last_epoch: int = -1,
) -> optax.Schedule:
    """Return an optax schedule mapping step -> learning rate."""
    name = name or "constant"

    if name == "constant":
        return optax.constant_schedule(lr)

    if name == "constant_with_warmup":

        def schedule(step):
            frac = optax.linear_schedule(0.0, 1.0, max(warmup_steps, 1))(step)
            return lr * (frac if warmup_steps > 0 else 1.0)

        return schedule

    if name == "piecewise_constant":
        # step_rules format mirrors diffusers: "1:10,0.1:20,0.01" =>
        # multiplier 1 until step 10, 0.1 until step 20, then 0.01.
        if step_rules is None:
            raise ValueError("piecewise_constant scheduler requires step_rules")
        rule_list = step_rules.split(",")
        boundaries_and_scales = {}
        prev_mult = float(rule_list[0].split(":")[0])
        for rule in rule_list[:-1]:
            mult, boundary = rule.split(":")
            boundaries_and_scales[int(boundary)] = float(rule_list[rule_list.index(rule) + 1].split(":")[0]) / float(
                mult
            )
        return optax.piecewise_constant_schedule(lr * prev_mult, boundaries_and_scales)

    if name == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.linear_schedule(lr, 0.0, max(train_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )

    if name == "cosine":

        def schedule(step):
            import jax.numpy as jnp

            warm = jnp.minimum(jnp.asarray(step, jnp.float32) / max(warmup_steps, 1), 1.0)
            progress = jnp.clip(
                (jnp.asarray(step, jnp.float32) - warmup_steps) / max(train_steps - warmup_steps, 1), 0.0, 1.0
            )
            cos = 0.5 * (1.0 + jnp.cos(math.pi * float(num_cycles) * 2.0 * progress))
            return lr * jnp.where(step < warmup_steps, warm, jnp.maximum(0.0, cos))

        return schedule

    if name == "cosine_with_restarts":

        def schedule(step):
            import jax.numpy as jnp

            warm = jnp.minimum(jnp.asarray(step, jnp.float32) / max(warmup_steps, 1), 1.0)
            progress = jnp.clip(
                (jnp.asarray(step, jnp.float32) - warmup_steps) / max(train_steps - warmup_steps, 1), 0.0, 1.0
            )
            cos = 0.5 * (1.0 + jnp.cos(math.pi * ((float(num_cycles) * progress) % 1.0)))
            val = jnp.where(progress >= 1.0, 0.0, jnp.maximum(0.0, cos))
            return lr * jnp.where(step < warmup_steps, warm, val)

        return schedule

    if name == "polynomial":
        lr_end = 1e-7

        def schedule(step):
            import jax.numpy as jnp

            warm = jnp.minimum(jnp.asarray(step, jnp.float32) / max(warmup_steps, 1), 1.0)
            s = jnp.clip(jnp.asarray(step, jnp.float32) - warmup_steps, 0.0, None)
            decay_steps = max(train_steps - warmup_steps, 1)
            pct = 1.0 - jnp.minimum(s / decay_steps, 1.0)
            decayed = (lr - lr_end) * (pct**power) + lr_end
            return jnp.where(step < warmup_steps, lr * warm, decayed)

        return schedule

    raise ValueError(f"Unsupported scheduler {name}; choose from {SUPPORTED_SCHEDULERS}")


def get_optimizer(
    name: str,
    learning_rate,  # float or optax.Schedule
    beta1: float = 0.9,
    beta2: float = 0.95,
    beta3: Optional[float] = None,
    epsilon: float = 1e-8,
    weight_decay: float = 1e-4,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Build the optimizer chain: [clip_by_global_norm] -> adam(w)."""
    name = (name or "adamw").lower()
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if name == "adam":
        chain.append(optax.adam(learning_rate, b1=beta1, b2=beta2, eps=epsilon))
    elif name == "adamw":
        chain.append(optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=epsilon, weight_decay=weight_decay))
    elif name == "adam-bnb-8bit":
        from .optim8bit import adam_8bit

        chain.append(adam_8bit(learning_rate, b1=beta1, b2=beta2, eps=epsilon))
    elif name == "adamw-bnb-8bit":
        from .optim8bit import adamw_8bit

        chain.append(adamw_8bit(learning_rate, b1=beta1, b2=beta2, eps=epsilon, weight_decay=weight_decay))
    else:
        raise ValueError(f"Unsupported optimizer {name}; choose from {SUPPORTED_OPTIMIZERS}")
    return optax.chain(*chain)
