"""Learning-rate schedules as optax-compatible pure functions.

TPU-native counterpart of `nerfstudio/engine/schedulers.py` (ExponentialDecay 109,
MultiStep 77, CosineDecay 158). Schedules return absolute learning rates (the
reference returns multipliers for LambdaLR; the semantics match).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def exponential_decay_schedule(
    lr_init: float,
    lr_final: float | None = None,
    max_steps: int = 100000,
    warmup_steps: int = 0,
    lr_pre_warmup: float = 1e-8,
    ramp: str = "cosine",
) -> Callable:
    """Warmup ramp (cosine/linear) then log-linear decay (`schedulers.py:109-142`)."""
    final = lr_init if lr_final is None else lr_final

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if warmup_steps > 0:
            frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
            if ramp == "cosine":
                warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * jnp.sin(0.5 * jnp.pi * frac)
            else:
                warm = lr_pre_warmup + (lr_init - lr_pre_warmup) * frac
        else:
            warm = jnp.asarray(lr_init)
        t = jnp.clip((step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0)
        decay = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(final) * t)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def multistep_schedule(lr_init: float, milestones: Sequence[int] = (1000000,), gamma: float = 0.33) -> Callable:
    """Decay by gamma at each milestone (`schedulers.py:77-89`)."""
    ms = jnp.asarray(milestones)

    def schedule(step):
        n = jnp.sum(step >= ms)
        return lr_init * gamma**n

    return schedule


def cosine_decay_schedule(
    lr_init: float, warm_up_end: int = 5000, learning_rate_alpha: float = 0.05, max_steps: int = 300000
) -> Callable:
    """Linear warmup + cosine decay to alpha (`schedulers.py:158-174`)."""

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / max(warm_up_end, 1)
        progress = jnp.clip((step - warm_up_end) / max(max_steps - warm_up_end, 1), 0.0, 1.0)
        factor = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1.0 - learning_rate_alpha) + learning_rate_alpha
        return lr_init * jnp.where(step < warm_up_end, warm, factor)

    return schedule
