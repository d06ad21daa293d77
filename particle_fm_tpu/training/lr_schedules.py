"""Learning-rate schedules (optax-compatible step -> lr functions).

Parity: particle_fm/schedulers/lr_scheduler.py:7-99. The reference steps its
schedulers once per *epoch* (flow_matching_module.py:624-631); pass
`steps_per_epoch` so `warmup`/`max_iters` given in epochs convert to steps
while keeping the same per-epoch lr trajectory.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warmup_schedule(
    base_lr: float, warmup: int, max_iters: int, steps_per_epoch: int = 1
):
    """lr(step) = base * 0.5*(1+cos(pi*e/max_iters)) * min(1, e/warmup), e = epoch."""

    def schedule(step):
        e = step / steps_per_epoch
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * e / max_iters))
        factor = jnp.where(e <= warmup, factor * e / warmup, factor)
        return base_lr * factor

    return schedule


def warmup_to_constant_schedule(base_lr: float, num_steps: int = 100, steps_per_epoch: int = 1):
    """Linear ramp from 0 to base_lr over num_steps epochs, then constant."""

    def schedule(step):
        e = step / steps_per_epoch
        factor = jnp.minimum(e / num_steps, 1.0)
        return base_lr * factor

    return schedule


def onecycle_cooldown_schedule(
    base_lr: float,
    warmup: int,
    cooldown: int,
    cooldown_final: int,
    max_lr: float,
    final_lr: float,
    steps_per_epoch: int = 1,
):
    """Warmup to max_lr, cosine down to base_lr, then cosine to final_lr, then flat."""

    def schedule(step):
        e = step / steps_per_epoch
        up = base_lr + (max_lr - base_lr) * jnp.minimum(e / warmup, 1.0)
        down_frac = jnp.clip((e - warmup) / cooldown, 0.0, 1.0)
        down = max_lr + (base_lr - max_lr) * 0.5 * (1 - jnp.cos(math.pi * down_frac))
        final_frac = jnp.clip((e - warmup - cooldown) / cooldown_final, 0.0, 1.0)
        final = base_lr + (final_lr - base_lr) * 0.5 * (1 - jnp.cos(math.pi * final_frac))
        lr = jnp.where(
            e < warmup, up, jnp.where(e < warmup + cooldown, down, final)
        )
        return lr

    return schedule
