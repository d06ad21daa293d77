"""Diffusion samplers: reverse-SDE Euler-Maruyama and deterministic DDIM.

Both run as a single `lax.scan` over `n_steps` network forwards.
Parity: particle_fm/models/components/solver.py:23-143 (PC-JeDi).

The model callable has signature `model(t, x) -> pred_noise` where t is a
scalar diffusion time (already closed over cond/mask).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule

NoiseModel = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_predict(noisy, pred_noises, signal_rates, noise_rates):
    """One-jump estimate of x_0 from anywhere in the diffusion process."""
    return (noisy - noise_rates * pred_noises) / signal_rates


def ddim_sampler(
    model: NoiseModel,
    schedule: VPDiffusionSchedule,
    initial_noise: jnp.ndarray,
    n_steps: int = 50,
    clip_predictions: tuple | None = None,
) -> jnp.ndarray:
    """Deterministic DDIM: predict x0, re-noise to the next time, repeat."""
    step_size = 1.0 / n_steps

    def body(carry, k):
        noisy, _ = carry
        t = 1.0 - k.astype(initial_noise.dtype) * step_size
        signal_rates, noise_rates = schedule(t)
        pred_noises = model(t, noisy)
        pred_data = ddim_predict(noisy, pred_noises, signal_rates, noise_rates)
        if clip_predictions is not None:
            pred_data = jnp.clip(pred_data, *clip_predictions)
        t_next = t - step_size
        next_signal, next_noise = schedule(t_next)
        noisy = next_signal * pred_data + next_noise * pred_noises
        return (noisy, pred_data), None

    (_, pred_data), _ = jax.lax.scan(
        body, (initial_noise, initial_noise), jnp.arange(n_steps)
    )
    return pred_data


def euler_maruyama_sampler(
    model: NoiseModel,
    schedule: VPDiffusionSchedule,
    initial_noise: jnp.ndarray,
    rng: jax.Array,
    n_steps: int = 50,
    clip_predictions: tuple | None = None,
) -> jnp.ndarray:
    """Reverse-SDE sampling: x += 0.5*beta*(x + 2*s)*dt + sqrt(beta*dt)*eps."""
    delta_t = 1.0 / n_steps

    def body(carry, k):
        x_t, key = carry
        t = 1.0 - k.astype(initial_noise.dtype) * delta_t
        pred_noises = model(t, x_t)
        _, noise_rates = schedule(t)
        s = -pred_noises / noise_rates
        betas = schedule.get_betas(t)
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, x_t.shape, x_t.dtype)
        x_t = x_t + 0.5 * betas * (x_t + 2.0 * s) * delta_t
        x_t = x_t + jnp.sqrt(betas * delta_t) * eps
        if clip_predictions is not None:
            x_t = jnp.clip(x_t, *clip_predictions)
        return (x_t, key), None

    (x_t, _), _ = jax.lax.scan(body, (initial_noise, rng), jnp.arange(n_steps))
    return x_t
