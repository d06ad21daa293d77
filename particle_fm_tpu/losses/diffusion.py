"""Continuous-time VP (variance-preserving) cosine diffusion schedule.

Used by the PC-JeDi diffusion objective and its samplers.
Parity: particle_fm/models/components/diffusion.py:9-62 (math re-derived from
the Nichol&Dhariwal cosine schedule, arXiv:2102.09672).

signal_rate(t) = cos(angle(t)),  noise_rate(t) = sin(angle(t))
angle(t) = acos(max_sr) + t * (acos(min_sr) - acos(max_sr))
beta(t)  = 2 * (acos(min_sr) - acos(max_sr)) * tan(angle(t))
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


def cosine_diffusion_schedule(
    t: jnp.ndarray, max_sr: float = 1.0, min_sr: float = 1e-2
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (signal_rates, noise_rates) for diffusion times t in [0, 1]."""
    start_angle = math.acos(max_sr)
    end_angle = math.acos(min_sr)
    angles = start_angle + t * (end_angle - start_angle)
    return jnp.cos(angles), jnp.sin(angles)


def cosine_beta_schedule(
    t: jnp.ndarray, max_sr: float = 1.0, min_sr: float = 1e-2
) -> jnp.ndarray:
    """Continuous beta(t) for the VP SDE under the cosine schedule."""
    start_angle = math.acos(max_sr)
    end_angle = math.acos(min_sr)
    angles = start_angle + t * (end_angle - start_angle)
    return 2.0 * (end_angle - start_angle) * jnp.tan(angles)


@dataclass(frozen=True)
class VPDiffusionSchedule:
    """Static-config schedule object; safe to close over inside jit."""

    max_sr: float = 1.0
    min_sr: float = 1e-2

    def __call__(self, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return cosine_diffusion_schedule(t, self.max_sr, self.min_sr)

    def get_betas(self, t: jnp.ndarray) -> jnp.ndarray:
        return cosine_beta_schedule(t, self.max_sr, self.min_sr)
