"""Masked-set primitives.

Everything in this framework operates on fixed-shape padded point clouds:

    x    : (B, N, F)  particle features, padded with zeros
    mask : (B, N, 1)  1.0 for real particles, 0.0 for padding

These primitives are padding-invariant by construction: the value at padded
positions never influences the result. XLA fuses these elementwise+reduce
patterns into the surrounding matmuls, so the jnp forms below are already
MXU/VPU-friendly; Pallas variants exist in `ops/pallas/` for the few cases
where fusion across a matmul boundary pays off.

Behavioral parity notes (reference = ewencedr/particle_fm):
  - meansum pooling with `sum_scale`: particle_fm/models/components/epic.py:160-171
  - masked loss normalization sum(err)/mask.sum(): models/components/losses.py:74-77,130
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_mask(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Zero out padded positions. mask: (B, N, 1) or broadcastable; None = no-op."""
    if mask is None:
        return x
    return x * mask


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -2) -> jnp.ndarray:
    """Sum over the particle axis, ignoring padding."""
    if mask is None:
        return jnp.sum(x, axis=axis)
    return jnp.sum(x * mask, axis=axis)


def masked_mean(
    x: jnp.ndarray, mask: jnp.ndarray | None, axis: int = -2, eps: float = 0.0
) -> jnp.ndarray:
    """Mean over the particle axis, ignoring padding.

    Matches reference semantics exactly (no epsilon by default): the caller
    guarantees at least one valid particle per set.
    """
    if mask is None:
        return jnp.mean(x, axis=axis)
    s = jnp.sum(x * mask, axis=axis)
    n = jnp.sum(mask, axis=axis)
    if eps:
        n = n + eps
    return s / n


def meansum_pool(
    x: jnp.ndarray, mask: jnp.ndarray | None, sum_scale: float = 1e-2
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EPiC mean+sum pooling over particles.

    Returns (mean, scaled_sum), each (B, F). The sum is scaled by `sum_scale`
    (default 1e-2) so its magnitude stays comparable to the mean.
    Parity: particle_fm/models/components/epic.py:160-162.
    """
    if mask is None:
        s = jnp.sum(x, axis=-2)
        m = s / x.shape[-2]
    else:
        s = jnp.sum(x * mask, axis=-2)
        m = s / jnp.sum(mask, axis=-2)
    return m, s * sum_scale


def masked_mse(v: jnp.ndarray, u: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """sum((v-u)^2) / mask.sum() — the reference's masked-MSE normalization.

    Note: the numerator sums over ALL positions (padded slots contribute 0 when
    both v and u are masked upstream) while the denominator counts only real
    particles. Parity: losses.py:75-77,130.
    """
    sq = jnp.square(v - u)
    if mask is None:
        denom = float(v.shape[0] * v.shape[1]) if v.ndim == 3 else float(v.shape[0])
    else:
        denom = jnp.sum(mask)
    return jnp.sum(sq) / denom


def huber(err: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber (torch.nn.HuberLoss semantics, delta=1.0)."""
    abs_err = jnp.abs(err)
    quad = 0.5 * jnp.square(err)
    lin = delta * (abs_err - 0.5 * delta)
    return jnp.where(abs_err <= delta, quad, lin)


def masked_huber(
    v: jnp.ndarray, u: jnp.ndarray, mask: jnp.ndarray | None, delta: float = 1.0
) -> jnp.ndarray:
    """sum(huber(v-u)) / mask.sum()."""
    h = huber(v - u, delta)
    if mask is None:
        denom = float(v.shape[0] * v.shape[1]) if v.ndim == 3 else float(v.shape[0])
    else:
        denom = jnp.sum(mask)
    return jnp.sum(h) / denom
