"""Iterative (running) normalization layer.

In-model standardization whose statistics are fit online from the training
batches via a batched, masked Welford update, then frozen after `max_n`
samples. Stats live in the flax variable collection "norm_stats" so they ride
along in checkpoints like the reference's registered buffers.

Parity: particle_fm/models/components/norm_layer.py:7-155. Differences forced
by fixed shapes: instead of boolean fancy-indexing (`inpt[mask]`) we compute
mask-weighted statistics; normalized values are written only at real-particle
positions (padding passes through, like the reference's `inpt[mask] = ...`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class IterativeNormLayer(nn.Module):
    """Running standardization: y = (x - mean) / (sqrt(var) + 1e-8).

    For set inputs (B, N, F) pass mask (B, N, 1); stats are over real
    particles only. For flat inputs (B, F) pass mask=None.
    """

    inpt_dim: int
    max_n: int = 500_000

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        update_stats: bool = False,
    ) -> jnp.ndarray:
        means = self.variable("norm_stats", "means", lambda: jnp.zeros((self.inpt_dim,)))
        m2 = self.variable("norm_stats", "m2", lambda: jnp.ones((self.inpt_dim,)))
        vars = self.variable("norm_stats", "vars", lambda: jnp.ones((self.inpt_dim,)))
        n = self.variable("norm_stats", "n", lambda: jnp.zeros((), jnp.float32))

        if update_stats and not self.is_initializing():
            flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            if mask is not None:
                w = mask.reshape(-1, 1).astype(jnp.float32)
            else:
                w = jnp.ones((flat.shape[0], 1), jnp.float32)
            c = jnp.sum(w)
            frozen = n.value >= self.max_n

            # first batch: plain masked var/mean (fit); later: batched Welford
            w_mean = jnp.sum(flat * w, axis=0) / c
            w_var = jnp.sum(jnp.square(flat - w_mean) * w, axis=0) / jnp.maximum(c - 1.0, 1.0)

            new_n = n.value + c
            upd_means = means.value + jnp.sum((flat - means.value) * w, axis=0) / new_n
            upd_m2 = m2.value + jnp.sum(
                (flat - means.value) * (flat - upd_means) * w, axis=0
            )
            upd_vars = upd_m2 / new_n

            first = n.value == 0
            cand_means = jnp.where(first, w_mean, upd_means)
            cand_m2 = jnp.where(first, w_var * c, upd_m2)
            cand_vars = jnp.where(first, w_var, upd_vars)
            cand_n = jnp.where(first, c, new_n)

            means.value = jnp.where(frozen, means.value, cand_means)
            m2.value = jnp.where(frozen, m2.value, cand_m2)
            vars.value = jnp.where(frozen, vars.value, cand_vars)
            n.value = jnp.where(frozen, n.value, cand_n)

        normed = (x - means.value) / (jnp.sqrt(vars.value) + 1e-8)
        if mask is not None:
            normed = jnp.where(mask > 0, normed, x)
        return normed

    def reverse(
        self, x: jnp.ndarray, mask: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        means = self.get_variable("norm_stats", "means")
        vars = self.get_variable("norm_stats", "vars")
        un = x * jnp.sqrt(vars) + means
        if mask is not None:
            un = jnp.where(mask > 0, un, x)
        return un
