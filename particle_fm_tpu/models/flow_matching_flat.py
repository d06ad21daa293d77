"""Flat-vector flow matching (no sets) — stage 1 of the LHCO pipeline.

Parity: particle_fm/models/flow_matching_no_sets.py:41-238. A small
conditional MLP vector field over flat features with a sincos time embedding
(freqs = arange(1, F+1) * pi — note: different ladder from the set CNF's
2^k * pi) and the Lipman FM-OT loss.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from particle_fm_tpu.losses.flow_matching import fm_ot_loss
from particle_fm_tpu.nets.mlp import SmallCondMLP
from particle_fm_tpu.samplers.ode import odeint_fixed


class FlatCNF(nn.Module):
    features: int
    freqs: int = 3
    activation: str = "elu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None, mask=None):
        freqs = jnp.arange(1, self.freqs + 1, dtype=x.dtype) * jnp.pi
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, x.shape[:-1])
        arg = t[..., None] * freqs
        t_emb = jnp.concatenate([jnp.cos(arg), jnp.sin(arg)], axis=-1)
        t_emb = jnp.broadcast_to(t_emb, x.shape[:-1] + (2 * self.freqs,))
        return SmallCondMLP(self.features, self.activation, self.dtype, name="net")(
            t_emb, x, cond
        )


@dataclasses.dataclass(eq=False)
class FlatFlowMatchingModel:
    """FM model over flat vectors: loss + midpoint sampling."""

    features: int = 10
    n_transforms: int = 1
    sigma: float = 1e-4
    activation: str = "elu"
    freqs: int = 3
    cond_dim: int = 1
    dtype: Any = None

    def __post_init__(self):
        parent = self

        class _Stack(nn.Module):
            @nn.compact
            def __call__(self, t, x, cond=None, mask=None):
                for k in range(parent.n_transforms):
                    x = FlatCNF(
                        parent.features,
                        parent.freqs,
                        parent.activation,
                        parent.dtype,
                        name=f"flow_{k}",
                    )(t, x, cond, mask)
                return x

        self.module = _Stack()

    def init(self, rng: jax.Array, batch_size: int = 2) -> dict:
        x = jnp.zeros((batch_size, self.features))
        t = jnp.zeros((batch_size,))
        cond = jnp.zeros((batch_size, self.cond_dim)) if self.cond_dim else None
        return dict(self.module.init(rng, t, x, cond))

    def loss(self, variables, rng, x, mask=None, cond=None, train: bool = False):
        def vf(t, y, c, m):
            return self.module.apply(variables, t, y, c, m)

        # reference training passes mask=None for flat data (loss uses x shape)
        return fm_ot_loss(vf, rng, x, None, cond, sigma=self.sigma), {}

    @partial(jax.jit, static_argnames=("self", "n_samples", "ode_solver", "ode_steps"))
    def sample(
        self,
        variables,
        rng,
        n_samples: int | None = None,
        cond=None,
        mask=None,
        ode_solver: str = "midpoint",
        ode_steps: int = 100,
    ):
        if n_samples is None:
            n_samples = cond.shape[0]
        z = jax.random.normal(rng, (n_samples, self.features))

        def drift(t, y):
            return self.module.apply(variables, t, y, cond, mask)

        if ode_solver != "midpoint":
            raise NotImplementedError(f"Solver {ode_solver} not implemented")
        return odeint_fixed(drift, z, 1.0, 0.0, ode_steps=ode_steps, method="midpoint")
