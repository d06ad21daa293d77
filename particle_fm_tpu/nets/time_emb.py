"""Time embeddings for the vector-field networks.

Parity (reference = ewencedr/particle_fm):
  - sincos:  flow_matching_module.py:208-211  t -> cat(cos(2^k*pi*t), sin(2^k*pi*t))
  - gaussian: time_emb.py:9-22   Gaussian Fourier projection
  - cosine:  time_emb.py:49-96   cos((x+min)*exp(k)*pi/(max+min)) frequency ladder
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def sincos_embedding(t: jnp.ndarray, frequencies: int) -> jnp.ndarray:
    """cat(cos, sin) of t at frequencies 2^k * pi, k=0..frequencies-1.

    t: (...,) -> (..., 2*frequencies)
    """
    freqs = (2.0 ** jnp.arange(frequencies)) * jnp.pi
    arg = t[..., None] * freqs
    return jnp.concatenate([jnp.cos(arg), jnp.sin(arg)], axis=-1)


def cosine_encoding(
    x: jnp.ndarray,
    outp_dim: int = 32,
    min_value: float = 0.0,
    max_value: float = 1.0,
    frequency_scaling: str = "exponential",
) -> jnp.ndarray:
    """Cosine positional encoding with exponentially (or linearly) increasing freqs.

    x: (...,) or (..., 1) -> (..., outp_dim)
    """
    if x.ndim == 0:
        x = x[None]
    if x.shape[-1] != 1:
        x = x[..., None]
    if frequency_scaling == "exponential":
        freqs = jnp.exp(jnp.arange(outp_dim, dtype=x.dtype))
    elif frequency_scaling == "linear":
        freqs = jnp.arange(1, outp_dim + 1, dtype=x.dtype)
    else:
        raise ValueError(f"Unrecognised frequency scaling: {frequency_scaling}")
    return jnp.cos((x + min_value) * freqs * math.pi / (max_value + min_value))


class GaussianFourierProjection(nn.Module):
    """Gaussian random features for time: fixed random projection, sin/cat/cos."""

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embed_dim // 2,),
        )
        w = jax.lax.stop_gradient(w)  # frozen, like requires_grad=False
        x_proj = x[..., None] * w * 2 * math.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def broadcast_time_embedding(
    t: jnp.ndarray, n_particles: int, t_emb: str, frequencies: int
) -> jnp.ndarray:
    """Parameter-free time embedding broadcast per particle.

    t: scalar or (B,) -> (B, N, 2*frequencies). The single definition shared
    by CNF.time_embedding (models/cnf.py) and the pipelined vector-field twin
    (parallel/pp.py), so the embedding convention cannot drift between them.
    Covers the sincos/cosine ladders; the gaussian embedding has parameters
    and lives on the CNF module.
    """
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    if t_emb == "sincos":
        emb = sincos_embedding(t, frequencies)  # (B, 2f)
    elif t_emb == "cosine":
        emb = cosine_encoding(t, outp_dim=2 * frequencies, min_value=0.0, max_value=1.0)
    else:
        raise NotImplementedError(f"t_emb={t_emb} has parameters or is unknown")
    return jnp.broadcast_to(
        emb[..., None, :], emb.shape[:-1] + (n_particles, emb.shape[-1])
    )
