"""Shared network building blocks: activations, init, weight-normalized Dense.

Parity notes:
  - The reference wraps every Linear in torch's `nn.utils.weight_norm`
    (particle_fm/models/components/epic.py:66). We reparametrize the kernel as
    w = g * v / ||v||_col with g initialized to ||v||_col so the function at
    init equals a plain Dense, exactly like torch's wrapper.
  - torch Linear init draws kernel and bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in));
    we replicate that so training dynamics are comparable.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(fan_in: int) -> Callable:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch.nn.Linear default."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


_ACTS = {
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "lrlu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),  # droid nets' act
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_act(name: str) -> Callable:
    """Activation registry. Unknown names fall back to identity, matching the
    reference's `getattr(F, activation, lambda x: x)` (epic.py:180)."""
    return _ACTS.get(name, lambda x: x)


class WNDense(nn.Module):
    """Dense layer with weight normalization: w = g * v / ||v||.

    The norm is over the input axis (per output feature), matching
    torch.nn.utils.weight_norm(nn.Linear(...)) with default dim=0.
    g is initialized to ||v|| so at init this is exactly a plain Dense.

    Set `use_weight_norm=False` for a plain Dense with torch-style init
    (the reference's `wrapper_func` can be a passthrough too).
    """

    features: int
    use_weight_norm: bool = True
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32
    init_zeros: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        if self.init_zeros:
            kernel_init = nn.initializers.zeros
        else:
            kernel_init = torch_linear_init(fan_in)
        v = self.param("kernel", kernel_init, (fan_in, self.features), self.param_dtype)
        if self.use_weight_norm:
            g = self.param(
                "g",
                lambda rng, vv: jnp.linalg.norm(vv, axis=0),
                v,
            )
            col_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (g[None, :] / jnp.maximum(col_norm, 1e-12))
        else:
            w = v
        if self.dtype is not None:
            w = w.astype(self.dtype)
            x = x.astype(self.dtype)
        y = x @ w
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.zeros if self.init_zeros else torch_linear_init(fan_in),
                (self.features,),
                self.param_dtype,
            )
            if self.dtype is not None:
                b = b.astype(self.dtype)
            y = y + b
        return y


def cat(*parts: jnp.ndarray | None) -> jnp.ndarray:
    """Concatenate along the last axis, skipping None/zero-width parts.

    Mirrors the reference's idiom of concatenating empty tensors for disabled
    conditioning (epic.py:112-147).
    """
    kept = [p for p in parts if p is not None and p.shape[-1] > 0]
    if len(kept) == 1:
        return kept[0]
    return jnp.concatenate(kept, axis=-1)
