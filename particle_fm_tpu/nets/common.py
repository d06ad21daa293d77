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


class WNDenseSplit(nn.Module):
    """Weight-norm Dense over a concat of per-particle and per-set segments,
    WITHOUT materializing the concat.

    The EPiC nets feed cat(t_emb, x_local, global2local, cond) into each
    local Dense, where every segment except x_local is constant across the
    particle axis. Materializing that (B, N, in_total) concat costs more HBM
    traffic than the matmul itself on TPU. This module keeps the exact
    parameter layout of WNDense on the concatenated input (one kernel of
    shape (in_total, out), same init, same weight-norm over full columns) but
    computes:  out = x @ W_x  +  broadcast(cat(set_segments) @ W_set)  + b,
    i.e. one large per-particle matmul + one tiny per-set matmul.

    Call with `segments`: list of (array, kind) in concat order, kind in
    {"set", "particle"}; "set" arrays are (B, k), "particle" arrays (B, N, k).
    """

    features: int
    use_weight_norm: bool = True
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, segments) -> jnp.ndarray:
        segments = [(a, kind) for a, kind in segments if a is not None and a.shape[-1] > 0]
        fan_in = sum(a.shape[-1] for a, _ in segments)
        v = self.param(
            "kernel", torch_linear_init(fan_in), (fan_in, self.features), self.param_dtype
        )
        if self.use_weight_norm:
            g = self.param("g", lambda rng, vv: jnp.linalg.norm(vv, axis=0), v)
            col_norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (g[None, :] / jnp.maximum(col_norm, 1e-12))
        else:
            w = v
        if self.dtype is not None:
            w = w.astype(self.dtype)

        out = None
        set_parts, set_ws = [], []
        row = 0
        for a, kind in segments:
            k = a.shape[-1]
            w_seg = w[row : row + k]
            row += k
            if kind == "particle":
                a = a.astype(w.dtype) if self.dtype is not None else a
                part = a @ w_seg
                out = part if out is None else out + part
            else:
                set_parts.append(a.astype(w.dtype) if self.dtype is not None else a)
                set_ws.append(w_seg)
        if set_parts:
            set_in = jnp.concatenate(set_parts, axis=-1) if len(set_parts) > 1 else set_parts[0]
            set_w = jnp.concatenate(set_ws, axis=0) if len(set_ws) > 1 else set_ws[0]
            set_out = set_in @ set_w  # (B, out) — tiny
            set_out = set_out[..., None, :]
            out = set_out if out is None else out + set_out
        if self.use_bias:
            b = self.param("bias", torch_linear_init(fan_in), (self.features,), self.param_dtype)
            if self.dtype is not None:
                b = b.astype(w.dtype)
            out = out + b
        return out


def cat(*parts: jnp.ndarray | None) -> jnp.ndarray:
    """Concatenate along the last axis, skipping None/zero-width parts.

    Mirrors the reference's idiom of concatenating empty tensors for disabled
    conditioning (epic.py:112-147).
    """
    kept = [p for p in parts if p is not None and p.shape[-1] > 0]
    if len(kept) == 1:
        return kept[0]
    return jnp.concatenate(kept, axis=-1)
