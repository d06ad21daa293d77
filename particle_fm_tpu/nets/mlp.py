"""Plain MLP / ResNet vector fields for flat (non-set) data + cathode classifier.

Parity: particle_fm/models/components/mlp.py:5-173. Used by the LHCO
two-stage pipeline's jet-feature flow (stage 1) and the HL classifier test.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from particle_fm_tpu.nets.common import WNDense, cat, get_act


class MLP(nn.Module):
    """Dense stack: Linear->act between all layers, no act after the last."""

    out_features: int
    hidden_features: Sequence[int] = (64, 64)
    activation: str = "elu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        act = get_act(self.activation)
        dims = list(self.hidden_features) + [self.out_features]
        for i, d in enumerate(dims):
            x = WNDense(d, use_weight_norm=False, dtype=self.dtype, name=f"lin_{i}")(x)
            if i < len(dims) - 1:
                x = act(x)
        return x


class SmallCondMLP(nn.Module):
    """4 MLP stages, (t, cond) re-concatenated at each stage input."""

    out_features: int
    activation: str = "elu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None):
        a = self.activation
        x = MLP(64, (64, 64), a, self.dtype, name="mlp1")(cat(t, x, cond))
        x = MLP(256, (256, 256), a, self.dtype, name="mlp2")(cat(t, x, cond))
        x = MLP(256, (256, 256), a, self.dtype, name="mlp3")(cat(t, x, cond))
        x = MLP(self.out_features, (64, 64), a, self.dtype, name="mlp4")(cat(t, x, cond))
        return x


class VerySmallCondMLP(nn.Module):
    out_features: int
    activation: str = "elu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None):
        return MLP(self.out_features, (64, 64), self.activation, self.dtype, name="mlp1")(
            cat(t, x, cond)
        )


class ResNetBlock(nn.Module):
    out_features: int
    hidden_features: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        act = get_act("leaky_relu")
        h = act(WNDense(self.hidden_features, use_weight_norm=False, dtype=self.dtype, name="linear")(x))
        return act(
            WNDense(self.out_features, use_weight_norm=False, dtype=self.dtype, name="linear2")(h)
            + (h if h.shape[-1] == self.out_features else 0.0)
        )


class SmallCondResNet(nn.Module):
    out_features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None):
        x = ResNetBlock(64, 64, self.dtype, name="mlp1")(cat(t, x, cond))
        x = ResNetBlock(256, 256, self.dtype, name="mlp2")(cat(t, x, cond))
        x = ResNetBlock(256, 256, self.dtype, name="mlp3")(cat(t, x, cond))
        x = ResNetBlock(256, 256, self.dtype, name="mlp4")(cat(t, x, cond))
        x = ResNetBlock(self.out_features, 64, self.dtype, name="mlp5")(cat(t, x, cond))
        return x


class CathodeClassifier(nn.Module):
    """ReLU MLP -> 1 logit, for the high-level-feature classifier test."""

    layers: Sequence[int] = (64, 64, 64)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, n in enumerate(self.layers):
            x = WNDense(n, use_weight_norm=False, dtype=self.dtype, name=f"lin_{i}")(x)
            x = jnp.maximum(x, 0)
        return WNDense(1, use_weight_norm=False, dtype=self.dtype, name="lin_out")(x)
