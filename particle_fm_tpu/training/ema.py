"""Exponential moving average of parameters.

The TPU-native EMA is a pure pytree update fused into the jitted train step
(one multiply-add per parameter, negligible next to the backward pass),
rather than a host-side callback over `state_dict` like the reference
(particle_fm/callbacks/ema.py:74-100). Cadence/start-step gating matches the
reference semantics: apply from `start_step`, every `every_n` steps;
otherwise the EMA copy is carried through unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(
    ema_params,
    params,
    step: jnp.ndarray,
    decay: float = 0.999,
    every_n: int = 1,
    start_step: int = 0,
):
    """ema <- ema - (1-decay)*(ema - params), gated on the step counter."""
    apply = (step >= start_step) & (step % every_n == 0)

    def upd(e, p):
        new = e - (1.0 - decay) * (e - p)
        return jnp.where(apply, new, e)

    return jax.tree_util.tree_map(upd, ema_params, params)
