"""Training objectives: FM-OT, CFM, OT-CFM, VP-diffusion (PC-JeDi), Droid.

All losses are pure functions of the form

    loss(vf, rng, x, mask, cond) -> scalar

where `vf(t, y, cond, mask)` is the (parameter-closed) vector-field network,
t has shape (B,) (per-set time, constant across particles), x is (B, N, F)
and mask is (B, N, 1) or None. The whole loss jits into one fused XLA program.

Behavioral parity (reference = particle_fm/models/components/losses.py):
  - FM-OT (Lipman):   y=(1-t)x + (sigma+(1-sigma)t)z,  u=(1-sigma)z - x     (:56-77)
  - CFM:              mu=(1-t)x1 + t*x0, y=mu+sigma*eps, u=x0-x1            (:101-136)
  - OT-CFM:           CFM with minibatch-OT particle pairing                (:161-204)
  - diffusion(JeDi):  noise prediction + 1e-3 * (beta/sigma_t) MLE weight   (:235-285)
  - droid:            y=x + t*z, u=z                                        (:308-342)
All use the masked normalization sum(err)/mask.sum().
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule
from particle_fm_tpu.losses.ot import gather_particles, ot_pair_indices
from particle_fm_tpu.ops.masked import huber

VF = Callable  # vf(t: (B,), y: (B,N,F), cond, mask) -> (B,N,F)


def _ones_mask(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.ones_like(x[..., :1])


def _reduce(err_sq: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(err_sq) / jnp.sum(mask)


def _criterion(v: jnp.ndarray, u: jnp.ndarray, criterion: str) -> jnp.ndarray:
    if criterion == "mse":
        return jnp.square(v - u)
    elif criterion == "huber":
        return huber(v - u)
    raise ValueError(f"criterion {criterion} not supported")


def _sample_t(rng, batch: int, dtype) -> jnp.ndarray:
    return jax.random.uniform(rng, (batch,), dtype=dtype)


def _normal(rng, shape, dtype) -> jnp.ndarray:
    """Standard-normal draw. Module-level so parity tests can pin the noise
    (tests/test_torch_parity.py monkeypatches _sample_t/_normal to replay the
    exact tensors fed to the executed torch reference losses)."""
    return jax.random.normal(rng, shape, dtype)


def _tb(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-sample t to x's rank: (B,) -> (B, 1, ..., 1)."""
    return t.reshape((t.shape[0],) + (1,) * (x.ndim - 1))


def fm_ot_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    sigma: float = 1e-4,
    criterion: str = "mse",
) -> jnp.ndarray:
    """Lipman flow matching to the OT (straight) probability path."""
    if mask is None:
        mask = _ones_mask(x)
    rng_t, rng_z = jax.random.split(rng)
    t = _sample_t(rng_t, x.shape[0], x.dtype)
    tb = _tb(t, x)
    z = _normal(rng_z, x.shape, x.dtype)
    y = (1.0 - tb) * x + (sigma + (1.0 - sigma) * tb) * z
    u = ((1.0 - sigma) * z - x) * mask
    v = vf(t, y, cond, mask)
    return _reduce(_criterion(v, u, criterion), mask)


def cfm_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    sigma: float = 1e-4,
    criterion: str = "mse",
) -> jnp.ndarray:
    """Conditional flow matching (independent coupling)."""
    if mask is None:
        mask = _ones_mask(x)
    rng_t, rng_0, rng_eps = jax.random.split(rng, 3)
    t = _sample_t(rng_t, x.shape[0], x.dtype)
    tb = _tb(t, x)
    x0 = _normal(rng_0, x.shape, x.dtype)  # prior sample
    x1 = x
    mu_t = (1.0 - tb) * x1 + tb * x0
    y = mu_t + sigma * _normal(rng_eps, x.shape, x.dtype)
    u = (x0 - x1) * mask
    v = vf(t, y, cond, mask)
    return _reduce(_criterion(v, u, criterion), mask)


def cfm_ot_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    sigma: float = 1e-4,
    criterion: str = "mse",
    ot_method: str = "sinkhorn",
    ot_reg: float = 0.01,
    ot_iters: int = 50,
) -> jnp.ndarray:
    """CFM with minibatch-OT pairing of noise particles to data particles.

    Unlike the reference (host-side pot.emd per set in a Python loop, plus a
    mask-broadcast bug — see losses/ot.py docstring), pairing runs on device
    and every set uses its own permuted mask.
    """
    if mask is None:
        mask = _ones_mask(x)
    rng_t, rng_0, rng_eps = jax.random.split(rng, 3)
    t = _sample_t(rng_t, x.shape[0], x.dtype)
    tb = _tb(t, x)
    x0 = _normal(rng_0, x.shape, x.dtype)
    x1 = x
    j = ot_pair_indices(x0, x1, method=ot_method, reg=ot_reg, n_iters=ot_iters)
    x1p = gather_particles(x1, j)
    mask_ot = gather_particles(mask, j)
    mu_t = x0 * tb + x1p * (1.0 - tb)
    y = mu_t + sigma * _normal(rng_eps, x.shape, x.dtype)
    u = (x0 - x1p) * mask_ot
    v = vf(t, y, cond, mask_ot)
    return _reduce(_criterion(v, u, criterion), mask)


def reflow_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    sigma: float = 1e-4,
    criterion: str = "mse",
) -> jnp.ndarray:
    """Rectified-flow (ReFlow) objective: CFM on a FIXED teacher coupling.

    Beyond-reference few-step sampling (Liu et al., "Flow Straight and Fast",
    arXiv:2209.03003). The batch packs teacher-generated pairs along the
    feature axis: x = concat(x1, x0) with x1 = teacher sample and x0 the
    exact prior noise the teacher integrated from (see scripts/reflow.py).
    The objective is `cfm_loss` with the independent coupling replaced by the
    deterministic teacher coupling, which straightens the probability path —
    after one rectification the learned field supports 1-8 step sampling.
    Time/prior conventions match cfm_loss (t=1 is noise), so `sample()` and
    every ODE solver work on the student unchanged.
    """
    if x.shape[-1] % 2 != 0:
        raise ValueError("reflow batches must pack concat(x1, x0) pairs")
    f = x.shape[-1] // 2
    x1, x0 = x[..., :f], x[..., f:]
    if mask is None:
        mask = _ones_mask(x1)
    rng_t, rng_eps = jax.random.split(rng)
    t = _sample_t(rng_t, x1.shape[0], x1.dtype)
    tb = _tb(t, x1)
    mu_t = (1.0 - tb) * x1 + tb * x0
    y = mu_t + sigma * _normal(rng_eps, x1.shape, x1.dtype)
    u = (x0 - x1) * mask
    v = vf(t, y, cond, mask)
    return _reduce(_criterion(v, u, criterion), mask)


def diffusion_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    criterion: str = "huber",
    schedule: VPDiffusionSchedule = VPDiffusionSchedule(max_sr=1.0, min_sr=1e-8),
    mle_loss_weight: float = 0.001,
) -> jnp.ndarray:
    """PC-JeDi VP-diffusion noise-prediction loss with MLE weighting."""
    if mask is None:
        mask = _ones_mask(x)
    rng_t, rng_z = jax.random.split(rng)
    t = _sample_t(rng_t, x.shape[0], x.dtype)
    tb = _tb(t, x)
    z = _normal(rng_z, x.shape, x.dtype) * mask
    signal_rates, noise_rates = schedule(tb)
    noisy = signal_rates * x + noise_rates * z
    pred = vf(t, noisy, cond, mask)
    simple = _criterion(z, pred, criterion) * mask
    out = jnp.sum(simple) / jnp.sum(mask)
    if mle_loss_weight:
        betas = schedule.get_betas(tb)
        mle = (betas / noise_rates) * simple
        out = out + mle_loss_weight * jnp.sum(mle) / jnp.sum(mask)
    return out


def droid_loss(
    vf: VF,
    rng: jax.Array,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    cond: jnp.ndarray | None = None,
    criterion: str = "mse",
    t_max: float = 1.0,
) -> jnp.ndarray:
    """PC-Droid objective: y = x + t*z, target u = z (reference :308-342).

    t_max (beyond reference, default = reference behavior): the network time
    s stays in [0, 1] but the physical interpolation time is s*t_max, i.e.
    y = x + s*t_max*z. The reference's t_max=1 formulation cannot generate
    from N(0,1) noise: its s=1 marginal is x+z, not z, and with sigma=5
    normalized data the sampler's prior is wildly off (observed: W1M flat at
    0.32 over 600 epochs). With t_max >> data std the s=1 marginal
    x + t_max*z ~= t_max*N(0,1) IS the sampler's prior (VE-SDE / EDM-style
    wide noise range, as in the actual PC-Droid paper), so the same loss
    becomes generative."""
    if mask is None:
        mask = _ones_mask(x)
    rng_t, rng_z = jax.random.split(rng)
    t = _sample_t(rng_t, x.shape[0], x.dtype)
    tb = _tb(t, x) * t_max
    z = _normal(rng_z, x.shape, x.dtype)
    y = x + tb * z
    u = z * mask
    v = vf(t, y, cond, mask)
    return _reduce(_criterion(v, u, criterion), mask)


def get_loss_fn(
    loss_type: str,
    sigma: float = 1e-4,
    criterion: str = "mse",
    diff_config: dict | None = None,
    ot_config: dict | None = None,
    droid_t_max: float = 1.0,
) -> Callable:
    """Build `loss(vf, rng, x, mask, cond)` for a reference loss_type string."""
    diff_config = diff_config or {"max_sr": 1.0, "min_sr": 1e-8}
    ot_config = ot_config or {}
    if loss_type == "FM-OT":
        return lambda vf, rng, x, mask=None, cond=None: fm_ot_loss(
            vf, rng, x, mask, cond, sigma=sigma, criterion=criterion
        )
    if loss_type == "CFM":
        return lambda vf, rng, x, mask=None, cond=None: cfm_loss(
            vf, rng, x, mask, cond, sigma=sigma, criterion=criterion
        )
    if loss_type == "reflow":
        return lambda vf, rng, x, mask=None, cond=None: reflow_loss(
            vf, rng, x, mask, cond, sigma=sigma, criterion=criterion
        )
    if loss_type == "CFM-OT":
        return lambda vf, rng, x, mask=None, cond=None: cfm_ot_loss(
            vf, rng, x, mask, cond, sigma=sigma, criterion=criterion, **ot_config
        )
    if loss_type == "diffusion":
        sched = VPDiffusionSchedule(**diff_config)
        return lambda vf, rng, x, mask=None, cond=None: diffusion_loss(
            vf, rng, x, mask, cond, criterion=criterion, schedule=sched
        )
    if loss_type == "droid":
        return lambda vf, rng, x, mask=None, cond=None: droid_loss(
            vf, rng, x, mask, cond, criterion=criterion, t_max=droid_t_max
        )
    raise NotImplementedError(f"Loss type {loss_type} not implemented.")
