"""Rectified-flow (ReFlow) distillation: straighten a trained flow for
few-step sampling.

Beyond-reference capability (the reference always samples with 100-200 ODE
steps; its fastest path is the midpoint solver at NFE 198,
configs/callbacks/jetnet_eval.yaml:16-20). ReFlow (Liu et al.,
arXiv:2209.03003 "Flow Straight and Fast") retrains the SAME vector-field
architecture on the deterministic coupling (x0, x1) induced by the teacher's
own ODE: x0 is the exact prior noise, x1 the teacher's integrated sample.
Because the coupling is a deterministic transport map, the rectified field's
marginal paths become nearly straight lines — a student initialized from the
teacher converges in a few hundred epochs and samples with 1-8 Euler steps
at quality the teacher needs ~100 steps to reach.

TPU design: pair generation is a jitted scan-batched sampler (the same
machinery as `FlowMatchingModel.sample`, but returning the (noise, sample)
pair), the student trains through the standard scanned-epoch Trainer, and
the whole pipeline stays in the datamodule's normalized space — pairs are
packed as concat(x1, x0) along the feature axis so the existing
(x, mask, cond) batch contract and every parallelism strategy apply
unchanged (losses/flow_matching.py::reflow_loss splits them).

Driven by scripts/reflow.py; unit-tested in tests/test_reflow.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.samplers.ode import odeint_fixed


def generate_pairs(
    model,
    variables: dict,
    n_pairs: int,
    mask: np.ndarray | None = None,
    cond: np.ndarray | None = None,
    batch_size: int = 1024,
    ode_solver: str = "midpoint",
    ode_steps: int = 100,
    seed: int = 0,
    verbose: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Integrate the teacher ODE from fresh prior noise, keeping both ends.

    mask/cond (optional) are pools to resample rows from (with replacement),
    so the pair distribution matches the teacher's conditioning distribution.
    Returns (x1, x0, mask, cond) numpy arrays in normalized space, where
    x1 = teacher sample and x0 = the exact noise it was integrated from.
    """
    if model.loss_type not in ("FM-OT", "CFM", "CFM-OT", "reflow", "diffusion"):
        # any teacher whose sampler integrates an ODE from a N(0,1) prior can
        # be rectified: flow-matching teachers directly, diffusion teachers
        # through the probability-flow ODE (make_drift's -0.5*beta*(x-eps/sigma)
        # transform). droid's VE prior is t_max*N(0,1), which the reflow
        # student's N(0,1) sampler cannot reproduce.
        raise ValueError(
            "reflow pair generation requires an ODE teacher with a N(0,1) "
            f"prior; got loss_type={model.loss_type!r}"
        )
    if model.use_normaliser:
        raise NotImplementedError(
            "reflow pairs must live in the network's input space; teachers "
            "with in-model normalisation are not supported"
        )
    rng_np = np.random.default_rng(seed)
    idx = rng_np.integers(0, len(mask) if mask is not None else len(cond), n_pairs) \
        if (mask is not None or cond is not None) else None
    mask_all = mask[idx] if mask is not None else None
    cond_all = cond[idx] if cond is not None else None

    module, vars_f = model.fold_weight_norm(variables)

    @jax.jit
    def gen_batch(rng, mask_b, cond_b):
        z = jax.random.normal(rng, (batch_size, model.num_particles, model.features))
        if mask_b is not None:
            z = z * mask_b
        x = z
        for k in reversed(range(model.n_transforms)):
            drift = model.make_drift(
                vars_f, cond=cond_b, mask=mask_b, flow_idx=k, module=module
            )
            x = odeint_fixed(drift, x, 1.0, 0.0, ode_steps=ode_steps, method=ode_solver)
        if mask_b is not None:
            x = x * mask_b
        return z, x

    x0s, x1s = [], []
    key = jax.random.PRNGKey(seed)
    n_batches = (n_pairs + batch_size - 1) // batch_size
    for b in range(n_batches):
        key, sub = jax.random.split(key)
        s = b * batch_size
        e = min(s + batch_size, n_pairs)
        # pad the remainder batch to the jitted batch size
        sel = np.arange(s, e)
        if len(sel) < batch_size:
            sel = np.concatenate([sel, np.full(batch_size - len(sel), s)])
        mb = jnp.asarray(mask_all[sel]) if mask_all is not None else None
        cb = jnp.asarray(cond_all[sel]) if cond_all is not None else None
        z, x = gen_batch(sub, mb, cb)
        x0s.append(np.asarray(z[: e - s]))
        x1s.append(np.asarray(x[: e - s]))
        if verbose and (b % 10 == 0 or b == n_batches - 1):
            print(f"[reflow] pairs {e}/{n_pairs}")
    x1 = np.concatenate(x1s).astype(np.float32)
    x0 = np.concatenate(x0s).astype(np.float32)
    return x1, x0, mask_all, cond_all


def straightness(
    model, variables: dict, x1: np.ndarray, x0: np.ndarray,
    mask: np.ndarray | None, cond: np.ndarray | None, n_times: int = 8,
) -> float:
    """Mean squared deviation of the learned field from the straight-line
    field on the given coupling: E_t ||v(t, x_t) - (x0 - x1)||^2 (masked).
    0 for a perfectly rectified (one-step) flow; the reflow paper's S(Z)."""
    module, vars_f = model.fold_weight_norm(variables)
    x1j, x0j = jnp.asarray(x1), jnp.asarray(x0)
    m = jnp.asarray(mask) if mask is not None else jnp.ones_like(x1j[..., :1])
    c = jnp.asarray(cond) if cond is not None else None

    @jax.jit
    def dev():
        u = (x0j - x1j) * m
        total = 0.0
        for i in range(n_times):
            t = jnp.full((x1j.shape[0],), (i + 0.5) / n_times)
            tb = t[:, None, None]
            y = (1.0 - tb) * x1j + tb * x0j
            v = module.apply(vars_f, t, y, cond=c, mask=m)
            total = total + jnp.sum(jnp.square((v - u) * m)) / jnp.sum(m)
        return total / n_times

    return float(dev())


def student_model(teacher_model, sigma: float | None = None):
    """The student shares the teacher's architecture; only the objective
    (and optionally sigma) changes."""
    return dataclasses.replace(
        teacher_model,
        loss_type="reflow",
        sigma=teacher_model.sigma if sigma is None else sigma,
    )
