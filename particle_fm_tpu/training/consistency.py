"""Consistency distillation: 1-2 step sampling from a trained flow teacher.

Beyond-reference capability (the reference's fastest sampler is the midpoint
solver at NFE 100-200, configs/callbacks/jetnet_eval.yaml:16-20; its only
few-step path would be truncating the ODE, which collapses quality).
Consistency models (Song et al., arXiv:2303.01469) learn a map g(y_t, t) that
sends ANY point on a probability-flow trajectory straight to the trajectory's
data endpoint, so sampling is a single network evaluation — with an optional
"re-noise and map again" refinement ladder.

This implementation distills the repo's flow-matching teachers, whose paths
are the straight interpolant y_t = (1-t)x + t z with t=1 noise and t=0 data
(losses/flow_matching.py conventions). Two choices exploit that structure:

  * Parameterization. The student reuses the teacher's vector-field
    architecture F_theta unchanged:

        g_theta(y, t) = y - t * F_theta(t, y)

    The consistency boundary condition g(y, 0) = y holds EXACTLY (no
    c_skip/c_out schedule needed), and at initialization from teacher
    weights g is the teacher's one-step Euler jump to t=0 — already a
    coarse sampler, so distillation starts from a meaningful map instead
    of noise. For a perfectly straight (rectified) field, g is exact.

  * Targets. Standard CD: draw data x, noise z, a random grid segment
    [t_n, t_{n+1}], form y_{t_{n+1}} on the interpolant, take ONE Heun step
    of the TEACHER ODE down to t_n, and pull the student's prediction at
    t_{n+1} toward a stop-gradient target network's prediction at t_n.
    The target parameters are an EMA of the student (mu=0 recovers the
    simpler self-target variant of later consistency papers).

Losses use the masked pseudo-Huber metric sqrt(d^2 + c^2) - c recommended by
"Improved techniques for training consistency models" (arXiv:2310.14189) —
at particle-cloud scale it is markedly more stable than MSE for the
single-step map, which must cover the full noise-to-data displacement.

TPU design: the entire distillation step (interpolant construction, teacher
Heun step, online/target forward, grad, Adam update, target EMA) jits into
one fused XLA program; the drive loop feeds index-sampled host batches like
the Trainer's scanned-epoch path. Sampling is a single jitted program per
(n_samples, steps) shape.

Driven by scripts/consistency.py; unit-tested in tests/test_consistency.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _check_supported(model) -> None:
    if model.loss_type not in ("FM-OT", "CFM", "CFM-OT", "reflow"):
        raise ValueError(
            "consistency distillation needs a straight-interpolant flow "
            f"teacher (FM-OT/CFM/CFM-OT/reflow); got {model.loss_type!r}"
        )
    if model.n_transforms != 1:
        raise NotImplementedError("consistency distillation requires n_transforms=1")
    if model.use_normaliser:
        raise NotImplementedError(
            "consistency students live in the network input space; teachers "
            "with in-model normalisation are not supported"
        )
    if getattr(model, "self_cond", False):
        raise NotImplementedError("self-conditioning teachers are not supported")


def _g(module, variables, t, y, cond, mask):
    """Consistency function g(y, t) = y - t * F(t, y): exact at t=0."""
    v = module.apply(variables, t, y, cond=cond, mask=mask)
    out = y - t[:, None, None] * v
    if mask is not None:
        out = out * mask
    return out


def time_grid(n_grid: int, t_min: float = 0.002) -> np.ndarray:
    """Discretization t_0 < ... < t_N with t_0 = 0 (the exact boundary) and
    the remaining knots spread over [t_min, 1]. Segment draws use indices
    0..N-1; a draw of segment 0 trains directly against the boundary."""
    ts = np.linspace(t_min, 1.0, n_grid)
    return np.concatenate([[0.0], ts]).astype(np.float32)


@dataclasses.dataclass
class DistillResult:
    variables: dict       # student {'params': ..., extra collections}
    target_variables: dict
    losses: np.ndarray    # per-step training loss


def distill_consistency(
    model,
    teacher_variables: dict,
    x: np.ndarray,
    mask: np.ndarray | None = None,
    cond: np.ndarray | None = None,
    *,
    steps: int = 4000,
    batch_size: int = 256,
    lr: float = 1e-4,
    warmup: int = 200,
    n_grid: int = 16,
    t_min: float = 0.002,
    target_ema: float = 0.95,
    huber_c: float = 0.15,
    seed: int = 0,
    verbose: bool = False,
    init_variables: dict | None = None,
) -> DistillResult:
    """Distill `model` (weights `teacher_variables`) into a consistency
    student over the data tensors (x, mask, cond) in NORMALIZED space.

    Returns the student variables (same pytree structure as the teacher's,
    so every downstream tool — checkpointing, generate_data via
    consistency_sample, parallelism shardings — applies unchanged).

    `init_variables` warm-starts the STUDENT from a previous distillation
    stage (the teacher always provides the ODE targets), enabling the
    curriculum of "Improved techniques for training consistency models"
    (arXiv:2310.14189): distill at a coarse n_grid first, then continue the
    same student at a finer grid. `huber_c` should scale with the data std
    (the datamodules normalize to sigma=5, hence the 0.15 default ~= 0.03*5).
    """
    _check_supported(model)
    module = model.module
    # teacher forward uses the weight-norm-folded twin (inference-only);
    # the student trains through the original parameterization
    t_module, t_vars = model.fold_weight_norm(teacher_variables)
    extra = {k: v for k, v in teacher_variables.items() if k != "params"}

    grid = jnp.asarray(time_grid(n_grid, t_min))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1))
    opt = optax.adam(sched)

    start = init_variables if init_variables is not None else teacher_variables
    params0 = jax.tree_util.tree_map(jnp.asarray, start["params"])
    target0 = jax.tree_util.tree_map(jnp.array, params0)
    opt_state0 = opt.init(params0)

    # Data tensors ride as explicit jit ARGUMENTS, not closure constants:
    # closed-over device arrays are embedded into the lowered module as MLIR
    # constants, which forces a full device->host materialization of the
    # training set at trace time (observed to wedge the tunneled single-chip
    # relay on large transfers). As arguments they stay device-resident.
    xj = jax.device_put(jnp.asarray(x))
    mj = jax.device_put(jnp.asarray(mask)) if mask is not None else None
    cj = jax.device_put(jnp.asarray(cond)) if cond is not None else None

    def loss_fn(params, target, rng, xb, mb, cb):
        rng_seg, rng_z = jax.random.split(rng)
        seg = jax.random.randint(rng_seg, (xb.shape[0],), 0, n_grid)
        t_lo, t_hi = grid[seg], grid[seg + 1]
        z = jax.random.normal(rng_z, xb.shape, xb.dtype)
        th = t_hi[:, None, None]
        y_hi = (1.0 - th) * xb + th * z
        if mb is not None:
            y_hi = y_hi * mb
        # one Heun step of the teacher probability-flow ODE: t_hi -> t_lo
        d1 = t_module.apply(t_vars, t_hi, y_hi, cond=cb, mask=mb)
        dt = (t_lo - t_hi)[:, None, None]
        y_eul = y_hi + dt * d1
        d2 = t_module.apply(t_vars, t_lo, y_eul, cond=cb, mask=mb)
        y_lo = y_hi + dt * 0.5 * (d1 + d2)
        if mb is not None:
            y_lo = y_lo * mb

        g_online = _g(module, {"params": params, **extra}, t_hi, y_hi, cb, mb)
        g_target = _g(module, {"params": target, **extra}, t_lo, y_lo, cb, mb)
        g_target = jax.lax.stop_gradient(g_target)
        d = g_online - g_target
        ph = jnp.sqrt(jnp.square(d) + huber_c**2) - huber_c
        m = mb if mb is not None else jnp.ones_like(xb[..., :1])
        return jnp.sum(ph * m) / jnp.sum(m)

    @jax.jit
    def step(params, target, opt_state, rng, idx, xj, mj, cj):
        xb = xj[idx]
        mb = mj[idx] if mj is not None else None
        cb = cj[idx] if cj is not None else None
        loss, grads = jax.value_and_grad(loss_fn)(params, target, rng, xb, mb, cb)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target = jax.tree_util.tree_map(
            lambda a, b: target_ema * a + (1.0 - target_ema) * b, target, params
        )
        return params, target, opt_state, loss

    params, target, opt_state = params0, target0, opt_state0
    rng_np = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    losses = np.zeros(steps, np.float32)
    n = len(x)
    for s in range(steps):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(rng_np.integers(0, n, batch_size))
        params, target, opt_state, loss = step(
            params, target, opt_state, sub, idx, xj, mj, cj
        )
        losses[s] = float(loss)
        if verbose and (s % max(steps // 20, 1) == 0 or s == steps - 1):
            print(f"[consistency] step {s}/{steps} loss {losses[s]:.5f}")
    student = {"params": jax.device_get(params), **extra}
    tgt = {"params": jax.device_get(target), **extra}
    return DistillResult(variables=student, target_variables=tgt, losses=losses)


def distill_direct(
    model,
    teacher_variables: dict,
    x: np.ndarray,
    mask: np.ndarray | None = None,
    cond: np.ndarray | None = None,
    *,
    steps: int = 4000,
    batch_size: int = 256,
    lr: float = 1e-4,
    warmup: int = 200,
    solver_steps: int = 8,
    t_min: float = 0.002,
    huber_c: float = 0.15,
    seed: int = 0,
    verbose: bool = False,
    init_variables: dict | None = None,
) -> DistillResult:
    """Direct trajectory distillation: regress g(y_t, t) onto the teacher's
    FULL probability-flow solve y_t -> t=0 (midpoint, `solver_steps` steps),
    with t ~ U(t_min, 1) per sample.

    Unlike consistency distillation there is no bootstrap chain and no target
    network — the target is a deterministic function of (x, z, t), so the
    regression is well-posed and stable at small step budgets. Costs
    2*solver_steps teacher NFE per example instead of CD's 2, but the teacher
    forward is the cheap folded-weight inference path. This is the online
    analogue of ReFlow's pair distillation (training/reflow.py) that never
    materializes a pair set and learns the map at EVERY t (so the re-noise
    multistep sampler in consistency_sample applies unchanged).
    """
    _check_supported(model)
    module = model.module
    t_module, t_vars = model.fold_weight_norm(teacher_variables)
    extra = {k: v for k, v in teacher_variables.items() if k != "params"}

    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1))
    opt = optax.adam(sched)
    start = init_variables if init_variables is not None else teacher_variables
    params0 = jax.tree_util.tree_map(jnp.asarray, start["params"])
    opt_state0 = opt.init(params0)

    # explicit jit args, not closure constants — see distill_consistency
    xj = jax.device_put(jnp.asarray(x))
    mj = jax.device_put(jnp.asarray(mask)) if mask is not None else None
    cj = jax.device_put(jnp.asarray(cond)) if cond is not None else None

    def teacher_solve(t, y, cb, mb):
        """Midpoint solve of dy/ds = F(s, y) from s=t down to s=0 in
        `solver_steps` equal per-sample steps (t is per-sample)."""
        dt = -(t / solver_steps)[:, None, None]

        def body(i, y):
            tau = t * (1.0 - i.astype(t.dtype) / solver_steps)
            k1 = t_module.apply(t_vars, tau, y, cond=cb, mask=mb)
            y_mid = y + 0.5 * dt * k1
            t_mid = tau + 0.5 * dt[:, 0, 0]
            k2 = t_module.apply(t_vars, t_mid, y_mid, cond=cb, mask=mb)
            y = y + dt * k2
            return y * mb if mb is not None else y

        return jax.lax.fori_loop(0, solver_steps, body, y)

    def loss_fn(params, rng, xb, mb, cb):
        rng_t, rng_z = jax.random.split(rng)
        t = jax.random.uniform(rng_t, (xb.shape[0],), xb.dtype, t_min, 1.0)
        z = jax.random.normal(rng_z, xb.shape, xb.dtype)
        y_t = (1.0 - t[:, None, None]) * xb + t[:, None, None] * z
        if mb is not None:
            y_t = y_t * mb
        target = jax.lax.stop_gradient(teacher_solve(t, y_t, cb, mb))
        g = _g(module, {"params": params, **extra}, t, y_t, cb, mb)
        d = g - target
        ph = jnp.sqrt(jnp.square(d) + huber_c**2) - huber_c
        m = mb if mb is not None else jnp.ones_like(xb[..., :1])
        return jnp.sum(ph * m) / jnp.sum(m)

    @jax.jit
    def step(params, opt_state, rng, idx, xj, mj, cj):
        xb = xj[idx]
        mb = mj[idx] if mj is not None else None
        cb = cj[idx] if cj is not None else None
        loss, grads = jax.value_and_grad(loss_fn)(params, rng, xb, mb, cb)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state = params0, opt_state0
    rng_np = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    losses = np.zeros(steps, np.float32)
    n = len(x)
    for s in range(steps):
        key, sub = jax.random.split(key)
        idx = jnp.asarray(rng_np.integers(0, n, batch_size))
        params, opt_state, loss = step(params, opt_state, sub, idx, xj, mj, cj)
        losses[s] = float(loss)
        if verbose and (s % max(steps // 20, 1) == 0 or s == steps - 1):
            print(f"[consistency] step {s}/{steps} loss {losses[s]:.5f}")
    student = {"params": jax.device_get(params), **extra}
    return DistillResult(variables=student, target_variables=student, losses=losses)


def consistency_sample(
    model,
    variables: dict,
    rng: jax.Array,
    n_samples: int | None = None,
    cond: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    steps: int = 1,
    ts: Sequence[float] | None = None,
) -> jnp.ndarray:
    """Generate with a consistency student: x = g(z, 1), then `steps`-1
    re-noise/map refinements at intermediate times `ts` (default: the
    uniform ladder linspace(1, 0, steps+1)[1:-1], e.g. steps=2 -> [0.5]).

    NFE = steps network evaluations. Matches model.sample's contract
    (masked prior, cond/mask batch shapes, normalized space)."""
    _check_supported(model)
    if n_samples is None:
        n_samples = cond.shape[0] if cond is not None else mask.shape[0]
    num_points = mask.shape[1] if mask is not None else model.num_particles
    if ts is None:
        ts = list(np.linspace(1.0, 0.0, steps + 1)[1:-1])
    module, vars_f = model.fold_weight_norm(variables)

    @jax.jit
    def run(key, cond, mask):
        kz, kr = jax.random.split(key)
        z = jax.random.normal(kz, (n_samples, num_points, model.features))
        if mask is not None:
            z = z * mask
        t1 = jnp.ones((n_samples,), z.dtype)
        x = _g(module, vars_f, t1, z, cond, mask)
        for t_mid in ts:
            kr, kz2 = jax.random.split(kr)
            z2 = jax.random.normal(kz2, x.shape, x.dtype)
            tm = jnp.full((n_samples,), t_mid, x.dtype)
            y = (1.0 - t_mid) * x + t_mid * z2
            if mask is not None:
                y = y * mask
            x = _g(module, vars_f, tm, y, cond, mask)
        return x

    return run(rng, cond, mask)
