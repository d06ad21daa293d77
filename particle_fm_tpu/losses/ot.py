"""Minibatch optimal-transport pairing for OT-CFM.

The reference pairs noise particles with data particles inside each set by
solving an exact EMD per batch element on the host, in a Python loop
(particle_fm/models/components/losses.py:161-204). On TPU that's a
synchronization disaster, so we provide two jit-compatible strategies:

  - "sinkhorn": log-domain Sinkhorn on device (default). With uniform
    marginals and small regularization the plan concentrates on the optimal
    permutation; we harden it into a TRUE permutation by greedy masked
    argmax (N iterations of pick-global-max, mask row+col). Row-argmax alone
    is NOT a permutation — collided rows drop some data particles entirely,
    which systematically biases the per-set marginal (measured: W1M 3x worse
    on an OT-CFM training run). Fully on-TPU and batched.
  - "exact": Hungarian assignment via `jax.pure_callback` into
    scipy.optimize.linear_sum_assignment (host). Exact but synchronous.

With uniform marginals over equal-size sets, the exact OT plan is a
permutation (Birkhoff), so pairing via assignment matches what sampling the
reference's `pot.emd` plan converges to. Note: the reference additionally
resamples N pairs *with replacement* from the plan, and (a bug) applies the
last batch element's permuted mask to the whole batch — we do not replicate
either; each set uses its own correctly-permuted mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_sq_dists(x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Batched squared euclidean cost: (B, N, F) x (B, M, F) -> (B, N, M)."""
    # ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b  — keeps the MXU busy via the matmul
    sq0 = jnp.sum(x0**2, axis=-1)[..., :, None]
    sq1 = jnp.sum(x1**2, axis=-1)[..., None, :]
    cross = jnp.einsum("bnf,bmf->bnm", x0, x1)
    return jnp.maximum(sq0 + sq1 - 2.0 * cross, 0.0)


def sinkhorn_plan(
    cost: jnp.ndarray,
    reg: float = 0.01,
    n_iters: int = 50,
) -> jnp.ndarray:
    """Log-domain Sinkhorn with uniform marginals. cost: (B, N, M) -> plan (B, N, M)."""
    b, n, m = cost.shape
    log_a = -jnp.log(n) * jnp.ones((b, n))
    log_b = -jnp.log(m) * jnp.ones((b, m))
    log_k = -cost / reg

    def body(carry, _):
        f, g = carry
        f = log_a - jax.nn.logsumexp(log_k + g[:, None, :], axis=2)
        g = log_b - jax.nn.logsumexp(log_k + f[:, :, None], axis=1)
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        body, (jnp.zeros((b, n)), jnp.zeros((b, m))), None, length=n_iters
    )
    return jnp.exp(log_k + f[:, :, None] + g[:, None, :])


def greedy_perm_from_plan(plan: jnp.ndarray) -> jnp.ndarray:
    """Harden a square (B, N, N) transport plan into a true permutation
    (B, N). Fast path: per-row argmax, accepted when it already IS a
    permutation for every set (the common case for sharp Sinkhorn plans).
    Fallback (lax.cond, so it only executes when some set collides): N
    rounds of take-the-globally-largest-entry then mask its row+column —
    O(N^2 * N * B) plan reads, fine at <= a few hundred particles.
    Guarantees every data index is used exactly once, unlike raw per-row
    argmax (collisions drop data particles and bias the set marginal)."""
    b, n, m = plan.shape
    if n != m:
        raise ValueError(
            f"greedy_perm_from_plan needs a square plan (got N={n}, M={m}): "
            "a permutation between unequal-size sets does not exist"
        )
    neg = jnp.asarray(-jnp.inf, plan.dtype)
    rows = jnp.arange(b)

    def greedy(p0):
        def body(state, _):
            p, out = state
            flat_idx = jnp.argmax(p.reshape(b, n * m), axis=-1)
            i, j = flat_idx // m, flat_idx % m
            out = out.at[rows, i].set(j.astype(jnp.int32))
            p = p.at[rows, i, :].set(neg)
            p = p.at[rows, :, j].set(neg)
            return (p, out), None

        (_, out), _ = jax.lax.scan(
            body, (p0, jnp.zeros((b, n), jnp.int32)), None, length=n
        )
        return out

    row = jnp.argmax(plan, axis=-1).astype(jnp.int32)
    counts = jax.vmap(lambda r: jnp.bincount(r, length=m))(row)
    is_perm = jnp.all(counts == 1)
    return jax.lax.cond(is_perm, lambda p: row, greedy, plan)


def _hungarian_host(cost: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    out = np.empty(cost.shape[:2], dtype=np.int32)
    for k in range(cost.shape[0]):
        _, col = linear_sum_assignment(cost[k])
        out[k] = col.astype(np.int32)
    return out


@functools.partial(jax.jit, static_argnames=("method", "reg", "n_iters"))
def ot_pair_indices(
    x0: jnp.ndarray,
    x1: jnp.ndarray,
    method: str = "sinkhorn",
    reg: float = 0.01,
    n_iters: int = 50,
) -> jnp.ndarray:
    """For each set, the permutation j(i) pairing x0[:, i] with x1[:, j(i)].

    Cost is per-set squared distance normalized by its max (reference
    normalizes M[k] /= M[k].max() before solving, losses.py:179).
    Returns indices of shape (B, N) into x1's particle axis.
    """
    cost = pairwise_sq_dists(x0, x1)
    cost = cost / jnp.maximum(jnp.max(cost, axis=(1, 2), keepdims=True), 1e-12)
    if method == "sinkhorn":
        plan = sinkhorn_plan(cost, reg=reg, n_iters=n_iters)
        return greedy_perm_from_plan(plan)
    elif method == "exact":
        return jax.pure_callback(
            _hungarian_host,
            jax.ShapeDtypeStruct(cost.shape[:2], jnp.int32),
            cost,
            vmap_method="sequential",
        )
    else:
        raise ValueError(f"unknown OT pairing method: {method}")


def gather_particles(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather particles along axis 1: x (B, N, F), idx (B, N) -> (B, N, F)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)
