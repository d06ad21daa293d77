"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD.

The reference has no FSDP (its only strategy is Lightning DDP,
configs/trainer/ddp.yaml) — at reference model sizes (~1M params) pure DP is
optimal. This exists for scaling headroom: shard every parameter, its EMA
twin, and its Adam moments over the 'data' mesh axis; XLA's SPMD partitioner
then all-gathers weights just-in-time in forward/backward and reduce-scatters
gradients — the classic ZeRO-3 schedule, emitted by the compiler instead of
hand-written (jax-ml.github.io/scaling-book recipe: annotate shardings, let
XLA insert the collectives).

Per-leaf placement is by shape: the largest dimension divisible by the data
axis is sharded; leaves with no such dimension (biases smaller than the axis,
scalars like Adam's count) stay replicated. Optimizer moments mirror the
param layout automatically because mu/nu have identical shapes.

Usage:
    mesh = make_mesh(data=8)
    state = shard_state_fsdp(state, mesh)
    train_step = make_train_step(model, opt, mesh=mesh)
    # the step's state in_shardings inherit from the placed arrays,
    # so the same jitted program runs DP or FSDP depending on placement.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, n: int, axis: str = "data") -> P:
    """Shard the largest dimension divisible by the axis size; else replicate."""
    dims = list(shape)
    best = None
    for i, d in sorted(enumerate(dims), key=lambda t: -t[1]):
        if d >= n and d % n == 0:
            best = i
            break
    if best is None:
        return P()
    parts = [None] * len(dims)
    parts[best] = axis
    return P(*parts)


def fsdp_shardings(tree, mesh: Mesh, axis: str = "data"):
    """NamedSharding pytree for `tree`, per-leaf by shape (see fsdp_spec)."""
    n = mesh.shape[axis]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, fsdp_spec(np.shape(leaf), n, axis)), tree
    )


def shard_state_fsdp(state, mesh: Mesh, axis: str = "data"):
    """Place a TrainState with every large tensor sharded over `axis`.

    Params, EMA params, and optimizer moments all shard; norm_stats and the
    step counter replicate (tiny)."""
    repl = NamedSharding(mesh, P())

    def place(tree):
        return jax.tree_util.tree_map(
            jax.device_put, tree, fsdp_shardings(tree, mesh, axis)
        )

    return state.replace(
        params=place(state.params),
        ema_params=place(state.ema_params),
        opt_state=place(state.opt_state),
        norm_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.norm_stats
        ),
        step=jax.device_put(state.step, repl),
    )
