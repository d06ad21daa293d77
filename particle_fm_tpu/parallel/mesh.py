"""Device mesh + sharding helpers.

The reference's only parallelism is Lightning DDP (configs/trainer/ddp.yaml);
the TPU-native equivalent is a 1-D data mesh with the batch sharded over it
and parameters replicated. XLA inserts the gradient all-reduce (psum over ICI)
when the jitted train step consumes sharded batches and produces replicated
grads — no hand-written collectives.

For multi-host TPU slices, call `jax.distributed.initialize()` before
`make_mesh()`; the same jitted program runs SPMD across hosts (ICI intra-
slice, DCN inter-slice). "Rank zero" host-side work should be gated on
`jax.process_index() == 0`.

A second mesh axis ("model") is supported for tensor-parallel experiments;
the set networks are small enough that pure DP is optimal at reference scale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(enable: bool | None = None) -> bool:
    """Multi-host entry: call `jax.distributed.initialize()` when requested.

    Enablement: explicit `enable=True` (config `trainer.multihost`) or env
    `PFM_MULTIHOST=1`. In a single-process run (the default, and all tests)
    this is a no-op returning False — behavior is unchanged. On a multi-host
    TPU slice, every host runs the same program; after initialize(),
    jax.devices() spans the slice, the same jitted SPMD step runs with
    gradient all-reduce over ICI (and DCN across slices), and host-side work
    (checkpoints, loggers) is gated on process_index()==0.

    Reference behavior: Lightning DDP num_nodes (configs/trainer/ddp.yaml).
    """
    import os

    if enable is None:
        enable = os.environ.get("PFM_MULTIHOST", "0") == "1"
    if not enable:
        return False
    # Idempotency must NOT probe jax.process_count(): that call initializes
    # the XLA backend, after which jax.distributed.initialize() raises
    # ("must be called before any JAX calls"). Inspect the distributed
    # client state directly instead.
    try:
        from jax._src import distributed as _dist

        already = getattr(_dist.global_state, "client", None) is not None
    except (ImportError, AttributeError):
        # private module layout changed across a JAX upgrade: fall back to
        # attempting initialization and treating "already initialized" as ok
        already = False
    if already:
        return True
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return True


def is_rank_zero() -> bool:
    """True on the host that should write checkpoints/logs (rank 0)."""
    return jax.process_index() == 0


def make_mesh(
    data: int | None = None, model: int = 1, devices=None
) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if x is not None else None, batch
    )


def stacked_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (K, B, ...) stacked-epoch batches: scan axis replicated,
    batch axis over 'data'. Used by BOTH make_train_epoch's in_shardings and
    the trainer's device placement — keep them coupled here."""
    return NamedSharding(mesh, P(None, "data"))


def perm_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (E, K, B) fused-epoch permutation indices: epoch and
    scan axes replicated, batch axis over 'data' (so the in-scan gather
    lands each device's batch shard locally for uniform shuffles)."""
    return NamedSharding(mesh, P(None, None, "data"))


def sp_sharding(mesh: Mesh) -> NamedSharding:
    """Sequence parallelism: shard (batch, particle) over ('data', 'model').

    The set axis splits across the 'model' mesh axis; XLA inserts the psum
    for every particle-axis reduction (EPiC masked mean/sum pooling, attention
    softmax denominators) over ICI. Beyond reference (SURVEY 2.8: the
    reference has no sequence parallelism; longest set = 558 particles)."""
    return NamedSharding(mesh, P("data", "model"))


def shard_batch_sp(batch, mesh: Mesh):
    """Place (x, mask, cond): rank>=3 arrays shard (batch, particle) over
    ('data', 'model'); lower-rank arrays (cond) shard batch only."""
    seq = sp_sharding(mesh)
    dat = batch_sharding(mesh)

    def place(x):
        if x is None:
            return None
        return jax.device_put(x, seq if x.ndim >= 3 else dat)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
