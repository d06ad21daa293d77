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


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
