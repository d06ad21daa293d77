"""Worker process for the real 2-process multi-host test.

Each process owns 2 virtual CPU devices and joins a gloo-backed
jax.distributed cluster (the CPU analogue of one TPU host per slice —
cross-process collectives ride gloo the way TPU hosts ride DCN). The
processes run the SAME SPMD program: a jitted DP train step over a 4-device
global mesh with the batch sharded over 'data'. Gradient all-reduce crosses
the process boundary; identical final parameter checksums on every process
prove the collective ran correctly.

Usage: python tests/helpers/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np
import jax.numpy as jnp

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.mesh import is_rank_zero, make_mesh, shard_batch
from particle_fm_tpu.parallel.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 2 * nprocs, jax.device_count()
assert len(jax.local_devices()) == 2
assert is_rank_zero() == (pid == 0)

model = FlowMatchingModel(
    model="epic", features=3, num_particles=4, hidden_dim=8, layers=1,
    latent=2, loss_type="CFM",
)
opt = make_optimizer(lr=1e-3)
state = create_train_state(model, jax.random.PRNGKey(0), opt)
mesh = make_mesh()
step = make_train_step(model, opt, mesh=mesh)

# identical host data on every process (same seed): device_put with a global
# sharding extracts each process's addressable shards
rng = np.random.default_rng(7)
for i in range(3):
    x = rng.standard_normal((8, 4, 3)).astype(np.float32)
    m = np.ones((8, 4, 1), np.float32)
    batch = shard_batch((x, m, None), mesh)
    state, loss = step(state, jax.random.PRNGKey(i), *batch)

# process-independent checksum of the (replicated) params after 3 steps
leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
checksum = float(sum(np.abs(l).sum() for l in leaves))
print(f"MULTIHOST_OK pid={pid} loss={float(loss):.6f} checksum={checksum:.8f}")
