"""Worker process for the real 2-process multi-host tests.

Each process owns 2 virtual CPU devices and joins a gloo-backed
jax.distributed cluster (the CPU analogue of one TPU host per slice —
cross-process collectives ride gloo the way TPU hosts ride DCN). The
processes run the SAME SPMD program over a 4-device global mesh; anything
that must cross the process boundary (gradient all-reduce, checkpoint
files on shared storage, FSDP parameter shards, sharded sampling) is the
thing under test. Reference counterpart: tests/test_train.py:52-61
(2-process ddp_spawn CPU simulation) + Lightning's multi-node contract
(rank-zero-only checkpoint/logging IO).

Usage: python tests/helpers/multihost_worker.py <process_id> <num_processes>
           <port> [scenario] [workdir]

Scenarios:
  train  — 3 jitted DP train steps; prints a params checksum (identical on
           every process iff the cross-process gradient all-reduce ran).
  ckpt   — train steps, COLLECTIVE CheckpointManager save (every process
           calls; orbax gates the bytes to the primary host), device
           barrier, then EVERY process restores from the shared path and
           prints the restored-params checksum.
  sample — mesh-sharded model.sample vs the same integration on this
           process's local device 0; each process asserts its addressable
           shards equal the corresponding local slices.
  fsdp   — 3 train steps with ZeRO-3 (params/moments sharded over 'data'
           across BOTH processes); asserts real cross-process placement,
           all-gathers the params, prints the checksum (driver compares it
           to the DP scenario's).
"""

import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
scenario = sys.argv[4] if len(sys.argv) > 4 else "train"
workdir = sys.argv[5] if len(sys.argv) > 5 else "."

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

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
mesh = make_mesh()


def _checksum(tree) -> float:
    leaves = jax.tree_util.tree_leaves(jax.device_get(tree))
    return float(sum(np.abs(l).sum() for l in leaves))


def _gather(tree):
    """All-gather a (possibly cross-process-sharded) tree to replicated."""
    repl = NamedSharding(mesh, P())
    return jax.jit(lambda t: t, out_shardings=repl)(tree)


def _train_batches():
    # identical host data on every process (same seed): device_put with a
    # global sharding extracts each process's addressable shards
    rng = np.random.default_rng(7)
    for i in range(3):
        x = rng.standard_normal((8, 4, 3)).astype(np.float32)
        m = np.ones((8, 4, 1), np.float32)
        yield i, shard_batch((x, m, None), mesh)


def run_train():
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    step = make_train_step(model, opt, mesh=mesh)
    for i, batch in _train_batches():
        state, loss = step(state, jax.random.PRNGKey(i), *batch)
    print(f"MULTIHOST_OK pid={pid} loss={float(loss):.6f} "
          f"checksum={_checksum(state.params):.8f}")


def run_ckpt():
    """COLLECTIVE orbax save across processes -> barrier -> restore on all.

    Orbax saves are collective: every process calls save (the trainer makes
    the same calls on every rank, training/trainer.py), orbax barriers
    internally, and the primary-host gating of the actual bytes happens
    INSIDE orbax — replicated arrays are written once from process 0. The
    write crosses the process boundary through the (shared) filesystem
    exactly like a multi-host run on shared storage; every process then
    restores the same bytes into its own fresh TrainState.
    """
    from particle_fm_tpu.training.checkpoint import CheckpointManager, restore_state

    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    step = make_train_step(model, opt, mesh=mesh)
    for i, batch in _train_batches():
        state, loss = step(state, jax.random.PRNGKey(i), *batch)
    saved_sum = _checksum(state.params)

    ckpt_dir = os.path.join(workdir, "ckpt")
    mgr = CheckpointManager(ckpt_dir, async_save=False)
    assert mgr._collective and (mgr._primary == (pid == 0))
    mgr.save_last(state)  # every process calls; orbax gates the writes
    # barrier before reading (save_last returns on all ranks post-barrier,
    # but keep restore ordering explicit)
    multihost_utils.sync_global_devices("ckpt_written")
    assert os.path.isdir(os.path.join(ckpt_dir, "last")), "save missing"

    fresh = create_train_state(model, jax.random.PRNGKey(99), opt)
    assert abs(_checksum(fresh.params) - saved_sum) > 1e-6  # actually fresh
    restored = restore_state(os.path.join(ckpt_dir, "last"), fresh)
    print(f"MULTIHOST_OK pid={pid} saved={saved_sum:.8f} "
          f"checksum={_checksum(restored.params):.8f}")


def run_sample():
    """Mesh-sharded sampling vs local single-device integration.

    The jitted scan sampler runs with cond/mask sharded over 'data' across
    both processes (GSPMD shards the whole ODE integration); the threefry
    draws depend only on shapes, so each process's addressable output
    shards must equal the matching slices of a purely local integration.
    """
    variables = model.init(jax.random.PRNGKey(0))
    n = 8
    mask = np.ones((n, 4, 1), np.float32)
    rng_s = jax.random.PRNGKey(7)

    local = jax.local_devices()[0]
    with jax.default_device(local):
        gen_local = np.asarray(
            model.sample(
                jax.device_get(variables), rng_s,
                mask=jnp.asarray(mask), ode_solver="midpoint", ode_steps=8,
            )
        )

    (mask_sh,) = shard_batch((mask,), mesh)
    gen_mesh = model.sample(
        variables, rng_s, mask=mask_sh, ode_solver="midpoint", ode_steps=8
    )
    jax.block_until_ready(gen_mesh)
    n_local_shards = 0
    for shard in gen_mesh.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), gen_local[shard.index], atol=1e-4,
            err_msg="mesh-sharded sampling diverged from local integration",
        )
        n_local_shards += 1
    assert n_local_shards == 2, n_local_shards  # this process's 2 devices
    print(f"MULTIHOST_OK pid={pid} shards={n_local_shards} "
          f"checksum={float(np.abs(gen_local).sum()):.8f}")


def run_fsdp():
    """ZeRO-3 across processes: params/moments live sharded over the global
    'data' axis (each process holds only its half), the train step runs the
    same math as DP, and the all-gathered result matches the DP scenario's
    checksum (asserted by the driver)."""
    from particle_fm_tpu.parallel.fsdp import shard_state_fsdp

    state = shard_state_fsdp(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    # real cross-process placement: some leaves must be sharded over 'data',
    # and for those this process must hold only its local shards
    sharded = [
        l for l in jax.tree_util.tree_leaves(state.params)
        if "data" in str(l.sharding.spec)
    ]
    assert sharded, "no parameter is FSDP-sharded"
    for l in sharded:
        local_elems = sum(int(np.prod(s.data.shape)) for s in l.addressable_shards)
        assert local_elems < l.size, (local_elems, l.size)

    step = make_train_step(model, opt, mesh=mesh)
    for i, batch in _train_batches():
        state, loss = step(state, jax.random.PRNGKey(i), *batch)
    full = _gather(state.params)
    print(f"MULTIHOST_OK pid={pid} loss={float(loss):.6f} "
          f"checksum={_checksum(full):.8f}")


{"train": run_train, "ckpt": run_ckpt, "sample": run_sample, "fsdp": run_fsdp}[scenario]()
