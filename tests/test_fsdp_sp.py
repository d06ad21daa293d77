"""FSDP and sequence-parallel sharding must match pure DP numerically.

Beyond-reference scaling paths (the reference's only strategy is DDP,
configs/trainer/ddp.yaml); these verify that GSPMD-partitioned training with
(a) every parameter/moment sharded over 'data' (ZeRO-3) and (b) the particle
axis sharded over 'model' (sequence parallelism) computes the same steps as
replicated data parallelism.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.fsdp import fsdp_spec, shard_state_fsdp
from particle_fm_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_batch_sp
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step
import pytest


def _model():
    return FlowMatchingModel(
        model="epic", features=3, num_particles=16, hidden_dim=32, latent=8,
        layers=2, frequencies=6, loss_type="CFM", t_local_cat=True, t_global_cat=True,
        add_time_to_input=False, global_cond_dim=2, local_cond_dim=2,
    )


def _batch(n=32):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, 16, 3).astype(np.float32))
    m = jnp.ones((n, 16, 1))
    c = jnp.asarray(rs.randn(n, 2).astype(np.float32))
    return x, m, c


def _run_dp(model, opt, steps=3):
    mesh = make_mesh(data=8, model=1)
    state = replicate(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    step = make_train_step(model, opt, mesh=mesh)
    losses = []
    for _ in range(steps):
        state, loss = step(state, jax.random.PRNGKey(7), *shard_batch(_batch(), mesh))
        losses.append(float(loss))
    return losses, jax.device_get(state.params)


@pytest.mark.slow
def test_fsdp_matches_dp():
    model = _model()
    opt = make_optimizer(lr=1e-3)
    losses_dp, p_dp = _run_dp(model, opt)

    mesh = make_mesh(data=8, model=1)
    state = shard_state_fsdp(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    step = make_train_step(model, opt, mesh=mesh)
    losses = []
    for _ in range(3):
        state, loss = step(state, jax.random.PRNGKey(7), *shard_batch(_batch(), mesh))
        losses.append(float(loss))

    np.testing.assert_allclose(losses_dp, losses, rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_dp),
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_fsdp_params_actually_sharded():
    model = _model()
    opt = make_optimizer()
    mesh = make_mesh(data=8, model=1)
    state = shard_state_fsdp(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    n_sharded = sum(
        1
        for leaf in jax.tree_util.tree_leaves(state.params)
        if "data" in str(leaf.sharding.spec)
    )
    assert n_sharded >= 8, n_sharded
    # a 32x32 kernel shards its (first) largest divisible dim
    assert fsdp_spec((32, 32), 8) == jax.sharding.PartitionSpec("data", None)
    # scalars / tiny biases replicate
    assert fsdp_spec((), 8) == jax.sharding.PartitionSpec()
    assert fsdp_spec((3,), 8) == jax.sharding.PartitionSpec()


def test_sp_matches_dp():
    model = _model()
    opt = make_optimizer(lr=1e-3)
    losses_dp, p_dp = _run_dp(model, opt)

    # 4x2 mesh: batch over 'data', particle axis over 'model'
    mesh = make_mesh(data=4, model=2)
    state = replicate(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    step = make_train_step(model, opt, mesh=mesh, sp=True)
    losses = []
    for _ in range(3):
        state, loss = step(state, jax.random.PRNGKey(7), *shard_batch_sp(_batch(), mesh))
        losses.append(float(loss))

    np.testing.assert_allclose(losses_dp, losses, rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_dp),
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
