"""Tensor parallelism: DPxTP on a 2-D mesh must match pure DP numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from particle_fm_tpu.parallel.tp import epic_tp_rules, shard_state, transformer_tp_rules, tree_shardings
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step
import pytest


def _model():
    return FlowMatchingModel(
        model="epic", features=3, num_particles=16, hidden_dim=32, latent=8,
        layers=2, frequencies=6, loss_type="CFM", t_local_cat=True, t_global_cat=True,
        add_time_to_input=False, global_cond_dim=2, local_cond_dim=2,
    )


def _batch(mesh, n=32):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, 16, 3).astype(np.float32))
    m = jnp.ones((n, 16, 1))
    c = jnp.asarray(rs.randn(n, 2).astype(np.float32))
    return shard_batch((x, m, c), mesh)


@pytest.mark.slow
def test_tp_matches_dp():
    model = _model()
    opt = make_optimizer(lr=1e-3)

    # pure DP on an 8x1 mesh
    mesh_dp = make_mesh(data=8, model=1)
    state_dp = replicate(create_train_state(model, jax.random.PRNGKey(0), opt), mesh_dp)
    step_dp = make_train_step(model, opt, mesh=mesh_dp)
    losses_dp = []
    for i in range(3):
        state_dp, loss = step_dp(state_dp, jax.random.PRNGKey(7), *_batch(mesh_dp))
        losses_dp.append(float(loss))

    # DP x TP on a 4x2 mesh with Megatron-sharded EPiC local MLPs
    mesh_tp = make_mesh(data=4, model=2)
    state_tp = shard_state(
        create_train_state(model, jax.random.PRNGKey(0), opt), mesh_tp, epic_tp_rules()
    )
    step_tp = make_train_step(model, opt, mesh=mesh_tp)
    losses_tp = []
    for i in range(3):
        state_tp, loss = step_tp(state_tp, jax.random.PRNGKey(7), *_batch(mesh_tp))
        losses_tp.append(float(loss))

    np.testing.assert_allclose(losses_dp, losses_tp, rtol=2e-4)
    # params after 3 steps agree too
    p_dp = jax.device_get(state_dp.params)
    p_tp = jax.device_get(state_tp.params)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_tp_params_actually_sharded():
    model = _model()
    opt = make_optimizer()
    mesh = make_mesh(data=4, model=2)
    state = shard_state(create_train_state(model, jax.random.PRNGKey(0), opt), mesh, epic_tp_rules())
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    sharded = 0
    for kp, leaf in flat:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        if "fc_local1/kernel" in path or "fc_l1/kernel" in path:
            spec = leaf.sharding.spec
            assert "model" in str(spec), (path, spec)
            sharded += 1
    assert sharded >= 2


@pytest.mark.slow
def test_transformer_tp_rules_apply():
    model = FlowMatchingModel(
        model="droid_fulltransformer", features=3, num_particles=10, frequencies=6,
        net_config={"te_config": {"model_dim": 32, "num_layers": 1,
                                  "mha_config": {"num_heads": 4}}},
    )
    opt = make_optimizer()
    mesh = make_mesh(data=4, model=2)
    state = shard_state(create_train_state(model, jax.random.PRNGKey(0), opt), mesh,
                        transformer_tp_rules())
    step = make_train_step(model, opt, mesh=mesh)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 10, 3).astype(np.float32))
    batch = shard_batch((x, jnp.ones((16, 10, 1)), None), mesh)
    state, loss = step(state, jax.random.PRNGKey(1), *batch)
    assert np.isfinite(float(loss))
