"""End-to-end smoke tests: model init, sharded train steps on the 8-device
virtual mesh, EMA, sampling, and the flat (non-set) path via mask=None."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.mesh import shard_batch
from particle_fm_tpu.parallel.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from tests.conftest import synthetic_cloud


def tiny_model(**kw):
    defaults = dict(
        model="epic",
        features=3,
        num_particles=12,
        hidden_dim=16,
        latent=4,
        layers=2,
        frequencies=6,
        loss_type="CFM",
    )
    defaults.update(kw)
    return FlowMatchingModel(**defaults)


@pytest.mark.slow
def test_train_steps_decrease_loss(mesh):
    model = tiny_model()
    opt = make_optimizer(lr=1e-3, grad_clip=0.5)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    train_step = make_train_step(model, opt, mesh=mesh)
    x, mask, _ = synthetic_cloud(batch=32, n=12)
    batch = shard_batch((jnp.asarray(x), jnp.asarray(mask), None), mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(8):
        state, loss = train_step(state, rng, *batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert int(state.step) == 8
    # not strictly monotonic, but training should move the loss
    assert losses[-1] != losses[0]


@pytest.mark.slow
def test_ema_tracks_params(mesh):
    model = tiny_model()
    opt = make_optimizer(lr=1e-2)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    train_step = make_train_step(model, opt, ema_decay=0.5, mesh=mesh)
    x, mask, _ = synthetic_cloud(batch=16, n=12)
    batch = shard_batch((jnp.asarray(x), jnp.asarray(mask), None), mesh)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    for _ in range(3):
        state, _ = train_step(state, jax.random.PRNGKey(2), *batch)
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    p = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(e), np.asarray(p0))  # EMA moved
    assert not np.allclose(np.asarray(e), np.asarray(p))  # but lags params


@pytest.mark.slow
def test_eval_step_deterministic(mesh):
    model = tiny_model()
    opt = make_optimizer()
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    eval_step = make_eval_step(model, mesh=mesh)
    x, mask, _ = synthetic_cloud(batch=16, n=12)
    batch = shard_batch((jnp.asarray(x), jnp.asarray(mask), None), mesh)
    rng = jax.random.PRNGKey(9999)  # fixed val seed, like the reference
    l1 = float(eval_step(state, rng, *batch))
    l2 = float(eval_step(state, rng, *batch))
    assert l1 == l2


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["euler", "midpoint", "rk4"])
def test_sampling_shapes_and_mask(solver):
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0))
    _, mask, _ = synthetic_cloud(batch=6, n=12)
    out = model.sample(
        variables,
        jax.random.PRNGKey(1),
        n_samples=6,
        mask=jnp.asarray(mask),
        ode_solver=solver,
        ode_steps=10,
    )
    assert out.shape == (6, 12, 3)
    out_np = np.asarray(out)
    np.testing.assert_array_equal(out_np * (1 - mask), np.zeros_like(out_np))
    assert np.isfinite(out_np).all()


@pytest.mark.slow
def test_conditional_model_trains_and_samples(mesh):
    model = tiny_model(global_cond_dim=2, local_cond_dim=2)
    opt = make_optimizer()
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    train_step = make_train_step(model, opt, mesh=mesh)
    x, mask, cond = synthetic_cloud(batch=16, n=12, cond_dim=2)
    batch = shard_batch((jnp.asarray(x), jnp.asarray(mask), jnp.asarray(cond)), mesh)
    state, loss = train_step(state, jax.random.PRNGKey(1), *batch)
    assert np.isfinite(float(loss))
    out = model.sample(
        state.variables(ema=True),
        jax.random.PRNGKey(2),
        cond=jnp.asarray(cond[:4]),
        mask=jnp.asarray(mask[:4]),
        ode_steps=5,
    )
    assert out.shape == (4, 12, 3)


def test_diffusion_model_em_and_ddim_sampling():
    model = tiny_model(
        loss_type="diffusion",
        criterion="huber",
        diff_config={"max_sr": 0.999, "min_sr": 0.02},
    )
    variables = model.init(jax.random.PRNGKey(0))
    _, mask, _ = synthetic_cloud(batch=4, n=12)
    for solver in ["em", "ddim", "midpoint"]:
        out = model.sample(
            variables,
            jax.random.PRNGKey(1),
            n_samples=4,
            mask=jnp.asarray(mask),
            ode_solver=solver,
            ode_steps=8,
        )
        assert out.shape == (4, 12, 3)
        assert np.isfinite(np.asarray(out)).all(), solver


@pytest.mark.slow
def test_normaliser_roundtrip(mesh):
    model = tiny_model(use_normaliser=True, global_cond_dim=2, local_cond_dim=0)
    opt = make_optimizer()
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    train_step = make_train_step(model, opt, mesh=mesh)
    x, mask, cond = synthetic_cloud(batch=16, n=12, cond_dim=2)
    # shift the data so normalization has something to learn
    x = x * 3.0 + 2.0 * mask
    batch = shard_batch((jnp.asarray(x), jnp.asarray(mask), jnp.asarray(cond)), mesh)
    for _ in range(3):
        state, loss = train_step(state, jax.random.PRNGKey(1), *batch)
    stats = state.norm_stats
    leaves = jax.tree_util.tree_leaves(stats)
    assert any(np.asarray(l).std() > 0 for l in leaves if np.asarray(l).size > 1)
    out = model.sample(
        state.variables(),
        jax.random.PRNGKey(3),
        cond=jnp.asarray(cond[:4]),
        mask=jnp.asarray(mask[:4]),
        ode_steps=5,
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_n_transforms_stack():
    model = tiny_model(n_transforms=2)
    variables = model.init(jax.random.PRNGKey(0))
    _, mask, _ = synthetic_cloud(batch=2, n=12)
    out = model.sample(
        variables, jax.random.PRNGKey(1), n_samples=2, mask=jnp.asarray(mask), ode_steps=4
    )
    assert out.shape == (2, 12, 3)
