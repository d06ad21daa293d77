"""Consistency distillation: boundary condition, teacher-Euler init
equivalence, masked distill step, multistep sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.training.consistency import (
    consistency_sample,
    distill_consistency,
    distill_direct,
    time_grid,
)


def _tiny(loss_type="CFM", **kw):
    model = FlowMatchingModel(
        model="epic", features=3, num_particles=6, hidden_dim=16,
        layers=2, latent=4, global_cond_dim=2, loss_type=loss_type, **kw
    )
    return model, model.init(jax.random.PRNGKey(0))


def test_time_grid_boundary():
    g = time_grid(8, t_min=0.01)
    assert g[0] == 0.0 and g[1] == pytest.approx(0.01) and g[-1] == 1.0
    assert len(g) == 9 and np.all(np.diff(g) > 0)


@pytest.mark.slow
def test_boundary_condition_exact():
    """g(y, t=0) == y by construction (no c_skip/c_out schedule needed)."""
    model, variables = _tiny()
    module, vars_f = model.fold_weight_norm(variables)
    from particle_fm_tpu.training.consistency import _g

    y = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3))
    mask = jnp.ones((4, 6, 1)).at[:, 4:].set(0.0)
    cond = jnp.zeros((4, 2))
    out = _g(module, vars_f, jnp.zeros((4,)), y * mask, cond, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y * mask), atol=1e-6)


@pytest.mark.slow
def test_init_equals_teacher_euler_jump():
    """At student==teacher, the 1-step consistency sample IS the teacher's
    single Euler step from t=1 to t=0 (same prior draw)."""
    model, variables = _tiny()
    mask = jnp.ones((5, 6, 1))
    cond = jnp.zeros((5, 2))
    rng = jax.random.PRNGKey(3)
    got = consistency_sample(model, variables, rng, cond=cond, mask=mask, steps=1)

    kz, _ = jax.random.split(rng)
    # consistency_sample draws z inside its jitted run(key) after one split
    z = jax.random.normal(kz, (5, 6, 3)) * mask
    module, vars_f = model.fold_weight_norm(variables)
    v = module.apply(vars_f, jnp.ones((5,)), z, cond=cond, mask=mask)
    want = (z - v) * mask
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_distill_runs_and_moves_params():
    model, variables = _tiny()
    x = np.random.default_rng(0).normal(size=(64, 6, 3)).astype(np.float32)
    mask = np.ones((64, 6, 1), np.float32)
    mask[:, 5:] = 0.0
    cond = np.zeros((64, 2), np.float32)
    res = distill_consistency(
        model, variables, x, mask=mask, cond=cond,
        steps=6, batch_size=8, lr=1e-3, warmup=2, n_grid=4,
    )
    assert np.isfinite(res.losses).all()
    # params moved, structure preserved
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(res.variables["params"])
    assert len(before) == len(after)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    # target EMA stayed close to the init (mu=0.99, 6 steps)
    tgt = jax.tree_util.tree_leaves(res.target_variables["params"])
    assert all(
        np.allclose(np.asarray(a), np.asarray(b), atol=0.2)
        for a, b in zip(before, tgt)
    )
    # distilled student still samples (multistep) with padded rows zeroed
    g = consistency_sample(
        model, res.variables, jax.random.PRNGKey(5),
        cond=jnp.asarray(cond[:4]), mask=jnp.asarray(mask[:4]), steps=2,
    )
    assert g.shape == (4, 6, 3) and np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)[:, 5:]).max() == 0.0


@pytest.mark.slow
def test_distill_direct_runs():
    """Direct trajectory distillation: finite losses, params move, the
    student samples masked/finite through the same multistep sampler."""
    model, variables = _tiny()
    x = np.random.default_rng(1).normal(size=(64, 6, 3)).astype(np.float32)
    mask = np.ones((64, 6, 1), np.float32)
    mask[:, 5:] = 0.0
    cond = np.zeros((64, 2), np.float32)
    res = distill_direct(
        model, variables, x, mask=mask, cond=cond,
        steps=6, batch_size=8, lr=1e-3, warmup=2, solver_steps=3,
    )
    assert np.isfinite(res.losses).all()
    before = jax.tree_util.tree_leaves(variables["params"])
    after = jax.tree_util.tree_leaves(res.variables["params"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    g = consistency_sample(
        model, res.variables, jax.random.PRNGKey(7),
        cond=jnp.asarray(cond[:4]), mask=jnp.asarray(mask[:4]), steps=2,
    )
    assert g.shape == (4, 6, 3) and np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)[:, 5:]).max() == 0.0


def test_guards():
    model, variables = _tiny(loss_type="diffusion")
    with pytest.raises(ValueError):
        consistency_sample(
            model, variables, jax.random.PRNGKey(0),
            mask=jnp.ones((2, 6, 1)), steps=1,
        )
    model2, v2 = _tiny()
    model2 = __import__("dataclasses").replace(model2, n_transforms=2)
    with pytest.raises(NotImplementedError):
        distill_consistency(model2, v2, np.zeros((4, 6, 3), np.float32), steps=1)
