"""Classifier-free guidance (beyond reference).

Training drops whole sets' conditioning to the null token with probability
`model.cond_dropout`; sampling blends conditional and null vector fields as
v = v_null + w*(v_cond - v_null) in ONE doubled-batch forward
(models/flow_matching.py::make_drift). These tests pin the exact semantics:
w=1 (and None) is bit-identical to plain conditional sampling, w=0 equals
sampling with the null conditioning, dropout only acts in training mode, and
the eps-space formulation drives the diffusion (ddim/em) samplers too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.models.flow_matching import FlowMatchingModel

B, N, F, C = 6, 8, 3, 2


def _model(**kw):
    cfg = dict(
        features=F,
        num_particles=N,
        hidden_dim=16,
        layers=2,
        latent=8,
        frequencies=4,
        global_cond_dim=C,
        local_cond_dim=C,
        loss_type="CFM",
    )
    cfg.update(kw)
    return FlowMatchingModel(**cfg)


@pytest.fixture(scope="module")
def setup():
    model = _model(cond_dropout=0.1)
    variables = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(42)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, C))
    mask = jnp.ones((B, N, 1)).at[2:, 5:].set(0.0)
    return model, variables, rng, cond, mask


@pytest.mark.slow
def test_guidance_one_and_none_equal_plain(setup):
    model, variables, rng, cond, mask = setup
    kw = dict(cond=cond, mask=mask, ode_steps=6)
    plain = model.sample(variables, rng, **kw)
    w_none = model.sample(variables, rng, guidance_scale=None, **kw)
    w_one = model.sample(variables, rng, guidance_scale=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(w_none))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(w_one))


@pytest.mark.slow
def test_guidance_zero_equals_null_conditioning(setup):
    model, variables, rng, cond, mask = setup
    w0 = model.sample(
        variables, rng, cond=cond, mask=mask, ode_steps=6, guidance_scale=0.0
    )
    null = model.sample(
        variables, rng, cond=jnp.zeros_like(cond), mask=mask, ode_steps=6
    )
    # same noise draw (same rng), w=0 discards the conditional branch; only
    # fp reassociation from the doubled-batch forward separates the two
    np.testing.assert_allclose(np.asarray(w0), np.asarray(null), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_guidance_changes_samples_and_stays_masked(setup):
    model, variables, rng, cond, mask = setup
    w2 = model.sample(
        variables, rng, cond=cond, mask=mask, ode_steps=6, guidance_scale=2.0
    )
    plain = model.sample(variables, rng, cond=cond, mask=mask, ode_steps=6)
    assert not np.allclose(np.asarray(w2), np.asarray(plain))
    assert np.all(np.isfinite(np.asarray(w2)))
    # padded slots stay exactly zero under the guided field
    np.testing.assert_array_equal(np.asarray(w2 * (1 - mask)), 0.0)


@pytest.mark.slow
def test_cond_dropout_train_only(setup):
    """Dropout acts only with train=True; eval losses are dropout-free."""
    model, variables, rng, cond, mask = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (B, N, F)) * mask
    base = _model(cond_dropout=0.0)
    l_eval, _ = model.loss(variables, rng, x, mask=mask, cond=cond, train=False)
    l_base, _ = base.loss(variables, rng, x, mask=mask, cond=cond, train=False)
    np.testing.assert_array_equal(np.asarray(l_eval), np.asarray(l_base))

    heavy = _model(cond_dropout=0.9)
    l_train, _ = heavy.loss(variables, rng, x, mask=mask, cond=cond, train=True)
    l_plain, _ = base.loss(variables, rng, x, mask=mask, cond=cond, train=True)
    assert np.isfinite(float(l_train))
    # with p=0.9 nearly every set runs on the null token: the losses differ
    assert not np.allclose(float(l_train), float(l_plain))


@pytest.mark.slow
def test_cond_dropout_gradients_flow(setup):
    model, variables, rng, cond, mask = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (B, N, F)) * mask

    def loss_fn(params):
        l, _ = model.loss(
            {**variables, "params": params}, rng, x, mask=mask, cond=cond, train=True
        )
        return l

    g = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(leaf).sum()) for leaf in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["ddim", "em"])
def test_guidance_diffusion_samplers(solver):
    # production schedule (max_sr=0.999): the default max_sr=1.0 puts the
    # first EM step at tan(pi/2 - 1e-8) betas, which an untrained net with
    # w=2 amplification overflows — a schedule artifact, not a CFG one
    model = _model(
        loss_type="diffusion",
        cond_dropout=0.1,
        diff_config={"max_sr": 0.999, "min_sr": 0.02},
    )
    variables = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(5)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, C))
    mask = jnp.ones((B, N, 1))
    kw = dict(cond=cond, mask=mask, ode_solver=solver, ode_steps=6)
    plain = model.sample(variables, rng, **kw)
    w_one = model.sample(variables, rng, guidance_scale=1.0, **kw)
    w_two = model.sample(variables, rng, guidance_scale=2.0, **kw)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(w_one))
    assert not np.allclose(np.asarray(w_two), np.asarray(plain))
    assert np.all(np.isfinite(np.asarray(w_two)))


def test_guidance_per_sample_adaptive(setup):
    model, variables, rng, cond, mask = setup
    out = model.sample(
        variables,
        rng,
        cond=cond,
        mask=mask,
        ode_solver="dopri5_per_sample",
        guidance_scale=1.5,
    )
    assert out.shape == (B, N, F)
    assert np.all(np.isfinite(np.asarray(out)))


def test_guidance_selfcond_rejected():
    model = _model(self_cond=True, cond_dropout=0.1)
    variables = model.init(jax.random.PRNGKey(0))
    cond = jnp.zeros((B, C))
    with pytest.raises(NotImplementedError):
        model.sample(
            variables, jax.random.PRNGKey(0), cond=cond,
            mask=jnp.ones((B, N, 1)), ode_steps=2, guidance_scale=2.0,
        )
