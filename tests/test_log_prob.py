"""log_prob: the augmented-ODE likelihood must integrate to a proper density.

Validation: train a small CFM model on a shifted/scaled Gaussian, then check
that log_prob (a) is higher for in-distribution than out-of-distribution
points, and (b) roughly matches the analytic log-density of the target."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step
import pytest


def test_log_prob_untrained_is_prior():
    """At init the vf is ~random but small; for an identity-ish flow the
    log_prob of the origin must beat a far-away point (prior dominates)."""
    model = FlowMatchingModel(model="epic", features=2, num_particles=4,
                              hidden_dim=8, latent=4, layers=1, frequencies=4)
    variables = model.init(jax.random.PRNGKey(0))
    mask = jnp.ones((2, 4, 1))
    x_near = jnp.zeros((2, 4, 2))
    x_far = jnp.ones((2, 4, 2)) * 6.0
    lp_near = model.log_prob(variables, x_near, mask=mask, ode_steps=25)
    lp_far = model.log_prob(variables, x_far, mask=mask, ode_steps=25)
    assert np.isfinite(np.asarray(lp_near)).all()
    assert (np.asarray(lp_near) > np.asarray(lp_far)).all()


@pytest.mark.slow
def test_log_prob_trained_matches_analytic(mesh):
    """1-particle 1-feature sets: target N(2, 0.25). After training, log_prob
    should approximate the analytic density up to modest tolerance."""
    model = FlowMatchingModel(model="epic", features=1, num_particles=1,
                              hidden_dim=32, latent=8, layers=2, frequencies=6,
                              loss_type="CFM", sigma=1e-4)
    opt = make_optimizer(lr=2e-3)
    state = replicate(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    step = make_train_step(model, opt, mesh=mesh)
    rs = np.random.RandomState(0)
    for i in range(500):
        x = (rs.randn(256, 1, 1) * 0.5 + 2.0).astype(np.float32)
        batch = shard_batch((jnp.asarray(x), jnp.ones((256, 1, 1)), None), mesh)
        state, loss = step(state, jax.random.PRNGKey(1), *batch)

    variables = jax.device_get(state.variables())
    xs = np.array([1.0, 2.0, 3.0], np.float32).reshape(3, 1, 1)
    lp = np.asarray(
        model.log_prob(variables, jnp.asarray(xs), mask=jnp.ones((3, 1, 1)), ode_steps=50)
    )
    sigma = 0.5
    analytic = -0.5 * ((xs[:, 0, 0] - 2.0) / sigma) ** 2 - np.log(sigma * np.sqrt(2 * np.pi))
    # shape of the density: the mode (x=2) must dominate, values within ~0.5 nats
    assert lp[1] > lp[0] and lp[1] > lp[2]
    np.testing.assert_allclose(lp, analytic, atol=0.5)


@pytest.mark.slow
def test_log_prob_hutchinson_close_to_exact():
    model = FlowMatchingModel(model="epic", features=2, num_particles=3,
                              hidden_dim=8, latent=4, layers=1, frequencies=4)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 2))
    mask = jnp.ones((4, 3, 1))
    lp_exact = np.asarray(model.log_prob(variables, x, mask=mask, ode_steps=20, exact=True))
    # average a few Hutchinson draws
    lps = [
        np.asarray(
            model.log_prob(variables, x, mask=mask, ode_steps=20, exact=False,
                           rng=jax.random.PRNGKey(10 + i))
        )
        for i in range(8)
    ]
    lp_hutch = np.mean(lps, axis=0)
    np.testing.assert_allclose(lp_hutch, lp_exact, atol=0.35)


@pytest.mark.slow
def test_log_prob_multi_transform_stack():
    """n_transforms > 1: log_prob chains the whole CNF stack (reference
    composes one CNF per flow, flow_matching_module.py:168-196) and stays a
    proper density (near beats far; finite)."""
    model = FlowMatchingModel(model="epic", features=2, num_particles=4,
                              hidden_dim=8, latent=4, layers=1, frequencies=4,
                              n_transforms=2)
    variables = model.init(jax.random.PRNGKey(0))
    mask = jnp.ones((2, 4, 1))
    x_near = jnp.zeros((2, 4, 2))
    x_far = jnp.ones((2, 4, 2)) * 6.0
    lp_near = model.log_prob(variables, x_near, mask=mask, ode_steps=25)
    lp_far = model.log_prob(variables, x_far, mask=mask, ode_steps=25)
    assert np.isfinite(np.asarray(lp_near)).all()
    assert (np.asarray(lp_near) > np.asarray(lp_far)).all()


@pytest.mark.slow
def test_log_prob_single_transform_flow_k_equivalence():
    """The flow_k-based path must agree with the original full-stack apply
    for n_transforms == 1 (regression guard for the stack generalization)."""
    model = FlowMatchingModel(model="epic", features=2, num_particles=4,
                              hidden_dim=8, latent=4, layers=1, frequencies=4)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 2))
    t = jnp.full((3,), 0.3)
    full = model.module.apply(variables, t, x)
    single = model.module.apply(variables, 0, t, x, method="flow_k")
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), atol=1e-6)


def test_flat_log_prob_untrained_near_beats_far():
    """Flat (no-sets) model: same augmented-ODE density API as the set model
    (reference flow_matching_no_sets.py:95-112). At init, prior dominates."""
    from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel

    model = FlatFlowMatchingModel(features=4, cond_dim=1)
    variables = model.init(jax.random.PRNGKey(0))
    cond = jnp.zeros((2, 1))
    lp_near = model.log_prob(variables, jnp.zeros((2, 4)), cond=cond, ode_steps=25)
    lp_far = model.log_prob(variables, jnp.full((2, 4), 6.0), cond=cond, ode_steps=25)
    assert np.isfinite(np.asarray(lp_near)).all()
    assert (np.asarray(lp_near) > np.asarray(lp_far)).all()


def test_flat_log_prob_hutchinson_close_to_exact():
    from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel

    model = FlatFlowMatchingModel(features=3, cond_dim=1)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
    cond = jnp.zeros((4, 1))
    lp_exact = np.asarray(model.log_prob(variables, x, cond=cond, ode_steps=20))
    lps = [
        np.asarray(
            model.log_prob(variables, x, cond=cond, ode_steps=20, exact=False,
                           rng=jax.random.PRNGKey(10 + i))
        )
        for i in range(8)
    ]
    np.testing.assert_allclose(np.mean(lps, axis=0), lp_exact, atol=0.35)


def test_flat_multi_transform_log_prob_and_sample():
    """n_transforms > 1 on the flat model: log_prob chains flows 0..n-1 in
    encode order; sample integrates each flow's ODE separately in reversed
    order (reference flow_matching_no_sets.py:146-152) — NOT one composite
    field. The composite-field integration must therefore differ from
    sample's output for a 2-flow stack."""
    from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel
    from particle_fm_tpu.samplers.ode import odeint_fixed

    model = FlatFlowMatchingModel(features=3, cond_dim=1, n_transforms=2)
    variables = model.init(jax.random.PRNGKey(0))
    cond = jnp.zeros((2, 1))
    lp = model.log_prob(variables, jnp.zeros((2, 3)), cond=cond, ode_steps=15)
    assert np.isfinite(np.asarray(lp)).all()

    x = model.sample(variables, jax.random.PRNGKey(1), n_samples=2, cond=cond,
                     ode_steps=15)
    assert np.isfinite(np.asarray(x)).all() and x.shape == (2, 3)

    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3))  # != sample's z draw

    def composite(t, y):
        return model.module.apply(variables, t, y, cond, None)

    x_composite = odeint_fixed(composite, z, 1.0, 0.0, ode_steps=15, method="midpoint")
    assert np.isfinite(np.asarray(x_composite)).all()


def test_flat_flow_k_matches_composite_single_transform():
    from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel

    model = FlatFlowMatchingModel(features=3, cond_dim=1)
    variables = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    cond = jnp.zeros((3, 1))
    t = jnp.full((3,), 0.3)
    full = model.module.apply(variables, t, x, cond)
    single = model.module.apply(variables, 0, t, x, cond, method="flow_k")
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), atol=1e-6)


@pytest.mark.slow
def test_log_prob_diffusion_uses_pf_ode_drift():
    """For loss_type=diffusion, log_prob must integrate the probability-flow
    drift -0.5*beta*(x - eps/sigma), not the raw noise prediction. With a
    perfect noise model for x ~ N(0,1) data (eps_hat = noise_rate*x under the
    VP marginal... here: the trivial model eps_hat(t,x)=x*nr/(sr^2+nr^2)
    isn't closed-form-simple, so instead check self-consistency: in-dist
    points score higher than far-out points, and values are finite)."""
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    model = FlowMatchingModel(
        model="epic", features=2, num_particles=4, hidden_dim=8, latent=4,
        layers=1, frequencies=4, loss_type="diffusion",
        # the reference's experiment schedule (configs/model/diffusion.yaml):
        # max_sr=1.0 would make noise_rate(0)=0 and the PF drift singular at
        # the t=0 endpoint the density ODE starts from
        diff_config={"max_sr": 0.999, "min_sr": 0.02},
    )
    variables = model.init(jax.random.PRNGKey(0))
    x_in = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (3, 4, 2))
    x_out = 50.0 + jnp.zeros((3, 4, 2))
    lp_in = model.log_prob(variables, x_in, ode_steps=40)
    lp_out = model.log_prob(variables, x_out, ode_steps=40)
    assert np.all(np.isfinite(np.asarray(lp_in)))
    assert float(lp_in.mean()) > float(lp_out.mean())
