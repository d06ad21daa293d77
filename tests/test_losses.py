"""Loss-family golden tests.

The vector field is stubbed so the losses' interpolants and normalization
can be checked in closed form against the reference math (losses.py cited
in each loss's docstring)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.losses.diffusion import (
    VPDiffusionSchedule,
    cosine_beta_schedule,
    cosine_diffusion_schedule,
)
from particle_fm_tpu.losses.flow_matching import (
    cfm_loss,
    cfm_ot_loss,
    diffusion_loss,
    droid_loss,
    fm_ot_loss,
    get_loss_fn,
)
from particle_fm_tpu.losses.ot import ot_pair_indices, pairwise_sq_dists, sinkhorn_plan
from tests.conftest import synthetic_cloud


def zero_vf(t, y, cond, mask):
    return jnp.zeros_like(y)


def test_fm_ot_loss_closed_form():
    """With v=0, loss = sum(u^2)/mask.sum(); recompute u from the same rngs."""
    x, mask, _ = synthetic_cloud(batch=8, n=10)
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    rng = jax.random.PRNGKey(42)
    loss = float(fm_ot_loss(zero_vf, rng, x, mask, sigma=1e-4))
    rng_t, rng_z = jax.random.split(rng)
    z = jax.random.normal(rng_z, x.shape, x.dtype)
    u = ((1 - 1e-4) * z - x) * mask
    want = float(jnp.sum(u**2) / jnp.sum(mask))
    assert loss == pytest.approx(want, rel=1e-5)


def test_cfm_loss_closed_form():
    x, mask, _ = synthetic_cloud(batch=8, n=10)
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    rng = jax.random.PRNGKey(7)
    loss = float(cfm_loss(zero_vf, rng, x, mask))
    _, rng_0, _ = jax.random.split(rng, 3)
    x0 = jax.random.normal(rng_0, x.shape, x.dtype)
    u = (x0 - x) * mask
    want = float(jnp.sum(u**2) / jnp.sum(mask))
    assert loss == pytest.approx(want, rel=1e-5)


def test_droid_loss_closed_form():
    x, mask, _ = synthetic_cloud(batch=8, n=10)
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    rng = jax.random.PRNGKey(3)
    loss = float(droid_loss(zero_vf, rng, x, mask))
    _, rng_z = jax.random.split(rng)
    z = jax.random.normal(rng_z, x.shape, x.dtype)
    want = float(jnp.sum((z * mask) ** 2) / jnp.sum(mask))
    assert loss == pytest.approx(want, rel=1e-5)


def test_diffusion_schedule_golden():
    """signal/noise rates + betas match the closed-form cosine schedule."""
    t = np.linspace(0, 1, 11)
    max_sr, min_sr = 0.999, 0.02
    sr, nr = cosine_diffusion_schedule(jnp.asarray(t), max_sr, min_sr)
    start, end = math.acos(max_sr), math.acos(min_sr)
    ang = start + t * (end - start)
    np.testing.assert_allclose(np.asarray(sr), np.cos(ang), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nr), np.sin(ang), rtol=1e-5)
    betas = cosine_beta_schedule(jnp.asarray(t), max_sr, min_sr)
    np.testing.assert_allclose(np.asarray(betas), 2 * (end - start) * np.tan(ang), rtol=1e-4)
    # variance preserving: sr^2 + nr^2 = 1
    np.testing.assert_allclose(np.asarray(sr**2 + nr**2), np.ones_like(t), rtol=1e-6)


def test_diffusion_loss_finite_and_masked():
    x, mask, _ = synthetic_cloud(batch=8, n=10)
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    sched = VPDiffusionSchedule(max_sr=0.999, min_sr=0.02)
    loss = float(
        diffusion_loss(zero_vf, jax.random.PRNGKey(0), x, mask, schedule=sched)
    )
    assert np.isfinite(loss) and loss > 0


def test_ot_pairing_identity_when_already_matched():
    """If x0 == x1, optimal pairing is the identity permutation."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 3).astype(np.float32))
    idx = np.asarray(ot_pair_indices(x, x, method="sinkhorn", reg=0.005, n_iters=200))
    np.testing.assert_array_equal(idx, np.tile(np.arange(8), (4, 1)))
    idx_exact = np.asarray(ot_pair_indices(x, x, method="exact"))
    np.testing.assert_array_equal(idx_exact, np.tile(np.arange(8), (4, 1)))


def test_sinkhorn_agrees_with_hungarian_on_random_costs():
    rs = np.random.RandomState(1)
    x0 = jnp.asarray(rs.randn(3, 6, 3).astype(np.float32))
    x1 = jnp.asarray(rs.randn(3, 6, 3).astype(np.float32))
    i_sink = np.asarray(ot_pair_indices(x0, x1, method="sinkhorn", reg=0.002, n_iters=500))
    i_ex = np.asarray(ot_pair_indices(x0, x1, method="exact"))
    # low-reg sinkhorn should recover most of the exact assignment
    agreement = (i_sink == i_ex).mean()
    assert agreement >= 0.8


def test_sinkhorn_plan_marginals():
    rs = np.random.RandomState(2)
    cost = jnp.asarray(rs.rand(2, 5, 5).astype(np.float32))
    plan = np.asarray(sinkhorn_plan(cost, reg=0.05, n_iters=300))
    np.testing.assert_allclose(plan.sum(axis=2), np.full((2, 5), 1 / 5), atol=1e-4)
    np.testing.assert_allclose(plan.sum(axis=1), np.full((2, 5), 1 / 5), atol=1e-4)


@pytest.mark.slow
def test_cfm_ot_loss_runs():
    x, mask, _ = synthetic_cloud(batch=4, n=8)
    loss = float(
        cfm_ot_loss(zero_vf, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    )
    assert np.isfinite(loss)


def test_get_loss_fn_dispatch():
    x, mask, _ = synthetic_cloud(batch=4, n=8)
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    for lt in ["FM-OT", "CFM", "CFM-OT", "diffusion", "droid"]:
        fn = get_loss_fn(lt)
        val = float(fn(zero_vf, jax.random.PRNGKey(0), x, mask, None))
        assert np.isfinite(val), lt
    with pytest.raises(NotImplementedError):
        get_loss_fn("nope")


def test_pairwise_sq_dists():
    rs = np.random.RandomState(3)
    a = rs.randn(2, 4, 3).astype(np.float32)
    b = rs.randn(2, 5, 3).astype(np.float32)
    got = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_droid_t_max_analytic_generation():
    """With the exact conditional-expectation field for Gaussian data, the
    droid-VE convention (network time s in [0,1], physical time s*t_max,
    drift t_max*E[z|y], prior t_max*N(0,1)) transports the prior to the data
    distribution. Validates the sampling convention behind droid_t_max."""
    import numpy as np
    from particle_fm_tpu.samplers.ode import odeint_fixed

    mu, s_data, t_max = 1.5, 0.5, 10.0

    def drift(s, y):
        t_phys = s * t_max
        ez = t_phys * (y - mu) / (s_data**2 + t_phys**2)  # E[z | y_s = y]
        return t_max * ez

    z = t_max * jax.random.normal(jax.random.PRNGKey(0), (4096, 1))
    x = odeint_fixed(drift, z, t0=1.0, t1=0.0, ode_steps=201, method="midpoint")
    assert abs(float(x.mean()) - mu) < 0.1, float(x.mean())
    assert abs(float(x.std()) - s_data) < 0.1, float(x.std())


def test_droid_t_max_default_matches_reference_formula():
    """t_max=1.0 (default) reproduces the exact reference droid loss."""
    from particle_fm_tpu.losses.flow_matching import droid_loss

    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, 3))
    mask = jnp.ones((8, 6, 1))
    vf = lambda t, y, cond, m: 0.5 * y
    a = droid_loss(vf, jax.random.PRNGKey(2), x, mask)
    b = droid_loss(vf, jax.random.PRNGKey(2), x, mask, t_max=1.0)
    assert float(a) == float(b)


def test_droid_t_max_log_prob_guarded():
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    model = FlowMatchingModel(
        model="epic", features=2, num_particles=4, hidden_dim=8, latent=4,
        layers=1, frequencies=4, loss_type="droid", droid_t_max=10.0,
    )
    variables = model.init(jax.random.PRNGKey(0))
    x = model.sample(variables, jax.random.PRNGKey(1), n_samples=2)
    assert x.shape == (2, 4, 2) and bool(jnp.all(jnp.isfinite(x)))
    import pytest

    with pytest.raises(NotImplementedError):
        model.log_prob(variables, x)


def test_sinkhorn_pairing_is_a_permutation():
    """The hardened Sinkhorn pairing must be a true permutation per set —
    per-row argmax collides and drops data particles, biasing the marginal."""
    from particle_fm_tpu.losses.ot import ot_pair_indices

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(8, 24, 3).astype(np.float32))
    x1 = jnp.asarray(rs.randn(8, 24, 3).astype(np.float32))
    idx = np.asarray(ot_pair_indices(x0, x1, method="sinkhorn"))
    for k in range(idx.shape[0]):
        assert sorted(idx[k].tolist()) == list(range(24)), k


def test_sinkhorn_pairing_reduces_cost():
    """The OT permutation should cost no more than the identity pairing."""
    from particle_fm_tpu.losses.ot import gather_particles, ot_pair_indices

    rs = np.random.RandomState(1)
    x0 = jnp.asarray(rs.randn(4, 16, 3).astype(np.float32))
    x1 = jnp.asarray(rs.randn(4, 16, 3).astype(np.float32))
    idx = ot_pair_indices(x0, x1, method="sinkhorn")
    paired = gather_particles(x1, idx)
    cost_ot = float(jnp.sum((x0 - paired) ** 2))
    cost_id = float(jnp.sum((x0 - x1) ** 2))
    assert cost_ot < cost_id
