"""ODE/SDE integrator accuracy tests on analytically solvable systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule
from particle_fm_tpu.samplers.ode import odeint_dopri5, odeint_fixed
from particle_fm_tpu.samplers.sde import ddim_sampler, euler_maruyama_sampler


def linear_drift(t, x):
    return -x  # solution x(t) = x0 * exp(-(t - t0))


@pytest.mark.parametrize(
    "method,steps,tol",
    [("euler", 200, 5e-3), ("midpoint", 100, 1e-4), ("heun", 100, 1e-4), ("rk4", 50, 1e-6)],
)
def test_fixed_step_accuracy(method, steps, tol):
    x0 = jnp.ones((4, 3))
    # integrate from t=0 to t=1: x(1) = exp(-1)
    x1 = odeint_fixed(linear_drift, x0, t0=0.0, t1=1.0, ode_steps=steps, method=method)
    np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0), rtol=tol)


def test_fixed_step_reverse_time():
    """Integrating 1 -> 0 (the sampling direction) works too."""
    x0 = jnp.ones((2, 2))
    x1 = odeint_fixed(linear_drift, x0, t0=1.0, t1=0.0, ode_steps=100, method="midpoint")
    np.testing.assert_allclose(np.asarray(x1), np.exp(1.0), rtol=1e-4)


def test_dopri5_accuracy():
    x0 = jnp.ones((4, 3))
    x1 = odeint_dopri5(linear_drift, x0, t0=0.0, t1=1.0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0), rtol=1e-5)


def test_dopri5_time_dependent():
    # dx/dt = -2t x  => x(1) = x0 exp(-1)
    f = lambda t, x: -2.0 * t * x
    x1 = odeint_dopri5(f, jnp.ones((3,)), t0=0.0, t1=1.0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0), rtol=1e-5)


def test_ddim_perfect_model_recovers_data():
    """If the model predicts the true noise, DDIM recovers x0 exactly for any
    start point of the jump-forward process."""
    sched = VPDiffusionSchedule(max_sr=0.999, min_sr=0.02)
    rs = np.random.RandomState(0)
    x_data = jnp.asarray(rs.randn(8, 5).astype(np.float32))
    noise = jnp.asarray(rs.randn(8, 5).astype(np.float32))

    def perfect_model(t, noisy):
        # invert noisy = sr*x + nr*eps given the true x
        sr, nr = sched(t)
        return (noisy - sr * x_data) / nr

    sr1, nr1 = sched(jnp.asarray(1.0))
    start = sr1 * x_data + nr1 * noise
    out = ddim_sampler(perfect_model, sched, start, n_steps=200)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_data), atol=2e-2)


def test_euler_maruyama_shapes_and_finite():
    sched = VPDiffusionSchedule(max_sr=0.999, min_sr=0.02)
    model = lambda t, x: jnp.zeros_like(x)
    out = euler_maruyama_sampler(
        model, sched, jnp.ones((4, 6, 3)), jax.random.PRNGKey(0), n_steps=50
    )
    assert out.shape == (4, 6, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_scan_samplers_jit():
    f = jax.jit(
        lambda x: odeint_fixed(linear_drift, x, 1.0, 0.0, ode_steps=50, method="midpoint")
    )
    out = f(jnp.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(out), np.exp(1.0), rtol=1e-3)


def test_dopri5_truncation_is_surfaced(capfd):
    """Exhausting max_steps prints a runtime warning and reports
    reached=False via return_stats (silent truncation guard)."""
    from particle_fm_tpu.samplers.ode import odeint_dopri5

    def stiff(t, x):
        return -200.0 * x  # forces many accepted steps at tight tolerance

    x0 = jnp.ones((4, 2))
    out, stats = odeint_dopri5(
        stiff, x0, 0.0, 1.0, rtol=1e-10, atol=1e-12, max_steps=3,
        return_stats=True,
    )
    jax.block_until_ready(out)
    assert not bool(stats["reached"])
    assert int(stats["steps"]) == 3
    captured = capfd.readouterr()
    assert "step budget" in captured.out + captured.err

    # a smooth problem converges and stays quiet
    out, stats = odeint_dopri5(
        lambda t, x: -x, x0, 0.0, 1.0, return_stats=True
    )
    jax.block_until_ready(out)
    assert bool(stats["reached"])


def test_dopri5_per_sample_matches_global_through_sample():
    """Per-set adaptive stepping (vmapped while_loop) agrees with the
    global-step dopri5 on a trained-shape model; both solve the same ODE so
    results match to solver tolerance."""
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    model = FlowMatchingModel(
        model="epic", features=3, num_particles=8, hidden_dim=16, latent=4,
        layers=1, frequencies=4, loss_type="CFM",
        global_cond_dim=2, local_cond_dim=2,
    )
    variables = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    mask = jnp.ones((6, 8, 1))
    cond = jnp.asarray(rs.randn(6, 2).astype(np.float32))
    kw = dict(n_samples=6, cond=cond, mask=mask)
    xg = model.sample(variables, jax.random.PRNGKey(3), ode_solver="dopri5", **kw)
    xp = model.sample(
        variables, jax.random.PRNGKey(3), ode_solver="dopri5_per_sample", **kw
    )
    # adaptive solvers take different step sequences; both must agree with a
    # high-accuracy fixed-step ground truth (and hence with each other)
    xt = model.sample(
        variables, jax.random.PRNGKey(3), ode_solver="rk4", ode_steps=400, **kw
    )
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xt), atol=2e-2)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xt), atol=2e-2)


@pytest.mark.slow
def test_dopri5_per_sample_uncond_unmasked():
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    model = FlowMatchingModel(
        model="epic", features=2, num_particles=6, hidden_dim=16, latent=4,
        layers=1, frequencies=4, loss_type="CFM",
    )
    variables = model.init(jax.random.PRNGKey(0))
    x = model.sample(
        variables, jax.random.PRNGKey(2), n_samples=4,
        ode_solver="dopri5_per_sample",
    )
    assert x.shape == (4, 6, 2)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.parametrize("method,steps,tol", [("ab2", 200, 1e-3), ("ab3", 100, 1e-4)])
def test_adams_bashforth_accuracy(method, steps, tol):
    x0 = jnp.ones((4, 3))
    x1 = odeint_fixed(linear_drift, x0, t0=0.0, t1=1.0, ode_steps=steps, method=method)
    np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0), rtol=tol)


@pytest.mark.parametrize("method", ["ab2", "ab3"])
def test_adams_bashforth_time_dependent_reverse(method):
    # dx/dt = -2t x integrated 1 -> 0: x(0) = x(1) * exp(1)
    f = lambda t, x: -2.0 * t * x
    x1 = odeint_fixed(f, jnp.ones((3,)), t0=1.0, t1=0.0, ode_steps=200, method=method)
    np.testing.assert_allclose(np.asarray(x1), np.exp(1.0), rtol=1e-3)


@pytest.mark.parametrize("method", ["ab2", "ab3"])
def test_adams_bashforth_minimal_steps_no_overshoot(method):
    # ode_steps=2 (a single step) must integrate exactly one span: for
    # dx/dt = 1 from 0 to 1 the answer is 1.0, not 2.0 (bootstrap overshoot)
    f = lambda t, x: jnp.ones_like(x)
    x1 = odeint_fixed(f, jnp.zeros((2,)), t0=0.0, t1=1.0, ode_steps=2, method=method)
    np.testing.assert_allclose(np.asarray(x1), 1.0, rtol=1e-6)
    x3 = odeint_fixed(f, jnp.zeros((2,)), t0=0.0, t1=1.0, ode_steps=3, method=method)
    np.testing.assert_allclose(np.asarray(x3), 1.0, rtol=1e-6)
