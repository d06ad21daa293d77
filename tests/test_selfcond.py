"""Self-conditioning CFM (FlowMatchingModel.self_cond).

The reference carries this variant only in notebooks/02 (eight-moons); here
it is a first-class model option. Pins: the x1_hat = y - t*v estimate is
exact for the linear-path losses, training learns a simple set distribution,
sampling is finite/masked and carries the estimate across steps, and the
guards (diffusion loss, n_transforms>1, pp vf_fn) refuse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.models.flow_matching import FlowMatchingModel


def _model(**kw):
    cfg = dict(
        model="epic", features=2, num_particles=6, hidden_dim=32, latent=4,
        layers=2, loss_type="CFM", self_cond=True, global_cond_dim=0,
        local_cond_dim=0,
    )
    cfg.update(kw)
    return FlowMatchingModel(**cfg)


def test_guards():
    with pytest.raises(ValueError, match="linear-path"):
        _model(loss_type="diffusion")
    with pytest.raises(ValueError, match="n_transforms"):
        _model(n_transforms=2)


@pytest.mark.slow
def test_loss_and_sample_shapes_masked():
    model = _model()
    variables = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 6, 2).astype(np.float32))
    mult = rs.randint(2, 7, size=8)
    mask = jnp.asarray(
        (np.arange(6)[None, :] < mult[:, None]).astype(np.float32)[..., None]
    )
    loss, _ = model.loss(variables, jax.random.PRNGKey(1), x * mask, mask=mask)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.loss({"params": p}, jax.random.PRNGKey(1), x * mask, mask=mask)[0]
    )(variables["params"])
    gn = jax.tree_util.tree_reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0)
    assert np.isfinite(gn) and gn > 0

    for solver in ("euler", "midpoint"):
        out = model.sample(
            variables, jax.random.PRNGKey(2), n_samples=8, mask=mask,
            ode_solver=solver, ode_steps=8,
        )
        assert out.shape == (8, 6, 2)
        assert np.isfinite(np.asarray(out)).all()
        # padded rows stay zero through the self-conditioned integration
        assert np.all(np.asarray(out)[np.asarray(mask)[..., 0] == 0] == 0)

    with pytest.raises(ValueError, match="euler/midpoint"):
        model.sample(variables, jax.random.PRNGKey(2), n_samples=8, mask=mask,
                     ode_solver="rk4", ode_steps=8)


@pytest.mark.slow
def test_self_cond_input_is_consumed():
    """The vector field must actually depend on x_sc (wider input layer)."""
    model = _model()
    variables = model.init(jax.random.PRNGKey(0))
    t = jnp.full((4,), 0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 2))
    v0 = model.module.apply(variables, t, x, x_sc=jnp.zeros_like(x))
    v1 = model.module.apply(variables, t, x, x_sc=jnp.ones_like(x))
    assert float(jnp.max(jnp.abs(v0 - v1))) > 1e-4


@pytest.mark.slow
def test_training_learns_shifted_gaussian():
    """Self-cond CFM moves samples toward a 1.5 + 0.5*N(0,1) target: mean
    lands on 1.5 and the std contracts well below the N(0,1) prior's 1.0.
    (Full variance convergence needs ~1500 steps — plain CFM sits at the
    same std ~0.81 at this budget, A/B-checked — so the assertions pin the
    learning signal, not the converged value; quality runs cover the rest.)"""
    import optax

    model = _model()
    variables = model.init(jax.random.PRNGKey(0))
    params = variables["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    data_rng = np.random.RandomState(0)

    @jax.jit
    def step(params, opt_state, rng, x):
        def loss_fn(p):
            return model.loss({"params": p}, rng, x)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = jax.random.PRNGKey(0)
    first = last = None
    for i in range(500):
        x = jnp.asarray(1.5 + 0.5 * data_rng.randn(128, 6, 2).astype(np.float32))
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k, x)
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first

    out = np.asarray(
        model.sample({"params": params}, jax.random.PRNGKey(3), n_samples=256,
                     ode_solver="midpoint", ode_steps=25)
    )
    assert abs(out.mean() - 1.5) < 0.25, out.mean()
    assert 0.3 < out.std() < 0.9, out.std()


def test_log_prob_guard():
    model = _model()
    variables = model.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 6, 2))
    with pytest.raises(NotImplementedError, match="self_cond"):
        model.log_prob(variables, x, ode_steps=4)


class _ConstField:
    """Stands in for model.module: constant vector field, records eager calls."""

    def __init__(self, v: float):
        self.v = v
        self.calls = []

    def apply(self, variables, t, y, cond=None, mask=None, x_sc=None):
        try:
            self.calls.append(
                dict(
                    t=np.asarray(t), y=np.asarray(y),
                    x_sc=None if x_sc is None else np.asarray(x_sc),
                )
            )
        except Exception:
            pass  # tracers (jit) — value checks happen on outputs instead
        return jnp.full_like(y, self.v)


def test_x1_hat_scales_with_droid_t_max():
    """Training-time endpoint estimate for the droid VE path: y = x + s*tm*z
    means x1_hat = y - s*tm*v, NOT y - s*v (regression: the tm factor was
    dropped, feeding an estimate off by droid_t_max)."""
    tm = 50.0
    model = _model(loss_type="droid", droid_t_max=tm)
    rec = _ConstField(v=1.0)
    model.module = rec  # eq=False dataclass: plain attribute override
    x = jnp.asarray(np.random.RandomState(0).randn(8, 6, 2).astype(np.float32))
    loss, _ = model.loss({"params": {}}, jax.random.PRNGKey(1), x)
    assert np.isfinite(float(loss))
    assert len(rec.calls) == 2  # cold pass + conditioned pass
    cold, cond_call = rec.calls
    expected = cold["y"] - tm * cold["t"][:, None, None] * rec.v
    got = cond_call["x_sc"]
    assert got is not None
    matched = 0
    for i in range(x.shape[0]):
        if np.allclose(got[i], 0.0):
            continue  # this set drew the no-self-cond branch
        np.testing.assert_allclose(got[i], expected[i], rtol=1e-5, atol=1e-5)
        matched += 1
    assert matched > 0


def test_sampling_drift_scales_with_droid_t_max():
    """Sampling-time self-cond drift for droid must be the PHYSICAL drift
    tm * v: with a constant field v, euler from s=1 to 0 gives
    z*tm - tm*v (regression: the tm factor was dropped)."""
    tm = 50.0
    v = 0.7
    model = _model(loss_type="droid", droid_t_max=tm)
    fake = _ConstField(v=v)
    model.fold_weight_norm = lambda variables: (fake, variables)
    key = jax.random.PRNGKey(7)
    out = np.asarray(
        model.sample({"params": {}}, key, n_samples=4, ode_solver="euler",
                     ode_steps=9)
    )
    z = np.asarray(jax.random.normal(jax.random.split(key)[0], (4, 6, 2)))
    np.testing.assert_allclose(out, z * tm - tm * v, rtol=1e-4, atol=1e-4)
