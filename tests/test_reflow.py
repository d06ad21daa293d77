"""ReFlow distillation: paired-coupling loss, pairs datamodule, e2e pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.data.pairs import ReflowPairsDataModule
from particle_fm_tpu.losses.flow_matching import get_loss_fn, reflow_loss
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.training.reflow import generate_pairs, straightness, student_model


def test_reflow_loss_zero_on_straight_field():
    """A field that exactly predicts x0 - x1 has ~zero reflow loss."""
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 3))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 6, 3))
    x = jnp.concatenate([x1, x0], axis=-1)
    vf = lambda t, y, cond, mask: (x0 - x1)
    loss = reflow_loss(vf, rng, x, sigma=0.0)
    assert float(loss) < 1e-10


@pytest.mark.slow
def test_reflow_loss_masked_and_wired():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
    mask = jnp.ones((4, 6, 1)).at[:, 4:].set(0.0)
    fn = get_loss_fn("reflow", sigma=1e-4)
    vf = lambda t, y, cond, m: jnp.zeros_like(y)
    loss = fn(vf, rng, x, mask)
    assert jnp.isfinite(loss)
    # padded particles must not contribute: scaling them leaves loss unchanged
    x_pad = x.at[:, 4:].mul(100.0)
    assert np.allclose(float(fn(vf, rng, x_pad, mask)), float(loss))


def test_reflow_loss_rejects_odd_features():
    with pytest.raises(ValueError):
        reflow_loss(
            lambda t, y, c, m: y, jax.random.PRNGKey(0),
            jnp.zeros((2, 3, 5)),
        )


def test_pairs_datamodule_roundtrip(tmp_path):
    x1 = np.random.randn(50, 6, 3).astype(np.float32)
    x0 = np.random.randn(50, 6, 3).astype(np.float32)
    mask = np.ones((50, 6, 1), np.float32)
    cond = np.random.randn(50, 2).astype(np.float32)
    p = tmp_path / "pairs.npz"
    np.savez(p, x1=x1, x0=x0, mask=mask, cond=cond,
             means=np.zeros(3), stds=np.ones(3))
    dm = ReflowPairsDataModule(pairs_path=str(p), batch_size=16, val_fraction=0.1)
    dm.setup()
    assert dm.train.x.shape[-1] == 6  # concat(x1, x0)
    assert len(dm.train) + len(dm.val) == 50
    assert dm.means is not None and dm.stds is not None
    xb, mb, cb = next(iter(dm.train_batches(0)))
    assert xb.shape == (16, 6, 6) and mb.shape == (16, 6, 1) and cb.shape == (16, 2)


@pytest.mark.slow
def test_reflow_e2e_tiny(tmp_path):
    """Teacher -> pairs -> student training -> few-step sampling, end to end."""
    from particle_fm_tpu.parallel.train import create_train_state, make_optimizer
    from particle_fm_tpu.training.trainer import Trainer

    teacher = FlowMatchingModel(
        model="epic", features=3, num_particles=6, hidden_dim=16,
        layers=2, latent=4, global_cond_dim=2, loss_type="CFM",
    )
    tvars = teacher.init(jax.random.PRNGKey(0))
    mask = np.ones((32, 6, 1), np.float32)
    cond = np.random.randn(32, 2).astype(np.float32)
    x1, x0, m, c = generate_pairs(
        teacher, tvars, 20, mask=mask, cond=cond, batch_size=8, ode_steps=3
    )
    assert x1.shape == (20, 6, 3) and x0.shape == (20, 6, 3)
    assert m.shape == (20, 6, 1) and c.shape == (20, 2)
    assert np.isfinite(x1).all() and np.isfinite(x0).all()

    p = tmp_path / "pairs.npz"
    np.savez(p, x1=x1, x0=x0, mask=m, cond=c)
    dm = ReflowPairsDataModule(pairs_path=str(p), batch_size=8, val_fraction=0.2)
    dm.setup()

    student = student_model(teacher)
    assert student.loss_type == "reflow"
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(student, jax.random.PRNGKey(0), opt)
    state = state.replace(
        params=tvars["params"],
        ema_params=jax.tree_util.tree_map(np.array, tvars["params"]),
    )
    tr = Trainer(model=student, datamodule=dm, optimizer=opt, max_epochs=2,
                 verbose=False, scan_epochs=False)
    tr.fit(initial_state=state)
    svars = jax.device_get(tr.state.variables(ema=False))

    s = straightness(student, svars, x1[:8], x0[:8], m[:8], c[:8], n_times=2)
    assert np.isfinite(s)

    out = student.sample(
        svars, jax.random.PRNGKey(3), cond=jnp.asarray(c[:8]),
        mask=jnp.asarray(m[:8]), ode_solver="euler", ode_steps=3,
    )
    assert out.shape == (8, 6, 3) and np.isfinite(np.asarray(out)).all()


def test_generate_pairs_guards():
    m = FlowMatchingModel(model="epic", features=3, num_particles=4,
                          hidden_dim=8, layers=1, latent=2, loss_type="droid",
                          droid_t_max=25.0)
    with pytest.raises(ValueError):
        generate_pairs(m, {}, 4, mask=np.ones((4, 4, 1)))


@pytest.mark.slow
def test_generate_pairs_diffusion_teacher():
    """Diffusion teachers rectify through the probability-flow ODE."""
    m = FlowMatchingModel(model="epic", features=3, num_particles=4,
                          hidden_dim=8, layers=1, latent=2, loss_type="diffusion",
                          diff_config={"max_sr": 0.999, "min_sr": 0.02})
    v = m.init(jax.random.PRNGKey(0))
    x1, x0, mk, _ = generate_pairs(m, v, 6, mask=np.ones((6, 4, 1), np.float32),
                                   batch_size=3, ode_steps=3)
    assert x1.shape == (6, 4, 3) and np.isfinite(x1).all() and np.isfinite(x0).all()
