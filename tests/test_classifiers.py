"""Classifier models + gen-vs-real datamodule + classifier-test callback."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.data.classifier import GenVsRealDataModule
from particle_fm_tpu.eval.callbacks import ClassifierEvalCallback
from particle_fm_tpu.models.classifiers import (
    HLClassifierModel,
    SetClassifierModel,
    binary_metrics,
)
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step
from particle_fm_tpu.training.trainer import Trainer
import pytest


def _separable_clouds(n=600, parts=12, seed=0):
    """'real' clouds are shifted vs 'generated' — easily separable."""
    rs = np.random.RandomState(seed)
    real = rs.randn(n, parts, 3).astype(np.float32) + 1.0
    gen = rs.randn(n, parts, 3).astype(np.float32) - 1.0
    mask = np.ones((n, parts, 1), np.float32)
    return real, gen, mask


@pytest.mark.slow
def test_epic_classifier_learns_separable(mesh):
    real, gen, mask = _separable_clouds()
    dm = GenVsRealDataModule(
        real=real, real_mask=mask, gen=gen, gen_mask=mask, batch_size=64, normalize=False
    )
    dm.setup()
    model = SetClassifierModel(
        arch="epic", n_classes=1, num_particles=12, features=3,
        net_config=dict(hid_dim=16, latent_dim=4, equiv_layers=1),
    )
    cb = ClassifierEvalCallback(every_n_epochs=1)
    trainer = Trainer(
        model=model, datamodule=dm, optimizer=make_optimizer(lr=2e-3),
        max_epochs=3, callbacks=[cb], verbose=False, mesh=mesh,
    )
    trainer.fit()
    final = trainer.metrics_history[-1]
    assert final["auroc"] > 0.9
    assert final["accuracy"] > 0.8


def test_hl_classifier(mesh):
    rs = np.random.RandomState(0)
    real = rs.randn(800, 4).astype(np.float32) + 0.8
    gen = rs.randn(800, 4).astype(np.float32) - 0.8
    dm = GenVsRealDataModule(real=real, gen=gen, batch_size=64)
    dm.setup()
    model = HLClassifierModel(features=4)
    cb = ClassifierEvalCallback(every_n_epochs=1)
    trainer = Trainer(
        model=model, datamodule=dm, optimizer=make_optimizer(lr=3e-3),
        max_epochs=4, callbacks=[cb], verbose=False, mesh=mesh,
    )
    trainer.fit()
    assert trainer.metrics_history[-1]["auroc"] > 0.9


def test_transformer_multiclass_classifier():
    model = SetClassifierModel(
        arch="transformer", n_classes=3, num_particles=10, features=3,
        net_config=dict(te_config={"model_dim": 32, "num_layers": 1,
                                   "mha_config": {"num_heads": 4}}),
    )
    variables = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 10, 3).astype(np.float32))
    mask = jnp.ones((8, 10, 1))
    labels = jnp.asarray(rs.randint(0, 3, 8))
    loss, _ = model.loss(variables, jax.random.PRNGKey(1), x, mask, labels)
    assert np.isfinite(float(loss))
    probs = model.predict(variables, x, mask)
    assert probs.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_binary_metrics():
    probs = np.array([0.9, 0.8, 0.2, 0.1])
    labels = np.array([1, 1, 0, 0])
    m = binary_metrics(probs, labels)
    assert m["accuracy"] == 1.0 and m["auroc"] == 1.0


def test_gen_vs_real_normalization_and_labels():
    real, gen, mask = _separable_clouds(n=100)
    dm = GenVsRealDataModule(real=real, real_mask=mask, gen=gen, gen_mask=mask,
                             batch_size=32, normalize=True)
    dm.setup()
    x, m, labels = next(iter(dm.train_batches()))
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert abs(labels.mean() - 0.5) < 0.3  # roughly balanced after shuffle
    np.testing.assert_array_equal(x * (1 - m), 0.0)


@pytest.mark.slow
def test_two_trunk_discriminator():
    """EPiCDiscriminator3: two DISTINCT trunks (particle + jet level), event
    logits from flattened per-jet + event features (reference
    EPiC_discriminator3 topology, epic.py:601-773)."""
    import jax
    import jax.numpy as jnp

    from particle_fm_tpu.nets.epic import EPiCDiscriminator3

    disc = EPiCDiscriminator3(hid_dim=16, latent_dim=4, equiv_layers=1,
                              num_sup_sets=2)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 10, 3).astype(np.float32))  # 4 events x 2 jets
    mask = jnp.ones((8, 10, 1))
    params = disc.init(jax.random.PRNGKey(0), x, mask=mask)
    out = disc.apply(params, x, mask=mask)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()
    # the two trunks are distinct parameter sets
    keys = params["params"].keys()
    assert "particle_trunk" in keys and "jet_trunk" in keys
    p_leaves = jax.tree_util.tree_leaves(params["params"]["particle_trunk"])
    j_leaves = jax.tree_util.tree_leaves(params["params"]["jet_trunk"])
    assert len(p_leaves) == len(j_leaves)
    assert not all(
        a.shape == b.shape and np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(p_leaves, j_leaves)
    )


def test_logit_scaler_roundtrip():
    from particle_fm_tpu.data.calo_scalers import LogitScaler

    rs = np.random.RandomState(0)
    x = rs.rand(200, 3) * [5.0, 1.0, 100.0] - [1.0, 0.0, 50.0]
    sc = LogitScaler().fit(x)
    z = sc.transform(x)
    back = sc.inverse_transform(z)
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-6)


def test_multiclass_jet_type_classification_learns(tmp_path):
    """The JetClass-era multiclass path: with the class-dependent synthetic
    generator, a set classifier must beat chance clearly on jet-type
    classification (reference jetclass_classifiers.py 10-class CE)."""
    import h5py
    import optax

    from particle_fm_tpu.data.jetclass import synthetic_jetclass_file
    from particle_fm_tpu.models.classifiers import SetClassifierModel

    path = str(tmp_path / "jetclass_mc_test.h5")
    synthetic_jetclass_file(path, num_jets=1200, num_particles=16, num_types=3, seed=3)
    with h5py.File(path, "r") as f:
        x = np.asarray(f["part_features"])
        mask = np.asarray(f["part_mask"])[..., None]
        y = np.argmax(np.asarray(f["labels"]), axis=-1)

    model = SetClassifierModel(arch="epic", n_classes=3, num_particles=16, features=3)
    variables = model.init(jax.random.PRNGKey(0))
    params = variables["params"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    xb, mb = jnp.asarray(x[:1000]), jnp.asarray(mask[:1000])
    yb = jnp.asarray(y[:1000])

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            loss, _ = model.loss({"params": p}, rng, xb, mask=mb, cond=yb, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(1)
    for i in range(150):
        rng, k = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, k)

    probs = model.predict({"params": params}, jnp.asarray(x[1000:]), mask=jnp.asarray(mask[1000:]))
    acc = float((np.argmax(np.asarray(probs), -1) == y[1000:]).mean())
    assert acc > 0.55, acc  # chance = 1/3
