"""ParT classifier: pairwise interaction features + biased-attention net.

Reference: the JetClass classifier test wraps weaver's ParticleTransformer
with pair_input_dim=4, pair_embed_dims=[64,64,64]
(particle_fm/models/jetclass_classifiers.py:28-44); nets/part.py is the
native implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.nets.part import ParTClassifierNet, pairwise_features
import pytest

TINY = dict(
    embed_dims=(16, 16),
    num_heads=2,
    num_layers=2,
    num_cls_layers=1,
    pair_embed_dims=(8, 8),
    ffn_mult=2,
    pt_transform="identity",
)


@pytest.mark.slow
def test_pairwise_features_formulas():
    """lnDelta/lnkT/lnz/lnm2 vs explicit numpy formulas, incl. phi wrap."""
    pt = np.array([[1.5, 0.5, 2.0]], np.float32)
    eta = np.array([[0.1, -0.4, 0.25]], np.float32)
    phi = np.array([[3.0, -3.0, 0.5]], np.float32)  # pair (0,1) wraps: |dphi|<pi
    mask = np.ones((1, 3, 1), np.float32)

    feats, pm = pairwise_features(jnp.asarray(pt), jnp.asarray(eta), jnp.asarray(phi),
                                  jnp.asarray(mask))
    feats = np.asarray(feats)
    assert feats.shape == (1, 3, 3, 4)

    for i, j in [(0, 1), (0, 2), (1, 2)]:
        deta = eta[0, i] - eta[0, j]
        dphi = (phi[0, i] - phi[0, j] + np.pi) % (2 * np.pi) - np.pi
        delta = np.hypot(deta, dphi)
        ptmin = min(pt[0, i], pt[0, j])
        m2 = 2 * pt[0, i] * pt[0, j] * (np.cosh(deta) - np.cos(dphi))
        np.testing.assert_allclose(feats[0, i, j, 0], np.log(delta), rtol=1e-5)
        np.testing.assert_allclose(feats[0, i, j, 1], np.log(ptmin * delta), rtol=1e-5)
        np.testing.assert_allclose(
            feats[0, i, j, 2], np.log(ptmin / (pt[0, i] + pt[0, j])), rtol=1e-5
        )
        np.testing.assert_allclose(feats[0, i, j, 3], np.log(m2), rtol=1e-5)
        # symmetric in (i, j)
        np.testing.assert_allclose(feats[0, i, j], feats[0, j, i], rtol=1e-6)
    # pair (0,1) really crossed the wrap: raw diff is 6.0, wrapped ~ -0.283
    assert abs(feats[0, 0, 1, 0] - np.log(np.hypot(0.5, 6.0))) > 0.5


def test_pairwise_features_padded_pairs_finite():
    """Padded particles (zeros) must produce zero features, not NaN/inf."""
    pt = np.array([[1.0, 0.0, 0.0]], np.float32)
    eta = np.zeros((1, 3), np.float32)
    phi = np.zeros((1, 3), np.float32)
    mask = np.array([[[1.0], [0.0], [0.0]]], np.float32)
    feats, pm = pairwise_features(jnp.asarray(pt), jnp.asarray(eta), jnp.asarray(phi),
                                  jnp.asarray(mask))
    assert np.isfinite(np.asarray(feats)).all()
    assert np.abs(np.asarray(feats)[0, 1:, :, :]).sum() == 0.0
    assert np.abs(np.asarray(feats)[0, :, 1:, :]).sum() == 0.0


def test_part_kin_stats_unnormalize():
    """With kin_means/kin_stds, logits on z-scored inputs equal logits of a
    stats-free net whose inputs are raw (the pairwise features see physical
    kinematics either way). Embedding path differs only by the affine input,
    so compare against feeding the normalized x to a net given raw kinematics
    via the stats — i.e. the stats must exactly invert the z-score."""
    rs = np.random.RandomState(3)
    raw = np.abs(rs.randn(2, 5, 3)).astype(np.float32)  # positive pt etc.
    mu = raw.reshape(-1, 3).mean(0)
    sd = raw.reshape(-1, 3).std(0)
    xn = (raw - mu) / sd
    mask = np.ones((2, 5, 1), np.float32)

    net = ParTClassifierNet(
        n_classes=2, kin_means=tuple(mu.tolist()), kin_stds=tuple(sd.tolist()), **TINY
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(xn), mask=jnp.asarray(mask))

    # the pairwise features the net computes from (xn, stats) == from raw
    from particle_fm_tpu.nets.part import pairwise_features

    f_norm, _ = pairwise_features(
        jnp.asarray(xn[..., 2] * sd[2] + mu[2]),
        jnp.asarray(xn[..., 0] * sd[0] + mu[0]),
        jnp.asarray(xn[..., 1] * sd[1] + mu[1]),
        jnp.asarray(mask),
    )
    f_raw, _ = pairwise_features(
        jnp.asarray(raw[..., 2]), jnp.asarray(raw[..., 0]), jnp.asarray(raw[..., 1]),
        jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(f_norm), np.asarray(f_raw), rtol=1e-4, atol=1e-5)

    # and the full forward is finite + shape-correct with the stats wired in
    logits = net.apply(variables, jnp.asarray(xn), mask=jnp.asarray(mask))
    assert logits.shape == (2, 2) and np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_part_padding_invariance():
    """Appending fully-masked particles must not change the logits."""
    net = ParTClassifierNet(n_classes=2, **TINY)
    rs = np.random.RandomState(0)
    x = rs.randn(3, 6, 3).astype(np.float32)
    x[..., 2] = np.abs(x[..., 2]) + 0.1  # positive pt channel
    mask = np.ones((3, 6, 1), np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))
    logits = net.apply(variables, jnp.asarray(x), mask=jnp.asarray(mask))

    pad = 3
    x2 = np.concatenate([x, 99.0 * np.ones((3, pad, 3), np.float32)], axis=1)
    m2 = np.concatenate([mask, np.zeros((3, pad, 1), np.float32)], axis=1)
    logits2 = net.apply(variables, jnp.asarray(x2), mask=jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=2e-4)


@pytest.mark.slow
def test_part_gradients_finite_with_padding():
    """The log-clamped pair features must not inject NaNs into the grads."""
    net = ParTClassifierNet(n_classes=2, **TINY)
    rs = np.random.RandomState(1)
    x = rs.randn(4, 6, 3).astype(np.float32)
    mask = (np.arange(6)[None, :, None] < rs.randint(2, 7, 4)[:, None, None]).astype(
        np.float32
    )
    x = x * mask
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), mask=jnp.asarray(mask))
    labels = jnp.asarray(rs.randint(0, 2, 4))

    def loss_fn(params):
        logits = net.apply({"params": params}, jnp.asarray(x), mask=jnp.asarray(mask))
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(4), labels]
        )

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


@pytest.mark.slow
def test_part_learns_pair_structure(mesh):
    """Classes that differ ONLY in intra-jet angular correlations.

    Class 0: all particles share one (random) phi -> pairwise Delta ~ 0.
    Class 1: particle phis independent -> large Delta. The per-particle
    marginals are identical (uniform phi), so this is the pairwise
    interaction path earning its keep."""
    from particle_fm_tpu.data.classifier import GenVsRealDataModule
    from particle_fm_tpu.eval.callbacks import ClassifierEvalCallback
    from particle_fm_tpu.models.classifiers import SetClassifierModel
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.trainer import Trainer

    rs = np.random.RandomState(0)
    n, parts = 512, 8

    def jets(collimated: bool) -> np.ndarray:
        eta = 0.1 * rs.randn(n, parts)
        if collimated:
            phi = np.repeat(rs.uniform(-np.pi, np.pi, (n, 1)), parts, axis=1)
            phi += 0.02 * rs.randn(n, parts)
        else:
            phi = rs.uniform(-np.pi, np.pi, (n, parts))
        pt = 0.5 + 0.1 * np.abs(rs.randn(n, parts))
        return np.stack([eta, phi, pt], axis=-1).astype(np.float32)

    mask = np.ones((n, parts, 1), np.float32)
    dm = GenVsRealDataModule(
        real=jets(True), real_mask=mask, gen=jets(False), gen_mask=mask,
        batch_size=64, normalize=False,
    )
    dm.setup()
    model = SetClassifierModel(
        arch="part", n_classes=1, num_particles=parts, features=3, net_config=TINY
    )
    trainer = Trainer(
        model=model, datamodule=dm, optimizer=make_optimizer(lr=2e-3),
        max_epochs=4, callbacks=[ClassifierEvalCallback(every_n_epochs=1)],
        verbose=False, mesh=mesh,
    )
    trainer.fit()
    assert trainer.metrics_history[-1]["auroc"] > 0.9
