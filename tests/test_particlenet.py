"""ParticleNet (kNN EdgeConv) + JetClass classifier workflow tests.

Parity targets: weaver's ParticleNet as wrapped by the reference
(models/jetclass_classifiers.py:318-557) and the classifier-test datamodule
(data/jetclass_classifier_datamodule.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from particle_fm_tpu.nets.particlenet import (
    ParticleNet,
    gather_neighbors,
    knn_indices,
)


def test_knn_indices_exact():
    # 1-D points at 0, 1, 3, 7: nearest neighbour of 0 is 1, of 3 is 1, ...
    pts = jnp.array([[[0.0], [1.0], [3.0], [7.0]]])
    idx = knn_indices(pts, None, k=1)
    assert idx.shape == (1, 4, 1)
    np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), [1, 0, 1, 2])


def test_knn_excludes_masked_and_self():
    pts = jnp.array([[[0.0], [0.001], [0.002], [100.0]]])
    mask = jnp.array([[[1.0], [1.0], [0.0], [1.0]]])  # particle 2 is padding
    idx = knn_indices(pts, mask, k=2)
    for i in range(4):
        assert i not in np.asarray(idx[0, i]), "self selected as neighbour"
    # padded particle 2 must never appear as a neighbour of a real particle
    for i in (0, 1, 3):
        assert 2 not in np.asarray(idx[0, i])


def test_gather_neighbors():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    idx = jnp.array([[[1], [0], [3], [2]]])
    out = gather_neighbors(feats, idx)
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), np.asarray(feats[0, 1]))
    np.testing.assert_array_equal(np.asarray(out[0, 2, 0]), np.asarray(feats[0, 3]))


@pytest.fixture(scope="module")
def pnet_setup():
    net = ParticleNet(
        num_classes=2,
        conv_params=((4, (8, 8)), (4, (16, 16))),
        fc_params=((16, 0.1),),
    )
    rs = np.random.RandomState(0)
    b, n, f = 3, 12, 5
    x = rs.randn(b, n, f).astype(np.float32)
    points = x[..., :2]
    mask = (np.arange(n)[None, :] < rs.randint(4, n + 1, b)[:, None]).astype(np.float32)[
        ..., None
    ]
    x = x * mask
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(points), jnp.asarray(x),
                         mask=jnp.asarray(mask))
    return net, variables, points, x, mask


def test_particlenet_forward_shape(pnet_setup):
    net, variables, points, x, mask = pnet_setup
    logits = net.apply(variables, jnp.asarray(points), jnp.asarray(x), mask=jnp.asarray(mask))
    assert logits.shape == (3, 2)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_particlenet_padding_invariance(pnet_setup):
    """Appending fully-masked particles must not change the logits (the kNN
    exclusion + masked pooling contract)."""
    net, variables, points, x, mask = pnet_setup
    logits = net.apply(variables, jnp.asarray(points), jnp.asarray(x), mask=jnp.asarray(mask))
    pad = 4
    x2 = np.concatenate([x, 999.0 * np.ones((3, pad, x.shape[-1]), np.float32)], axis=1)
    p2 = x2[..., :2]
    m2 = np.concatenate([mask, np.zeros((3, pad, 1), np.float32)], axis=1)
    logits2 = net.apply(variables, jnp.asarray(p2), jnp.asarray(x2), mask=jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-4)


def test_set_classifier_particlenet_trains():
    from particle_fm_tpu.models.classifiers import SetClassifierModel

    model = SetClassifierModel(
        arch="particlenet",
        n_classes=2,
        num_particles=8,
        features=4,
        net_config=dict(
            point_indices=(0, 1),
            conv_params=((3, (8, 8)),),
            fc_params=((8, 0.0),),
        ),
    )
    variables = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(16, 8, 4).astype(np.float32))
    mask = jnp.ones((16, 8, 1))
    labels = jnp.asarray(rs.randint(0, 2, 16).astype(np.float32))[:, None]
    loss, _ = model.loss(variables, jax.random.PRNGKey(1), x, mask=mask, cond=labels, train=True)
    assert np.isfinite(float(loss))
    probs = model.predict(variables, x, mask=mask)
    assert probs.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_reinit_head_keeps_trunk():
    from particle_fm_tpu.models.classifiers import SetClassifierModel

    model = SetClassifierModel(
        arch="transformer", n_classes=10, num_particles=8, features=3,
        net_config=dict(te_config=dict(model_dim=16, num_layers=1)),
    )
    variables = model.init(jax.random.PRNGKey(0))
    out = model.reinit_head(variables, jax.random.PRNGKey(42))
    # trunk unchanged
    for key in variables["params"]:
        if key.startswith("head"):
            continue
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            variables["params"][key], out["params"][key],
        )
    # head re-drawn
    changed = jax.tree_util.tree_reduce(
        lambda acc, leaf: acc or bool(leaf),
        jax.tree_util.tree_map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            variables["params"]["head"], out["params"]["head"],
        ),
        False,
    )
    assert changed, "head params were not reinitialised"


# ---------------------------------------------------------------- datamodule


def test_jetclass_classifier_dm_synthetic():
    from particle_fm_tpu.data.jetclass_classifier import JetClassClassifierDataModule

    dm = JetClassClassifierDataModule(
        synthetic=True, synthetic_num_jets=300, synthetic_num_particles=12,
        batch_size=32,
        pf_features_list=["part_etarel", "part_dphi", "log_part_pt", "part_deltaR"],
        used_flavor="QCD",
    )
    dm.setup()
    assert dm.train.x.shape[-1] == 4
    assert dm.train.mask is not None
    # labels present and mixed
    y = np.concatenate([dm.train.cond, dm.val.cond, dm.test.cond])
    assert set(np.unique(y)) == {0.0, 1.0}
    # gen=1 / sim=0 are balanced before flavor cut (same cond arrays)
    assert 0.4 < y.mean() < 0.6
    # no NaNs from log features on padded particles
    assert np.isfinite(dm.train.x).all()
    # padded particles are zeroed
    assert float(np.abs(dm.train.x * (1 - dm.train.mask)).max()) == 0.0


def test_jetclass_classifier_dm_hl_mode():
    from particle_fm_tpu.data.jetclass_classifier import JetClassClassifierDataModule

    dm = JetClassClassifierDataModule(
        synthetic=True, synthetic_num_jets=200, batch_size=32,
        use_hl_features=True, hl_features_list=["tau1", "tau2", "tau3"],
    )
    dm.setup()
    assert dm.train.x.ndim == 2 and dm.train.x.shape[-1] == 3
    assert dm.train.mask is None


@pytest.mark.slow
def test_classifier_test_script_jetclass_mode(tmp_path, monkeypatch):
    """scripts/classifier_test.py --data_file: the JetClass workflow runs on a
    classifier h5 with the particlenet arch and fine-tune-from-pretrained
    (head reinit) end-to-end."""
    import sys
    from pathlib import Path

    import h5py

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "scripts"))
    rs = np.random.RandomState(0)
    n, npart = 120, 8
    path = str(tmp_path / "classifier_data.h5")
    with h5py.File(path, "w") as f:
        for tag, shift in (("gen", 0.3), ("sim", 0.0)):
            parts = rs.randn(n, npart, 3).astype(np.float32) + shift
            parts[..., 2] = np.abs(parts[..., 2])
            d = f.create_dataset(f"part_data_{tag}", data=parts)
            d.attrs["names"] = ["part_etarel", "part_dphi", "part_ptrel"]
            f.create_dataset(f"part_mask_{tag}", data=np.ones((n, npart, 1), np.float32))
            cond = np.concatenate(
                [np.ones((n, 1), np.float32),
                 rs.uniform(400, 900, (n, 1)).astype(np.float32),
                 rs.randn(n, 1).astype(np.float32)], axis=-1)
            d = f.create_dataset(f"cond_data_{tag}", data=cond)
            d.attrs["names"] = ["jet_type_label_Tbqq", "jet_pt", "jet_eta"]

    import classifier_test as ct

    monkeypatch.setattr(
        sys, "argv",
        ["classifier_test.py", "--run_dir", str(tmp_path), "--data_file", path,
         "--arch", "particlenet", "--epochs", "2", "--batch_size", "32"],
    )
    out = ct.main()
    assert 0.0 <= out["classifier_auc"] <= 1.0
    assert (tmp_path / "classifier_test.yaml").exists()


def test_jetclass_classifier_dm_h5_roundtrip(tmp_path):
    """Write the eval_ckpt classifier-h5 schema, read it back through the DM."""
    import h5py

    rs = np.random.RandomState(0)
    n, npart = 60, 10
    parts = rs.randn(n, npart, 3).astype(np.float32)
    parts[..., 2] = np.abs(parts[..., 2])
    mask = np.ones((n, npart, 1), np.float32)
    cond = np.concatenate(
        [np.ones((n, 1), np.float32), rs.uniform(400, 900, (n, 1)).astype(np.float32),
         rs.randn(n, 1).astype(np.float32)], axis=-1
    )
    path = str(tmp_path / "classifier_data.h5")
    with h5py.File(path, "w") as f:
        for tag in ("gen", "sim"):
            d = f.create_dataset(f"part_data_{tag}", data=parts)
            d.attrs["names"] = ["part_etarel", "part_dphi", "part_ptrel"]
            f.create_dataset(f"part_mask_{tag}", data=mask)
            d = f.create_dataset(f"cond_data_{tag}", data=cond)
            d.attrs["names"] = ["jet_type_label_Tbqq", "jet_pt", "jet_eta"]
    with h5py.File(path.replace(".h5", "_substructure.h5"), "w") as f:
        for name in ("d2", "tau1", "tau2", "tau21", "tau3", "tau32"):
            f.create_dataset(f"{name}_gen", data=rs.rand(n).astype(np.float32))
            f.create_dataset(f"{name}_sim", data=rs.rand(n).astype(np.float32))

    from particle_fm_tpu.data.jetclass_classifier import JetClassClassifierDataModule

    dm = JetClassClassifierDataModule(
        data_file=path, batch_size=16, used_flavor="Tbqq", kin_only=True,
    )
    dm.setup()
    assert dm.train.x.shape[-1] == 7  # PF_FEATURES_KIN
    assert len(dm.train.x) + len(dm.val.x) + len(dm.test.x) == 2 * n


@pytest.mark.slow
def test_reinit_head_epic_and_particlenet_scopes():
    """reinit_head must replace ONLY the head modules: epic keeps its
    fc_l*/fc_g* trunk embeds and epic_layer_* blocks; particlenet replaces
    the nested particle_net/head."""
    from particle_fm_tpu.models.classifiers import SetClassifierModel

    def changed(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    m = SetClassifierModel(arch="epic", n_classes=10, num_particles=8, features=3)
    v = m.init(jax.random.PRNGKey(0))
    out = m.reinit_head(v, jax.random.PRNGKey(42))
    for k in v["params"]:
        if k in ("fc_d1", "fc_d2", "fc_out"):
            assert changed(v["params"][k], out["params"][k]), k
        else:
            assert not changed(v["params"][k], out["params"][k]), k

    m = SetClassifierModel(arch="particlenet", n_classes=10, num_particles=8, features=3)
    v = m.init(jax.random.PRNGKey(0))
    out = m.reinit_head(v, jax.random.PRNGKey(42))
    net_key = "particle_net"
    for k in v["params"][net_key]:
        sub_changed = changed(v["params"][net_key][k], out["params"][net_key][k])
        assert sub_changed == (k == "head"), (k, sub_changed)
