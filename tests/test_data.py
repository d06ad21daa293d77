"""Data-layer tests: p4 math golden values, preprocessing semantics,
JetNet datamodule contract."""

import numpy as np
import pytest

from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.data.synthetic import synthetic_jetnet
from particle_fm_tpu.data.utils import (
    calculate_jet_features,
    center_jets,
    get_mjj,
    inverse_normalize_tensor,
    mask_data,
    masked_mean_std,
    normalize_tensor,
    one_hot_encode,
    p4s_from_ptyphims,
    ptyphims_from_p4s,
)


def test_p4_roundtrip():
    rs = np.random.RandomState(0)
    ptyphim = np.stack(
        [
            rs.uniform(10, 100, 50),
            rs.uniform(-2, 2, 50),
            rs.uniform(-3, 3, 50),
            rs.uniform(0, 20, 50),
        ],
        axis=-1,
    )
    back = ptyphims_from_p4s(p4s_from_ptyphims(ptyphim))
    np.testing.assert_allclose(back[:, 0], ptyphim[:, 0], rtol=1e-6)  # pt
    np.testing.assert_allclose(back[:, 1], ptyphim[:, 1], rtol=1e-5)  # y
    # phi wrapped to (-pi, pi]
    dphi = np.mod(back[:, 2] - ptyphim[:, 2] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dphi, 0, atol=1e-6)
    np.testing.assert_allclose(back[:, 3], ptyphim[:, 3], rtol=1e-4, atol=1e-5)  # m


def test_invariant_mass_two_particle():
    """Two massless back-to-back particles: m = 2*pt (y=0, dphi=pi)."""
    jets = np.array([[[10.0, 0.0, 0.0], [10.0, 0.0, np.pi]]])
    m = calculate_jet_features(jets[..., [1, 2, 0]][..., [0, 1, 2]])  # (eta,phi,pt)
    # build directly: calculate_jet_features expects (eta, phi, pt)
    cloud = np.array([[[0.0, 0.0, 10.0], [0.0, np.pi, 10.0]]])
    feats = calculate_jet_features(cloud)
    assert feats[0, 3] == pytest.approx(20.0, rel=1e-5)
    assert feats[0, 0] == pytest.approx(0.0, abs=1e-5)  # pt sums to zero


def test_mjj():
    jet1 = np.array([[100.0, 0.0, 0.0, 0.0]])
    jet2 = np.array([[100.0, 0.0, np.pi, 0.0]])
    assert get_mjj(jet1, jet2)[0] == pytest.approx(200.0, rel=1e-5)


def test_center_jets_zeroes_jet_axis():
    parts, _ = synthetic_jetnet(["t"], num_jets=100, num_particles=30, seed=1)
    cloud = parts[..., :3].astype(np.float64)  # (eta, phi, pt)
    centered = center_jets(cloud.copy())
    from particle_fm_tpu.data.utils import jet_etas, jet_phis

    data = centered[:, :, [2, 0, 1]]
    # centering is a single-shift approximation (like the reference): the jet
    # axis lands close to, but not exactly at, the origin
    before = cloud[:, :, [2, 0, 1]]
    assert np.abs(jet_etas(data)).max() < 0.1
    assert np.abs(jet_phis(data)).max() < 0.1
    assert np.abs(jet_etas(data)).mean() < np.abs(jet_etas(before)).mean() / 10
    # pt untouched, padding untouched
    np.testing.assert_array_equal(centered[..., 2], cloud[..., 2])


def test_mask_data_fixed_and_variable():
    parts, jets = synthetic_jetnet(["t"], num_jets=200, num_particles=30, seed=2)
    x, mask, _, _ = mask_data(parts, jets, num_particles=10, variable_jet_sizes=True)
    assert x.shape == (200, 10, 3) and mask.shape == (200, 10, 1)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    x2, mask2, _, jets2 = mask_data(parts, jets, num_particles=30, variable_jet_sizes=False)
    assert (mask2.sum(axis=(1, 2)) == 30).all()


def test_normalize_roundtrip_and_masked_stats():
    parts, _ = synthetic_jetnet(["t"], num_jets=500, num_particles=20, seed=3)
    x, mask = parts[..., :3], parts[..., 3:]
    mean, std = masked_mean_std(x, mask)
    normed = normalize_tensor(x.copy(), mean, std, sigma=5)
    back = inverse_normalize_tensor(normed, mean, std, sigma=5)
    np.testing.assert_allclose(back, x, atol=1e-5)
    # normalized real particles have std ~ sigma
    nm, ns = masked_mean_std(normed, mask)
    np.testing.assert_allclose(nm, 0, atol=5e-5)  # float32 accumulation error
    np.testing.assert_allclose(ns, 5.0, rtol=1e-5)


def test_one_hot_encode_positional():
    x = np.array([[0.0, 1.0], [3.0, 2.0]])
    out = one_hot_encode(x, categories=[0, 3], num_other_features=1)
    np.testing.assert_array_equal(out, [[1, 0, 1], [0, 1, 2]])


def test_jetnet_datamodule_contract():
    dm = JetNetDataModule(
        jet_type=("t", "q"),
        num_particles=20,
        batch_size=32,
        synthetic=True,
        synthetic_num_jets=1000,
    )
    dm.setup()
    assert dm.num_cond_features == 2 + 4  # one-hot(2) + pt,eta,mass,nparticles
    x, mask, cond = next(iter(dm.train_batches(seed=0)))
    assert x.shape == (32, 20, 3)
    assert mask.shape == (32, 20, 1)
    assert cond.shape == (32, 6)
    # padded slots zeroed after normalization
    np.testing.assert_array_equal(x * (1 - mask), 0.0)
    # normalization stats exposed for eval callbacks
    assert dm.means.shape == (3,) and dm.stds.shape == (3,)
    assert dm.tensor_test is not None and dm.mask_test is not None
    # test split is unnormalized (physical units)
    assert np.abs(dm.tensor_test[..., 2]).max() <= 1.0 + 1e-6  # ptrel
    # batches are fixed-shape across the epoch
    shapes = {b[0].shape for b in dm.train_batches(seed=1)}
    assert shapes == {(32, 20, 3)}


def test_jetnet_datamodule_no_conditioning():
    dm = JetNetDataModule(
        jet_type=("t",),
        num_particles=10,
        batch_size=64,
        synthetic=True,
        synthetic_num_jets=300,
        conditioning_type=False,
        conditioning_pt=False,
        conditioning_eta=False,
        conditioning_mass=False,
        conditioning_num_particles=False,
    )
    dm.setup()
    _, _, cond = next(iter(dm.train_batches()))
    assert cond is None
