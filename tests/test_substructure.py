"""Native clustering + substructure tests (builds the C++ lib on first run)."""

import numpy as np
import pytest

from particle_fm_tpu.eval.lhco_utils import cluster_data
from particle_fm_tpu.eval.substructure import compute_substructure, dump_hlvs
from particle_fm_tpu.native.binding import cluster_events, exclusive_kt_axes


def two_blob_event(n_per=20, sep=2.0, seed=0):
    """Two collimated sprays well separated in eta — must cluster to 2 jets."""
    rs = np.random.RandomState(seed)
    pts = np.concatenate([rs.uniform(10, 50, n_per), rs.uniform(10, 50, n_per)])
    etas = np.concatenate(
        [rs.normal(-sep / 2, 0.05, n_per), rs.normal(sep / 2, 0.05, n_per)]
    )
    phis = np.concatenate([rs.normal(0.0, 0.05, n_per), rs.normal(1.0, 0.05, n_per)])
    return pts[None], etas[None], phis[None]


def test_antikt_two_jets():
    pt, eta, phi = two_blob_event()
    jets, njets, const_jet = cluster_events(pt, eta, phi, R=0.8, p=-1.0, max_jets=5)
    assert njets[0] == 2
    # each jet collects exactly one blob's 20 particles
    counts = [(const_jet[0] == j).sum() for j in range(2)]
    assert sorted(counts) == [20, 20]
    # jet axes near the blob centers
    etas_found = sorted(jets[0, :2, 1])
    assert etas_found[0] == pytest.approx(-1.0, abs=0.1)
    assert etas_found[1] == pytest.approx(1.0, abs=0.1)
    # jet pt ~ scalar sum of its blob (collimated massless particles)
    assert jets[0, 0, 0] > 100


def test_kt_vs_antikt_same_hard_jets():
    pt, eta, phi = two_blob_event(seed=1)
    j_akt, n_akt, _ = cluster_events(pt, eta, phi, R=0.8, p=-1.0)
    j_kt, n_kt, _ = cluster_events(pt, eta, phi, R=0.8, p=1.0)
    assert n_akt[0] == n_kt[0] == 2
    np.testing.assert_allclose(
        sorted(j_akt[0, :2, 0]), sorted(j_kt[0, :2, 0]), rtol=1e-6
    )


def test_padding_ignored():
    pt, eta, phi = two_blob_event(seed=2)
    pt_pad = np.concatenate([pt, np.zeros((1, 30))], axis=1)
    eta_pad = np.concatenate([eta, np.ones((1, 30)) * 9], axis=1)
    phi_pad = np.concatenate([phi, np.zeros((1, 30))], axis=1)
    j1, n1, _ = cluster_events(pt, eta, phi, R=0.8, p=-1.0)
    j2, n2, _ = cluster_events(pt_pad, eta_pad, phi_pad, R=0.8, p=-1.0)
    assert n1[0] == n2[0]
    np.testing.assert_allclose(j1[0, :2], j2[0, :2], rtol=1e-9)


def test_exclusive_kt_axes_find_prongs():
    pt, eta, phi = two_blob_event(sep=1.0, seed=3)
    axes, found = exclusive_kt_axes(pt, eta, phi, R=1.5, n_axes=2)
    assert found[0] == 2
    assert sorted(axes[0, :, 0]) == pytest.approx([-0.5, 0.5], abs=0.1)


def test_tau21_discriminates_prongs():
    """A genuine 2-prong jet has tau21 << a 1-prong jet's."""
    rs = np.random.RandomState(0)
    n = 40
    # 1-prong: single collimated spray
    one = np.stack(
        [rs.normal(0, 0.05, (64, n)), rs.normal(0, 0.05, (64, n)), rs.uniform(5, 20, (64, n))],
        axis=-1,
    )
    # 2-prong: two sprays separated by dR ~ 0.8
    half = n // 2
    eta2 = np.concatenate([rs.normal(-0.4, 0.04, (64, half)), rs.normal(0.4, 0.04, (64, half))], axis=1)
    phi2 = rs.normal(0, 0.04, (64, n))
    two = np.stack([eta2, phi2, rs.uniform(5, 20, (64, n))], axis=-1)

    s1 = compute_substructure(one)
    s2 = compute_substructure(two)
    assert np.median(s2["tau21"]) < np.median(s1["tau21"])
    # D2 separates 2-prong (small) from 1-prong (large) too
    assert np.median(s2["d2"]) < np.median(s1["d2"])
    for k in ("tau1", "tau2", "tau3", "d2"):
        assert np.isfinite(s1[k]).all() and np.isfinite(s2[k]).all()


def test_dump_hlvs(tmp_path):
    import h5py

    rs = np.random.RandomState(1)
    cloud = np.stack(
        [rs.normal(0, 0.2, (16, 10)), rs.normal(0, 0.2, (16, 10)), rs.uniform(1, 5, (16, 10))],
        axis=-1,
    )
    path = str(tmp_path / "hlvs.h5")
    hlvs = dump_hlvs(cloud, path)
    with h5py.File(path, "r") as f:
        for k in ("tau21", "tau32", "d2", "jet_mass"):
            assert k in f and len(f[k]) == 16
    assert np.isfinite(hlvs["jet_mass"]).all()


def test_cluster_data_lhco_events():
    """Whole-event clouds -> top-2 jets + padded per-jet constituents."""
    rs = np.random.RandomState(4)
    b, n_per = 8, 30
    pts = np.concatenate([rs.uniform(50, 200, (b, n_per)), rs.uniform(50, 200, (b, n_per))], axis=1)
    etas = np.concatenate([rs.normal(-1, 0.1, (b, n_per)), rs.normal(1, 0.1, (b, n_per))], axis=1)
    phis = np.concatenate([rs.normal(0.5, 0.1, (b, n_per)), rs.normal(-2, 0.1, (b, n_per))], axis=1)
    events = np.stack([pts, etas, phis], axis=-1)
    jets, consts, mask = cluster_data(events, num_particles=40, R=1.0)
    assert jets.shape == (b, 2, 4)
    assert consts.shape == (b, 2, 40, 3)
    # leading jet first
    assert (jets[:, 0, 0] >= jets[:, 1, 0]).all()
    # constituents pt-sorted and masked consistently
    assert (np.diff(consts[0, 0, :, 0]) <= 1e-9).all()
    np.testing.assert_array_equal(consts * (1 - mask), 0.0)
    # each jet got ~30 constituents
    assert mask[..., 0].sum(axis=-1).mean() == pytest.approx(30, abs=2)


def test_kt_split_scales_two_prong():
    """d12 of a 2-prong jet ~ min(pt1, pt2) * dR; 1-prong d12 is small."""
    from particle_fm_tpu.native.binding import kt_split_scales

    rs = np.random.RandomState(0)
    n = 20
    # two prongs separated by dR = 0.8, each carrying ~half the pt
    half = n // 2
    pt2p = np.full((4, n), 10.0)
    eta2p = np.concatenate([np.full((4, half), -0.4), np.full((4, half), 0.4)], axis=1)
    eta2p += rs.normal(0, 0.02, (4, n))
    phi2p = rs.normal(0, 0.02, (4, n))
    d_2p = kt_split_scales(pt2p, eta2p, phi2p, R=1.0, n_scales=2)

    eta1p = rs.normal(0, 0.02, (4, n))
    d_1p = kt_split_scales(pt2p, eta1p, phi2p, R=1.0, n_scales=2)

    # 2-prong: d12 ~ 100 GeV * 0.8; 1-prong: d12 well below
    assert (d_2p[:, 0] > 50).all()
    assert (d_1p[:, 0] < d_2p[:, 0] / 3).all()
    assert (d_2p[:, 1] <= d_2p[:, 0] + 1e-9).all()  # d23 <= d12
