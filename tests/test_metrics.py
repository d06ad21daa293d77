"""Evaluation metric tests: W1 protocol, EFP engine, KLD, FPD/KPD, generation driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.data.synthetic import synthetic_jetnet
from particle_fm_tpu.eval.efp import efps, enumerate_multigraphs
from particle_fm_tpu.eval.generation import generate_data
from particle_fm_tpu.eval.metrics import (
    calc_reverse_kld,
    calculate_all_wasserstein_metrics,
    fpd,
    histedges_equalN,
    jet_masses_from_rel,
    kl_divergence,
    kpd,
    reversed_kl_divergence_batched_bootstrapping,
    wasserstein_distance_batched,
)


def test_wasserstein_identical_distributions_near_zero():
    rs = np.random.RandomState(0)
    a = rs.randn(20000)
    b = rs.randn(20000)
    mean, std = wasserstein_distance_batched(a, b, 5000, 10)
    assert mean < 0.05
    c = rs.randn(20000) + 3.0
    mean_c, _ = wasserstein_distance_batched(a, c, 5000, 10)
    assert mean_c == pytest.approx(3.0, abs=0.15)


def test_jet_mass_two_particle_golden():
    # two massless particles, pt_rel 0.5 each, at +-phi=pi/2: m_rel = 1.0
    cloud = np.array([[[0.0, np.pi / 2, 0.5], [0.0, -np.pi / 2, 0.5]]])
    m = jet_masses_from_rel(cloud)
    assert m[0] == pytest.approx(1.0, rel=1e-5)


def test_enumerate_multigraphs_counts():
    # connected multigraphs with n vertices, d edges (up to iso):
    # n=2,d=1 -> 1 (single edge); n=2,d=2 -> 1 (doubled edge)
    assert len(enumerate_multigraphs(2, 1)) == 1
    assert len(enumerate_multigraphs(2, 2)) == 1
    # n=3,d=2 -> path only; n=3,d=3 -> triangle, path+doubled-end edge -> 2... enumerate
    assert len(enumerate_multigraphs(3, 2)) == 1
    assert len(enumerate_multigraphs(3, 3)) == 2
    # the jetnet/energyflow set (n==4, d==4) has 5 multigraphs (d<=4 prime EFPs)
    assert len(enumerate_multigraphs(4, 4)) == 5


def test_efp_golden_line_graph():
    """EFP of the single-edge graph (n=2,d=1) = sum_ij z_i z_j theta_ij —
    check against a direct O(N^2) computation."""
    rs = np.random.RandomState(0)
    cloud = rs.rand(3, 6, 3).astype(np.float32)
    from particle_fm_tpu.eval.efp import _efps_device

    eta, phi, pt = cloud[..., 0], cloud[..., 1], cloud[..., 2]
    mask = np.ones((3, 6), np.float32)
    got = np.asarray(
        _efps_device(jnp.asarray(eta), jnp.asarray(phi), jnp.asarray(pt), jnp.asarray(mask), n=2, d=1)
    )[:, 0]
    z = pt / pt.sum(axis=1, keepdims=True)
    theta = np.sqrt(
        (eta[:, :, None] - eta[:, None, :]) ** 2 + (phi[:, :, None] - phi[:, None, :]) ** 2
    )
    want = np.einsum("bij,bi,bj->b", theta, z, z)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_efps_padding_invariance():
    parts, _ = synthetic_jetnet(["t"], num_jets=50, num_particles=20, seed=0)
    cloud = parts[..., :3]
    mask = parts[..., 3:]
    dirty = cloud + (1 - mask) * 0.0  # padded entries are zero already
    e1 = efps(cloud)
    assert e1.shape == (50, 5)
    assert np.isfinite(e1).all()
    # shuffling particles leaves EFPs invariant (permutation-invariant observables)
    perm = np.random.RandomState(1).permutation(20)
    e2 = efps(cloud[:, perm])
    np.testing.assert_allclose(e1, e2, rtol=2e-3, atol=1e-9)


def test_calculate_all_wasserstein_metrics_smoke():
    parts1, _ = synthetic_jetnet(["t"], num_jets=400, num_particles=15, seed=0)
    parts2, _ = synthetic_jetnet(["t"], num_jets=400, num_particles=15, seed=1)
    w = calculate_all_wasserstein_metrics(
        parts1[..., :3], parts2[..., :3], num_eval_samples=200, num_batches=3
    )
    for k in ["w1m_mean", "w1p_mean", "w1efp_mean", "w1m_std", "w1p_std", "w1efp_std"]:
        assert np.isfinite(w[k]), k
    # same generator, different seed -> small distances
    assert w["w1m_mean"] < 0.05


def test_kld_and_equiprobable_bins():
    p = np.array([0.5, 0.5])
    q = np.array([0.9, 0.1])
    expected = 0.5 * np.log(0.5 / 0.9) + 0.5 * np.log(0.5 / 0.1)
    assert kl_divergence(p, q) == pytest.approx(expected)
    x = np.random.RandomState(0).randn(10001)
    edges = histedges_equalN(x, 10)
    counts, _ = np.histogram(x, bins=edges)
    assert counts.min() >= 990 and counts.max() <= 1010


def test_reverse_kld_self_is_small():
    rs = np.random.RandomState(0)
    a, b = rs.randn(30000), rs.randn(30000)
    kld = calc_reverse_kld(a, b, nbins=50)
    assert abs(kld) < 0.02
    mean, std = reversed_kl_divergence_batched_bootstrapping(
        a, b, num_eval_samples=5000, num_batches=4, nbins=30
    )
    assert abs(mean) < 0.05


def test_fpd_kpd_sanity():
    rs = np.random.RandomState(0)
    real = rs.randn(3000, 5)
    same = rs.randn(3000, 5)
    shifted = rs.randn(3000, 5) + 1.0
    assert fpd(real, same) < 0.05
    assert fpd(real, shifted) > 1.0
    k_same, _ = kpd(real, same, num_batches=3, batch_size=1000)
    k_shift, _ = kpd(real, shifted, num_batches=3, batch_size=1000)
    assert k_same < 0.05 and k_shift > k_same


def test_fpd_infinite_extrapolation():
    from particle_fm_tpu.eval.metrics import fpd_infinite

    rs = np.random.RandomState(1)
    real = rs.randn(20000, 5)
    same = rs.randn(20000, 5)
    shifted = rs.randn(20000, 5) + 1.0
    # identical distributions: finite-sample FD at small N is clearly biased
    # away from 0; the 1/N extrapolation should remove (most of) that bias
    biased = fpd(real[:1000], same[:1000])
    val, err = fpd_infinite(real, same, min_samples=1000, max_samples=20000,
                            num_batches=5, num_points=8)
    assert abs(val) < biased / 2
    assert np.isfinite(err)
    val_shift, _ = fpd_infinite(real, shifted, min_samples=1000,
                                max_samples=20000, num_batches=5, num_points=8)
    assert val_shift > 1.0
    # degenerate input: falls back to the plain value
    v, e = fpd_infinite(real[:40], same[:40], min_samples=30, max_samples=40,
                        num_batches=2, num_points=2)
    assert np.isfinite(v)
    # tiny eval set where the cov floor (d+2) exceeds the sample count:
    # full-set fallback, no crash (was: rng.choice replace=False ValueError)
    wide = rs.randn(30, 36)
    v2, e2 = fpd_infinite(wide, wide + 0.1)
    assert np.isfinite(v2) and np.isnan(e2)


@pytest.mark.slow
def test_generate_data_driver():
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    model = FlowMatchingModel(
        model="epic", features=3, num_particles=8, hidden_dim=8, latent=4, layers=1,
        frequencies=4, loss_type="CFM",
    )
    variables = model.init(jax.random.PRNGKey(0))
    n = 70  # not a multiple of batch_size -> exercises the padded remainder
    mask = (np.arange(8)[None, :, None] < np.random.RandomState(0).randint(2, 9, (n, 1, 1))).astype(np.float32)
    means, stds = np.array([0.1, 0.2, 0.3]), np.array([1.0, 2.0, 3.0])
    data, gen_time = generate_data(
        model,
        variables,
        num_jet_samples=n,
        batch_size=32,
        variable_set_sizes=True,
        mask=mask,
        normalized_data=True,
        means=means,
        stds=stds,
        ode_solver="midpoint",
        ode_steps=6,
    )
    assert data.shape == (n, 8, 3)
    np.testing.assert_array_equal(data * (1 - mask), 0.0)
    assert np.isfinite(data).all()
    assert gen_time >= 0.0
