"""LHCO / JetClass / CaloChallenge datamodule tests (synthetic sources)."""

import numpy as np
import pytest

from particle_fm_tpu.data.calo import CaloChallengeDataModule
from particle_fm_tpu.data.calo_scalers import DQ, LogitTransformer, ScalerBase, SqrtTransformer
from particle_fm_tpu.data.jetclass import JetClassDataModule, synthetic_jetclass_file
from particle_fm_tpu.data.lhco import (
    LHCODataModule,
    LHCOJetFeatureDataModule,
    LHCOWholeEventDataModule,
)


def test_lhco_sideband_sr_split():
    dm = LHCODataModule(jet_type="x", num_particles=32, batch_size=32,
                        synthetic=True, synthetic_num_events=2000)
    dm.setup()
    # SB and SR windows
    assert ((dm.mjj > 2300) & (dm.mjj < 3300) | (dm.mjj > 3700) & (dm.mjj < 5000)).all()
    assert ((dm.mjj_sr > 3300) & (dm.mjj_sr < 3700)).all()
    x, m, c = next(iter(dm.train_batches()))
    assert x.shape == (32, 32, 3) and m.shape == (32, 32, 1)
    assert c.shape[-1] == 4  # jet features (pt, eta, phi, m)
    np.testing.assert_array_equal(x * (1 - m), 0.0)
    # SR twins exposed for the SR eval callbacks
    assert dm.tensor_test_sr is not None and dm.mask_test_sr is not None
    assert dm.tensor_conditioning_test_sr is not None


def test_lhco_jet_modes():
    for mode, extra in [("y", 1), ("all", 2), ("all_one_pc", 1)]:
        dm = LHCODataModule(jet_type=mode, num_particles=16, batch_size=16,
                            synthetic=True, synthetic_num_events=600)
        dm.setup()
        x, m, c = next(iter(dm.train_batches()))
        if mode == "all_one_pc":
            assert x.shape[1] == 32  # both jets merged: 2 x 16 particles
        else:
            assert x.shape[1] == 16
        assert np.isfinite(x).all()


def test_lhco_log_pt_and_pt_standardization():
    dm = LHCODataModule(jet_type="x", num_particles=16, batch_size=16,
                        log_pt=True, pt_standardization=True,
                        synthetic=True, synthetic_num_events=800)
    dm.setup()
    x, m, _ = next(iter(dm.train_batches()))
    assert np.isfinite(x).all()
    np.testing.assert_array_equal(x * (1 - m), 0.0)


def test_lhco_jet_features():
    dm = LHCOJetFeatureDataModule(batch_size=32, synthetic=True, synthetic_num_events=1500)
    dm.setup()
    x, m, c = next(iter(dm.train_batches()))
    assert m is None
    assert x.shape == (32, 10)  # 2 jets x (pt, eta, phi, m) + 2 multiplicities
    assert c.shape == (32, 1)  # mjj conditioning
    assert dm.tensor_test_sr is not None


def test_lhco_whole_event():
    dm = LHCOWholeEventDataModule(num_particles=32, batch_size=16,
                                  synthetic=True, synthetic_num_events=1200)
    dm.setup()
    x, m, c = next(iter(dm.train_batches()))
    assert x.shape == (16, 32, 3) and m.shape == (16, 32, 1)
    assert c.shape == (16, 1)  # mjj conditioning
    assert np.isfinite(x).all()
    np.testing.assert_array_equal(x * (1 - m), 0.0)
    # SR twins for the anomaly pipeline
    assert dm.tensor_test_sr is not None and dm.mask_test_sr is not None
    assert dm.tensor_conditioning_test_sr is not None
    # eval tensors stay in physical units: per-feature scale differs from the
    # sigma-normalized train split
    assert dm.tensor_train.shape == dm.train.x.shape


def test_lhco_whole_event_fixed_size_keeps_cond_aligned():
    """variable_jet_sizes=False drops events via mask_data; mjj conditioning
    must shrink with them (was: cond kept all events, silently misaligned)."""
    dm = LHCOWholeEventDataModule(num_particles=16, batch_size=8,
                                  variable_jet_sizes=False,
                                  synthetic=True, synthetic_num_events=1500)
    dm.setup()
    n = len(dm.train.x) + len(dm.val.x) + len(dm.test.x)
    nc = (len(dm.tensor_conditioning_train) + len(dm.tensor_conditioning_val)
          + len(dm.tensor_conditioning_test))
    assert n == nc
    assert len(dm.train.x) == len(dm.train.cond)


def test_small_split_yields_one_short_batch():
    """A train split smaller than batch_size must yield one short batch,
    not zero batches (was: silent NaN epoch loss)."""
    dm = LHCOJetFeatureDataModule(batch_size=4096, set_data=True,
                                  synthetic=True, synthetic_num_events=800)
    dm.setup()
    batches = list(dm.train_batches(seed=0))
    assert len(batches) == 1
    assert len(batches[0][0]) == len(dm.train.x)
    dm2 = LHCODataModule(jet_type="x", num_particles=16, batch_size=4096,
                         synthetic=True, synthetic_num_events=500)
    dm2.setup()
    assert len(list(dm2.train_batches(seed=0))) == 1


def test_jetclass_datamodule(tmp_path):
    files = {}
    for i, split in enumerate(["train", "val", "test"]):
        path = str(tmp_path / f"{split}.h5")
        synthetic_jetclass_file(path, num_jets=400, num_particles=16, num_types=3, seed=i)
        files[split] = path
    dm = JetClassDataModule(
        filename_dict=files,
        batch_size=32,
        used_jet_types=["QCD", "Hbb"],
        conditioning_jet_type=True,
        conditioning_pt=True,
        conditioning_mass=True,
    )
    dm.setup()
    x, m, c = next(iter(dm.train_batches()))
    assert x.shape == (32, 16, 3)
    assert c.shape[-1] == 2 + 2  # 2 one-hot + pt + sdmass
    assert dm.num_cond_features == 4
    assert "jet_type_label_QCD" in dm.names_conditioning
    # only the used jet types survive the filter
    assert set(np.unique(np.argmax(dm.labels_train, axis=1))) <= {0, 1}
    # eval tensors are unstandardized (std=1, mean=0 here so equal x up to sigma)
    assert dm.tensor_train.shape[-1] == 3
    assert dm.min_max_train_dict  # per-feature training ranges recorded


def test_calo_datamodule_bucketing():
    dm = CaloChallengeDataModule(batch_size=64, synthetic=True, synthetic_num_showers=500,
                                 bucket_multiple=32, max_hits=200)
    dm.setup()
    shapes = set()
    total = 0
    for x, m, c in dm.train_batches(seed=0):
        assert x.shape[1] % 32 == 0 or x.shape[1] == 200  # bucket or max_hits cap
        assert c.shape[-1] == 1
        np.testing.assert_array_equal(x * (1 - m), 0.0)
        shapes.add(x.shape[1])
        total += len(x)
    assert total == len(dm._splits["train"][0])
    assert len(shapes) <= 200 // 32 + 1  # bounded number of compiled shapes


def test_calo_token_budget():
    dm = CaloChallengeDataModule(batch_size=256, synthetic=True, synthetic_num_showers=300,
                                 bucket_multiple=32, max_hits=200,
                                 max_tokens_per_batch=4000)
    dm.setup()
    for x, m, c in dm.train_batches(seed=1):
        assert x.shape[0] == 1 or x.shape[0] * x.shape[1] <= 4000


def test_calo_alpha_rotation():
    dm = CaloChallengeDataModule(batch_size=32, synthetic=True, synthetic_num_showers=200,
                                 rotate_alpha=True, n_alpha_bins=16, max_hits=200)
    dm.setup()
    x, m, _ = next(iter(dm.train_batches(seed=0)))
    assert (x[..., 2][m[..., 0] > 0] < 16).all()
    assert (x[..., 2][m[..., 0] > 0] >= 0).all()


def test_calo_scalers_roundtrip():
    rs = np.random.RandomState(0)
    pts = np.abs(rs.rand(500, 3)) * np.array([10.0, 0.9, 5.0]) + 1e-3
    from sklearn.preprocessing import StandardScaler

    sb = ScalerBase([StandardScaler(), LogitTransformer(), SqrtTransformer()],
                    ["e", "frac", "r"])
    sb.fit(pts)
    tr = sb.transform(pts)
    back = sb.inverse_transform(tr)
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)
    dq = DQ(seed=1)
    grid = rs.randint(0, 10, size=(100, 1)).astype(float)
    np.testing.assert_array_equal(dq.inverse_transform(dq.transform(grid)), grid)
