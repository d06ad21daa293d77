"""Plotting suite + final-eval callback end-to-end."""

import os

import numpy as np

from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.eval.callbacks import FinalEvalCallback
from particle_fm_tpu.eval.plotting import (
    plot_data,
    plot_feature_ratios,
    plot_loss_curves,
    plot_substructure,
    prepare_data_for_plotting,
)
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer
from tests.conftest import synthetic_cloud
import pytest


@pytest.mark.slow
def test_plot_data_and_ratios(tmp_path):
    x1, m1, _ = synthetic_cloud(batch=100, n=20, seed=0)
    x2, m2, _ = synthetic_cloud(batch=100, n=20, seed=1)
    p = plot_data(x1, x2, str(tmp_path / "grid.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 10_000
    p2 = plot_feature_ratios(x1, x2, str(tmp_path / "ratios.png"))
    assert os.path.exists(p2)
    jets, mult, efps = prepare_data_for_plotting(x1, calculate_efps=True)
    assert jets.shape == (100, 4) and mult.shape == (100,) and efps.shape[-1] == 5


def test_plot_single_jets_and_per_type(tmp_path):
    from particle_fm_tpu.eval.plotting import plot_data_per_type, plot_single_jets

    x1, _, _ = synthetic_cloud(batch=60, n=20, seed=0)
    x2, _, _ = synthetic_cloud(batch=60, n=20, seed=1)
    p = plot_single_jets(x1, save_path=str(tmp_path / "jets.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 10_000
    labels = np.eye(2)[np.random.RandomState(0).randint(0, 2, 60)]
    paths = plot_data_per_type(x1, x2, labels, type_names=["t", "q"],
                               save_dir=str(tmp_path))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_plot_calo_showers(tmp_path):
    from particle_fm_tpu.data.synthetic import synthetic_calo
    from particle_fm_tpu.eval.plotting import plot_calo_showers

    x, mask, _ = synthetic_calo(30, 50, seed=0)
    p = plot_calo_showers(x, mask, save_path=str(tmp_path / "showers.png"))
    assert os.path.exists(p)


def test_plot_generation_timing(tmp_path):
    from particle_fm_tpu.eval.plotting import plot_generation_timing

    p = plot_generation_timing(
        [("a", [10, 30, 150], [1e-4, 2e-4, 9e-4]),
         ("b", [10, 30, 150], [2e-4, 3e-4, 1.5e-3])],
        save_path=str(tmp_path / "timing.png"),
    )
    assert os.path.exists(p)


@pytest.mark.slow
def test_measure_generation_timing_tiny():
    """scripts/timing_plots.py core: one (size, model) entry measured live."""
    import jax

    from particle_fm_tpu.eval.plotting import measure_generation_timing

    model = FlowMatchingModel(
        model="epic", features=3, num_particles=6, hidden_dim=8, latent=4,
        layers=1, frequencies=4, loss_type="FM-OT",
    )
    variables = model.init(jax.random.PRNGKey(0))
    sizes, times = measure_generation_timing(
        [(6, model, variables)], jets_to_generate=32, batch_size=16, ode_steps=2,
    )
    assert sizes == [6] and times[0] >= 0.0


def test_plot_loss_curves(tmp_path):
    hist = [{"epoch": i, "train_loss": 1.0 / (i + 1), "val_loss": 1.2 / (i + 1)} for i in range(5)]
    p = plot_loss_curves(hist, str(tmp_path / "loss.png"))
    assert os.path.exists(p)


def test_plot_substructure(tmp_path):
    rs = np.random.RandomState(0)
    h1 = {k: rs.rand(100) for k in ("tau21", "tau32", "d2", "jet_mass")}
    h2 = {k: rs.rand(100) for k in ("tau21", "tau32", "d2", "jet_mass")}
    p = plot_substructure(h1, h2, str(tmp_path / "sub.png"))
    assert os.path.exists(p)


@pytest.mark.slow
def test_final_eval_callback_end_to_end(tmp_path, mesh):
    dm = JetNetDataModule(
        jet_type=("t",), num_particles=10, batch_size=64,
        synthetic=True, synthetic_num_jets=700,
    )
    dm.setup()
    model = FlowMatchingModel(
        model="epic", features=3, num_particles=10, hidden_dim=16, latent=4,
        layers=1, frequencies=6, loss_type="CFM",
        global_cond_dim=dm.num_cond_features, local_cond_dim=dm.num_cond_features,
    )
    final_cb = FinalEvalCallback(
        num_samples_factor=0.5,
        generation_batch_size=64,
        ode_steps=4,
        w1_kwargs=dict(num_batches=2, num_eval_samples=50),
        use_ema=False,
        save_dir=str(tmp_path / "final"),
    )
    trainer = Trainer(
        model=model, datamodule=dm, optimizer=make_optimizer(),
        max_epochs=1, callbacks=[final_cb], verbose=False, mesh=mesh,
        ckpt_dir=str(tmp_path / "ck"), save_last_every_n_epoch=1,
    )
    trainer.fit()
    results = trainer.test(ckpt="last")
    for k in ("w1m_mean", "w1_tau21_mean", "w1_tau32_mean", "w1_d2_mean", "fpd", "kpd_median"):
        assert k in results and np.isfinite(results[k]), k
    out = tmp_path / "final"
    assert (out / "final_generated_data.npy").exists()
    assert (out / "final_eval_metrics.yml").exists()
    assert (out / "final_comparison.png").exists()
    assert (out / "substructure.png").exists()
