"""Early stopping + median pruning (particle_fm_tpu.training.stopping)."""

import numpy as np

import pytest

from particle_fm_tpu.training.stopping import (
    EarlyStopping,
    MedianPruner,
    PruningCallback,
)


class FakeTrainer:
    def __init__(self):
        self.epoch = 0
        self.last_metrics = {}
        self.should_stop = False


def test_early_stopping_plateau():
    tr = FakeTrainer()
    es = EarlyStopping(monitor="val_loss", patience=3, mode="min")
    for epoch, loss in enumerate([1.0, 0.9, 0.91, 0.92, 0.93]):
        tr.epoch = epoch
        tr.last_metrics = {"val_loss": loss}
        es(tr)
    assert tr.should_stop  # 3 epochs without improvement after 0.9
    assert es.best == 0.9


def test_early_stopping_improvement_resets():
    tr = FakeTrainer()
    es = EarlyStopping(monitor="val_loss", patience=2, mode="min")
    for epoch, loss in enumerate([1.0, 0.99, 1.1, 0.5, 0.6, 0.55]):
        tr.epoch = epoch
        tr.last_metrics = {"val_loss": loss}
        es(tr)
        if epoch < 5:
            assert not tr.should_stop
    # missing metric is ignored
    tr.last_metrics = {}
    es(tr)


def test_early_stopping_nan_stops():
    """A non-finite monitor stops immediately (check_finite, Lightning
    default) instead of resetting patience forever."""
    tr = FakeTrainer()
    es = EarlyStopping(monitor="val_loss", patience=100, mode="min")
    tr.last_metrics = {"val_loss": float("nan")}
    es(tr)
    assert tr.should_stop
    # opt-out keeps training but never counts NaN as improvement
    tr2 = FakeTrainer()
    es2 = EarlyStopping(monitor="val_loss", patience=2, check_finite=False)
    for loss in [1.0, float("nan"), float("nan")]:
        tr2.last_metrics = {"val_loss": loss}
        es2(tr2)
    assert not tr2.should_stop and es2.best == 1.0


def test_refit_clears_should_stop(tmp_path):
    """fit() resets should_stop so a stopped trainer can be re-fit."""
    from particle_fm_tpu.data.jetnet import JetNetDataModule
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.trainer import Trainer

    dm = JetNetDataModule(jet_type=("t",), num_particles=8, batch_size=64,
                          synthetic=True, synthetic_num_jets=256)
    dm.setup()
    model = FlowMatchingModel(model="epic", features=3, num_particles=8,
                              hidden_dim=16, latent=4, layers=1, frequencies=6,
                              loss_type="CFM",
                              global_cond_dim=dm.num_cond_features,
                              local_cond_dim=dm.num_cond_features)

    def stop_now(trainer):
        trainer.should_stop = True
        return {}

    trainer = Trainer(model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
                      max_epochs=3, callbacks=[stop_now], verbose=False)
    trainer.fit()
    assert trainer.epoch == 0
    trainer.callbacks = []
    trainer.fit()  # second fit must not exit immediately
    assert trainer.epoch == 2


def test_median_pruner_semantics():
    pruner = MedianPruner(mode="min", n_startup_trials=2, n_warmup_epochs=1)
    # no pruning before n_startup_trials completed
    assert not pruner.should_prune(5, 100.0)
    pruner.complete({0: 1.0, 1: 0.8, 2: 0.6})
    assert not pruner.should_prune(2, 100.0)
    pruner.complete({0: 1.1, 1: 0.9, 2: 0.7})
    # warmup epochs are grace epochs
    assert not pruner.should_prune(0, 100.0)
    # worse than the median at epoch 2 (median 0.65) -> prune
    assert pruner.should_prune(2, 0.9)
    assert not pruner.should_prune(2, 0.5)
    # epochs no completed trial reached are never pruned
    assert not pruner.should_prune(99, 100.0)


def test_pruning_callback_stops_trainer():
    pruner = MedianPruner(mode="min", n_startup_trials=1)
    pruner.complete({0: 0.5, 1: 0.4})
    tr = FakeTrainer()
    cb = PruningCallback(pruner, monitor="val_loss")
    tr.epoch = 0
    tr.last_metrics = {"val_loss": 0.45}  # better than median 0.5
    cb(tr)
    assert not tr.should_stop and not cb.pruned
    tr.epoch = 1
    tr.last_metrics = {"val_loss": 0.9}  # worse than median 0.4
    cb(tr)
    assert tr.should_stop and cb.pruned
    assert cb.history == {0: 0.45, 1: 0.9}


@pytest.mark.slow
def test_trainer_should_stop_breaks_loop(tmp_path):
    """A callback that requests a stop ends fit() early (integration)."""
    from particle_fm_tpu.data.jetnet import JetNetDataModule
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.trainer import Trainer

    dm = JetNetDataModule(jet_type=("t",), num_particles=8, batch_size=64,
                          synthetic=True, synthetic_num_jets=256)
    dm.setup()
    model = FlowMatchingModel(model="epic", features=3, num_particles=8,
                              hidden_dim=16, latent=4, layers=2, frequencies=6,
                              loss_type="CFM",
                              global_cond_dim=dm.num_cond_features,
                              local_cond_dim=dm.num_cond_features)

    def stop_at_epoch_1(trainer):
        if trainer.epoch >= 1:
            trainer.should_stop = True
        return {}

    trainer = Trainer(model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
                      max_epochs=50, callbacks=[stop_at_epoch_1],
                      ckpt_dir=str(tmp_path / "ckpt"), verbose=False)
    trainer.fit()
    assert trainer.epoch == 1  # stopped long before max_epochs
    assert len(trainer.metrics_history) == 2
