"""Trainer end-to-end: the full JetNet slice on synthetic data —
train -> validate -> eval callback (generation + W1) -> checkpoint -> resume."""

import os

import jax
import numpy as np
import pytest

from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.eval.callbacks import JetNetEvalCallback
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.checkpoint import CheckpointManager
from particle_fm_tpu.training.logging_scheduler import should_log
from particle_fm_tpu.training.trainer import Trainer


def make_setup(tmp_path, max_epochs=2):
    dm = JetNetDataModule(
        jet_type=("t",),
        num_particles=10,
        batch_size=64,
        synthetic=True,
        synthetic_num_jets=800,
    )
    dm.setup()
    model = FlowMatchingModel(
        model="epic",
        features=3,
        num_particles=10,
        hidden_dim=16,
        latent=4,
        layers=2,
        frequencies=6,
        loss_type="CFM",
        global_cond_dim=dm.num_cond_features,
        local_cond_dim=dm.num_cond_features,
    )
    cb = JetNetEvalCallback(
        every_n_epochs=1,
        log_epoch_zero=True,
        num_jet_samples=128,
        generation_batch_size=64,
        w1_kwargs=dict(num_batches=2, num_eval_samples=100),
        ode_steps=6,
        on_test=True,
    )
    trainer = Trainer(
        model=model,
        datamodule=dm,
        optimizer=make_optimizer(lr=1e-3),
        max_epochs=max_epochs,
        callbacks=[cb],
        ckpt_dir=str(tmp_path / "ckpt"),
        ckpt_monitors={"val_loss": "min", "w1m_mean": "min"},
        log_dir=str(tmp_path / "logs"),
        save_last_every_n_epoch=1,
        verbose=False,
    )
    return dm, model, trainer


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, mesh):
    dm, model, trainer = make_setup(tmp_path)
    state = trainer.fit()
    assert int(np.asarray(state.step)) == 2 * dm.steps_per_epoch
    # metrics logged each epoch, incl. callback metrics
    hist = trainer.metrics_history
    assert len(hist) == 2
    for m in hist:
        assert np.isfinite(m["train_loss"])
        assert np.isfinite(m["val_loss"])
        assert "w1m_mean" in m and np.isfinite(m["w1m_mean"])
        assert m["generation_time"] >= 0
    # checkpoints written
    assert trainer.ckpt.last_path() is not None
    assert trainer.ckpt.best_path("val_loss") is not None
    assert trainer.ckpt.best_path("w1m_mean") is not None
    assert os.path.exists(os.path.join(trainer.log_dir, "metrics.jsonl"))
    # test() restores best and runs on_test callbacks
    results = trainer.test(ckpt="best", monitor="w1m_mean")
    assert "w1m_mean" in results


def test_trainer_resume(tmp_path, mesh):
    dm, model, trainer = make_setup(tmp_path, max_epochs=1)
    trainer.fit()
    step1 = int(np.asarray(trainer.state.step))
    last = trainer.ckpt.last_path()
    # new trainer resumes from the checkpoint and continues to epoch 2
    dm2, model2, trainer2 = make_setup(tmp_path, max_epochs=2)
    state2 = trainer2.fit(resume_from=last)
    assert int(np.asarray(state2.step)) == 2 * dm.steps_per_epoch
    # resumed params match at restore time: epoch count continued, not restarted
    assert len(trainer2.metrics_history) == 1  # only epoch 1 ran


def test_checkpoint_topk_retention(tmp_path):
    import jax.numpy as jnp
    from flax import struct

    class S(struct.PyTreeNode):
        w: jnp.ndarray

    cm = CheckpointManager(str(tmp_path / "ck"), {"m": "min"}, top_k=2)
    for step, val in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 1.0), (5, 9.0)]:
        cm.save_metric(S(w=jnp.ones(3) * step), "m", val, step)
    cm.flush()  # async saves: join the worker before inspecting the dir
    mdir = tmp_path / "ck" / "m"
    names = sorted(os.listdir(mdir))
    # top-2 by min metric: 1.0 (step 4) and 3.0 (step 2)
    assert len(names) == 2
    assert any("metric_1.0" in n for n in names)
    assert any("metric_3.0" in n for n in names)
    best = cm.best_path("m")
    restored = cm.restore(best, S(w=jnp.zeros(3)))
    np.testing.assert_array_equal(np.asarray(restored.w), 4.0)


def test_async_checkpoint_snapshot_survives_donation(tmp_path):
    """Async saves snapshot with an on-device copy BEFORE returning, so a
    later jitted call that donates the state's buffers cannot corrupt the
    queued write — the core safety property of async_save."""
    import jax.numpy as jnp
    from flax import struct

    class S(struct.PyTreeNode):
        w: jnp.ndarray

    cm = CheckpointManager(str(tmp_path / "ck"), {"m": "min"}, top_k=1)
    assert cm.async_save
    w = jnp.arange(8.0)
    cm.save_last(S(w=w))
    donate = jax.jit(lambda a: a * 0 + 7.0, donate_argnums=(0,))
    donate(w)  # donates w's buffer (the train step does this every step)
    restored = cm.restore(cm.last_path(), S(w=jnp.zeros(8)))
    np.testing.assert_array_equal(np.asarray(restored.w), np.arange(8.0))


def test_async_checkpoint_topk_accounts_for_queued_saves(tmp_path):
    """Back-to-back save_metric calls (no flush between) must still keep
    exactly top-k: admission/pruning uses the in-memory mirror, not the
    (possibly lagging) directory listing."""
    import jax.numpy as jnp
    from flax import struct

    class S(struct.PyTreeNode):
        w: jnp.ndarray

    cm = CheckpointManager(str(tmp_path / "ck"), {"m": "min"}, top_k=1)
    assert cm.save_metric(S(w=jnp.ones(2)), "m", 5.0, 1) is not None
    assert cm.save_metric(S(w=jnp.ones(2)), "m", 2.0, 2) is not None
    assert cm.save_metric(S(w=jnp.ones(2)), "m", 3.0, 3) is None  # not top-1
    cm.flush()
    names = os.listdir(tmp_path / "ck" / "m")
    assert len(names) == 1 and "metric_2.0" in names[0]


def test_logging_schedules():
    assert should_log(5, 10) and not should_log(5, 11)
    assert should_log("epochs10000", 100)
    assert should_log("epochs10000", 1000) and should_log("epochs10000", 996)
    assert not should_log("epochs10000", 995)
    assert should_log("epochs10000", 9999)
    assert should_log("custom10000epochs", 500)
    assert not should_log("custom10000epochs", 499)
    assert should_log("nolog10000", 200) and not should_log("nolog10000", 300)


@pytest.mark.slow
def test_scanned_epoch_matches_per_step_loop(tmp_path):
    """scan_epochs=True (one jitted lax.scan per epoch) must be numerically
    identical to the per-step dispatch loop: same shuffle, same step body,
    same rng folding -> same losses and post-fit params."""
    import jax.numpy as jnp

    def run(scan, sub):
        dm = JetNetDataModule(
            jet_type=("t",), num_particles=8, batch_size=64,
            synthetic=True, synthetic_num_jets=320,
        )
        dm.setup()
        model = FlowMatchingModel(
            model="epic", features=3, num_particles=8, hidden_dim=16, latent=4,
            layers=1, frequencies=6, loss_type="CFM",
            global_cond_dim=dm.num_cond_features,
            local_cond_dim=dm.num_cond_features,
        )
        trainer = Trainer(
            model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
            max_epochs=2, callbacks=[], ckpt_dir=None,
            log_dir=str(tmp_path / sub), verbose=False, scan_epochs=scan,
        )
        trainer.fit()
        return trainer.last_metrics["train_loss"], jax.device_get(trainer.state.params)

    loss_scan, p_scan = run(True, "a")
    loss_loop, p_loop = run(False, "b")
    np.testing.assert_allclose(loss_scan, loss_loop, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_scan), jax.tree_util.tree_leaves(p_loop)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fused_epochs_match_sequential(tmp_path):
    """fuse_epochs=2 (one jitted scan-of-scans per group, on-device shuffles)
    must be numerically identical to the sequential per-epoch scan path:
    same host-seeded permutations, same step body, same rng folding."""

    def run(fuse, sub):
        dm = JetNetDataModule(
            jet_type=("t",), num_particles=8, batch_size=64,
            synthetic=True, synthetic_num_jets=320,
        )
        dm.setup()
        model = FlowMatchingModel(
            model="epic", features=3, num_particles=8, hidden_dim=16, latent=4,
            layers=1, frequencies=6, loss_type="CFM",
            global_cond_dim=dm.num_cond_features,
            local_cond_dim=dm.num_cond_features,
        )
        trainer = Trainer(
            model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
            max_epochs=4, callbacks=[], ckpt_dir=None,
            log_dir=str(tmp_path / sub), verbose=False, fuse_epochs=fuse,
            check_val_every_n_epoch=2,
        )
        trainer.fit()
        return trainer.epoch, trainer.last_metrics, jax.device_get(trainer.state.params)

    e_fused, m_fused, p_fused = run(2, "fused")
    e_seq, m_seq, p_seq = run(1, "seq")
    assert e_fused == e_seq == 3
    np.testing.assert_allclose(
        m_fused["train_loss"], m_seq["train_loss"], rtol=1e-5
    )
    np.testing.assert_allclose(m_fused["val_loss"], m_seq["val_loss"], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_fused), jax.tree_util.tree_leaves(p_seq)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_fused_epochs_partial_group(tmp_path):
    """max_epochs not a multiple of fuse_epochs: the last group is short, and
    a resume mid-group aligns back to fuse boundaries."""
    dm = JetNetDataModule(
        jet_type=("t",), num_particles=8, batch_size=64,
        synthetic=True, synthetic_num_jets=320,
    )
    dm.setup()
    model = FlowMatchingModel(
        model="epic", features=3, num_particles=8, hidden_dim=16, latent=4,
        layers=1, frequencies=6, loss_type="CFM",
        global_cond_dim=dm.num_cond_features,
        local_cond_dim=dm.num_cond_features,
    )
    trainer = Trainer(
        model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
        max_epochs=5, callbacks=[], ckpt_dir=None,
        log_dir=str(tmp_path / "p"), verbose=False, fuse_epochs=3,
        check_val_every_n_epoch=100,
    )
    trainer.fit()
    # groups: [0,1,2], [3,4] -> 5 epochs of steps exactly
    assert int(np.asarray(trainer.state.step)) == 5 * dm.steps_per_epoch
    assert trainer.epoch == 4
