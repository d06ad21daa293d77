"""Host->device prefetch (data/prefetch.py) — the streaming-path analogue of
the reference's DataLoader(num_workers, pin_memory)."""

import time

import jax
import numpy as np
import pytest

from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.data.prefetch import prefetch_to_device
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer


def test_prefetch_preserves_order_and_values():
    items = [np.full((4,), i) for i in range(17)]
    out = list(prefetch_to_device(iter(items), lambda a: a * 2, depth=3))
    assert len(out) == 17
    for i, a in enumerate(out):
        np.testing.assert_array_equal(a, np.full((4,), 2 * i))


def test_prefetch_depth_zero_is_inline():
    out = list(prefetch_to_device(iter([1, 2, 3]), lambda x: x + 1, depth=0))
    assert out == [2, 3, 4]


def test_prefetch_propagates_worker_exception():
    def it():
        yield 1
        raise RuntimeError("boom in producer")

    gen = prefetch_to_device(it(), lambda x: x, depth=2)
    assert next(gen) == 1
    with pytest.raises(RuntimeError, match="boom in producer"):
        list(gen)


def test_prefetch_early_abandon_does_not_hang():
    """Consumer breaks early: the worker must unblock and exit promptly."""

    def it():
        for i in range(1000):
            yield i

    gen = prefetch_to_device(it(), lambda x: x, depth=1)
    assert next(gen) == 0
    t0 = time.perf_counter()
    gen.close()  # triggers the stop event via the generator's finally
    assert time.perf_counter() - t0 < 5.0


def test_trainer_streaming_path_prefetch_matches_inline(tmp_path):
    """With the device cache disabled (the streaming regime prefetch exists
    for), prefetch_batches=2 must train bit-identically to prefetch_batches=0
    — same batches, same order, same rng schedule."""

    def run(sub, depth):
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
            log_dir=str(tmp_path / sub), verbose=False,
            cache_data_on_device=False, prefetch_batches=depth,
            check_val_every_n_epoch=100,
        )
        trainer.fit()
        return jax.device_get(trainer.state.params)

    p_pre = run("pre", 2)
    p_inl = run("inl", 0)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_pre), jax.tree_util.tree_leaves(p_inl)
    ):
        np.testing.assert_array_equal(a, b)
