"""Gradient accumulation (`trainer.accumulate_grad_batches`).

Reference surface: pytorch_lightning Trainer(accumulate_grad_batches=A),
available to every reference config's trainer group. The TPU-native step
(parallel/train.py::_build_accum_step_fn) scans the A microbatch backward
passes inside ONE jitted program (single-microbatch activation memory) and
applies one weighted-average optimizer update — weighted by the model's
loss-normalization mass so masked losses match the big-batch gradient
exactly, which these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.models.classifiers import HLClassifierModel
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.mesh import make_mesh
from particle_fm_tpu.parallel.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from particle_fm_tpu.training.trainer import Trainer


def _tiny_model(dm):
    return FlowMatchingModel(
        model="epic",
        features=3,
        num_particles=8,
        hidden_dim=16,
        latent=4,
        layers=1,
        frequencies=6,
        loss_type="CFM",
        global_cond_dim=dm.num_cond_features,
        local_cond_dim=dm.num_cond_features,
    )


@pytest.mark.slow
def test_accum_step_matches_manual_weighted_average():
    """One accum step == manual per-microbatch grads, mask-weighted average,
    one optax update — the wiring (rng folding, weights, single update,
    step count) has no room to drift."""
    dm = JetNetDataModule(
        jet_type=("t",), num_particles=8, batch_size=32,
        synthetic=True, synthetic_num_jets=256,
    )
    dm.setup()
    model = _tiny_model(dm)
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)

    # two microbatches with DIFFERENT mask counts (the weighting must matter);
    # the synthetic 8-particle sets are all full, so drop particles by hand
    x = jnp.asarray(dm.train.x[:64]).reshape(2, 32, 8, 3)
    m = jnp.asarray(dm.train.mask[:64]).reshape(2, 32, 8, 1)
    m = m.at[1, :, 5:].set(0.0)  # microbatch 1: 3 fewer particles per set
    c = jnp.asarray(dm.train.cond[:64]).reshape(2, 32, -1)
    assert float(m[0].sum()) != float(m[1].sum()), "fixture must have unequal masks"

    rng = jax.random.PRNGKey(7)

    # manual reference FIRST (the jitted step donates state's buffers):
    # same rng schedule, weighted by mask.sum()
    step_rng = jax.random.fold_in(rng, state.step)
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    wsum, lsum = 0.0, 0.0
    for i in range(2):
        rng_i = jax.random.fold_in(step_rng, i)

        def loss_fn(params, i=i, rng_i=rng_i):
            return model.loss(
                {"params": params}, rng_i, x[i], mask=m[i], cond=c[i], train=True
            )

        (li, _), gi = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        w = float(m[i].sum())
        gsum = jax.tree_util.tree_map(lambda a, g: a + w * g, gsum, gi)
        wsum += w
        lsum += w * float(li)
    grads = jax.tree_util.tree_map(lambda a: a / wsum, gsum)
    updates, _ = opt.update(grads, state.opt_state, state.params)
    expect_params = jax.device_get(optax.apply_updates(state.params, updates))

    step = make_train_step(model, opt, mesh=make_mesh(), accum=2)
    new_state, loss = step(state, rng, x, m, c)

    np.testing.assert_allclose(float(loss), lsum / wsum, rtol=1e-4)
    assert int(np.asarray(new_state.step)) == 1  # ONE optimizer step
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(new_state.params)),
        jax.tree_util.tree_leaves(jax.device_get(expect_params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_accum_equals_big_batch_for_deterministic_loss():
    """For a loss that ignores rng and normalizes per-sample (HL classifier
    BCE .mean()), accum(A=2, B) must equal ONE plain step on the concatenated
    2B batch — the real big-batch-equivalence claim, end to end through the
    jitted programs."""
    model = HLClassifierModel(features=4, layers=(16, 16))
    opt = make_optimizer(lr=1e-3, grad_clip=None)
    rng = jax.random.PRNGKey(3)
    state0 = create_train_state(model, jax.random.PRNGKey(0), opt)

    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (64, 4))
    y = (jax.random.uniform(k2, (64,)) > 0.5).astype(jnp.float32)

    mesh = make_mesh()
    step_big = make_train_step(model, opt, mesh=mesh)
    step_acc = make_train_step(model, opt, mesh=mesh, accum=2)

    s_big, l_big = step_big(state0, rng, x, None, y)
    state0b = create_train_state(model, jax.random.PRNGKey(0), opt)
    s_acc, l_acc = step_acc(
        state0b, rng, x.reshape(2, 32, 4), None, y.reshape(2, 32)
    )

    np.testing.assert_allclose(float(l_big), float(l_acc), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s_big.params)),
        jax.tree_util.tree_leaves(jax.device_get(s_acc.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("path", ["per_step", "scan", "fused"])
def test_accum_trainer_paths_agree(tmp_path, path):
    """All three trainer data paths run the SAME accumulated schedule: the
    per-step loop, the scanned epoch, and the fused-epoch scan-of-scans must
    produce identical params (shared host-seeded perms + rng folding)."""

    def run(sub, scan, fuse):
        dm = JetNetDataModule(
            jet_type=("t",), num_particles=8, batch_size=32,
            synthetic=True, synthetic_num_jets=256,
        )
        dm.setup()
        model = _tiny_model(dm)
        trainer = Trainer(
            model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
            max_epochs=2, callbacks=[], ckpt_dir=None,
            log_dir=str(tmp_path / sub), verbose=False,
            accumulate_grad_batches=2, scan_epochs=scan, fuse_epochs=fuse,
            check_val_every_n_epoch=100,
        )
        trainer.fit()
        k = dm.steps_per_epoch  # full microbatches per epoch
        assert k >= 2, "fixture too small for accum=2"
        assert int(np.asarray(trainer.state.step)) == 2 * ((k - k % 2) // 2)
        return jax.device_get(trainer.state.params)

    p_ref = run("ref", True, 1)  # scanned epoch is the canonical path
    if path == "per_step":
        p = run("per_step", False, 1)
    elif path == "fused":
        p = run("fused", True, 2)
    else:
        p = p_ref
    for a, b in zip(
        jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_accum_rejects_bad_configs(tmp_path):
    dm = JetNetDataModule(
        jet_type=("t",), num_particles=8, batch_size=32,
        synthetic=True, synthetic_num_jets=256,
    )
    dm.setup()
    model = _tiny_model(dm)
    with pytest.raises(ValueError, match="accumulate_grad_batches"):
        Trainer(
            model=model, datamodule=dm, optimizer=make_optimizer(),
            accumulate_grad_batches=0, log_dir=str(tmp_path), verbose=False,
        )
