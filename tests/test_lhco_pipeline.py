"""LHCO two-stage anomaly-detection pipeline, end to end on synthetic data.

Stage 1: flat FM model on dijet jet features conditioned on mjj.
Stage 2: set FM model on constituents conditioned on jet features.
Eval: sample stage-1 features in the signal region -> condition stage-2.
Parity: SURVEY 3.4 / reference scripts/generate_data_lhco*.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.data.lhco import LHCODataModule, LHCOJetFeatureDataModule
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel
from particle_fm_tpu.parallel.mesh import shard_batch
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step
import pytest


@pytest.mark.slow
def test_two_stage_lhco_pipeline(mesh):
    # ---------------- stage 1: jet features | mjj
    dm1 = LHCOJetFeatureDataModule(batch_size=64, synthetic=True, synthetic_num_events=1200)
    dm1.setup()
    model1 = FlatFlowMatchingModel(features=10, cond_dim=1)
    opt1 = make_optimizer(lr=1e-3)
    state1 = create_train_state(model1, jax.random.PRNGKey(0), opt1)
    step1 = make_train_step(model1, opt1, mesh=mesh)
    for batch in dm1.train_batches(seed=0):
        state1, loss1 = step1(state1, jax.random.PRNGKey(1), *shard_batch(
            (jnp.asarray(batch[0]), None, jnp.asarray(batch[2])), mesh))
    assert np.isfinite(float(loss1))

    # ---------------- stage 2: constituents | jet features
    dm2 = LHCODataModule(jet_type="x", num_particles=16, batch_size=64,
                         synthetic=True, synthetic_num_events=1200)
    dm2.setup()
    cond_dim = dm2.tensor_conditioning_train.shape[-1]
    model2 = FlowMatchingModel(model="epic", features=3, num_particles=16, hidden_dim=16,
                               latent=4, layers=1, frequencies=6, loss_type="CFM",
                               global_cond_dim=cond_dim, local_cond_dim=cond_dim)
    opt2 = make_optimizer(lr=1e-3)
    state2 = create_train_state(model2, jax.random.PRNGKey(2), opt2)
    step2 = make_train_step(model2, opt2, mesh=mesh)
    for batch in dm2.train_batches(seed=0):
        state2, loss2 = step2(state2, jax.random.PRNGKey(3), *shard_batch(
            tuple(jnp.asarray(b) if b is not None else None for b in batch), mesh))
    assert np.isfinite(float(loss2))

    # ---------------- chained generation in the signal region
    n = min(16, len(dm1.tensor_conditioning_test_sr), len(dm2.mask_test_sr))
    assert n > 0, "synthetic SR split came out empty"
    cond_sr = jnp.asarray(dm1.tensor_conditioning_test_sr[:n])  # normalized mjj
    stage1_features = model1.sample(
        state1.variables(), jax.random.PRNGKey(4), n_samples=n, cond=cond_sr, ode_steps=8
    )
    assert stage1_features.shape == (n, 10)
    assert np.isfinite(np.asarray(stage1_features)).all()

    # stage-1 output (normalized jet features) -> split per jet -> condition
    # stage 2 on the leading jet's (pt, eta, phi, m) (+ multiplicity if enabled)
    jet_x_features = np.asarray(stage1_features).reshape(n, 2, 5)[:, 0, :cond_dim]
    mask = jnp.asarray(dm2.mask_test_sr[:n])
    samples = model2.sample(
        state2.variables(), jax.random.PRNGKey(5), n_samples=n,
        cond=jnp.asarray(jet_x_features), mask=mask, ode_steps=8,
    )
    assert samples.shape == (n, 16, 3)
    out = np.asarray(samples)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out * (1 - np.asarray(mask)), 0.0)
