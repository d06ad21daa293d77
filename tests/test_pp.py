"""Pipeline parallelism (parallel/pp.py): the GPipe schedule must be a
numerical no-op vs the unpipelined module, for forward, gradients, and a
full optimizer step.

Beyond-reference (the reference's only parallelism is DDP, SURVEY 2.8);
runs on the 8-device virtual CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.pp import (
    make_pipe_mesh,
    make_pp_vector_field,
    make_train_step_pp,
)
from particle_fm_tpu.parallel.train import create_train_state, make_optimizer, make_train_step


def _droid(num_layers=4, cond_dim=2, **kw):
    return FlowMatchingModel(
        model="droid_fulltransformer",
        features=3,
        num_particles=12,
        frequencies=4,
        t_emb="cosine",
        add_time_to_input=True,
        loss_type="FM-OT",
        global_cond_dim=cond_dim,
        net_config=dict(
            te_config=dict(
                model_dim=32,
                num_layers=num_layers,
                mha_config=dict(num_heads=4, do_layer_norm=True),
                dense_config=dict(act_h="lrlu", nrm="layer"),
            ),
            node_embd_config=dict(act_h="lrlu", nrm="layer"),
            ctxt_embd_config=dict(outp_dim=16, act_h="lrlu", nrm="layer"),
            outp_embd_config=dict(act_h="lrlu", nrm="layer"),
        ),
        **kw,
    )


def _batch(B=8, N=12, cond_dim=2, masked=True):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    mask = jnp.ones((B, N, 1))
    if masked:
        mask = mask.at[:, N - 2 :].set(0.0)
    cond = (
        jax.random.normal(jax.random.PRNGKey(2), (B, cond_dim)) if cond_dim else None
    )
    return x, mask, cond


@pytest.mark.parametrize(
    "stages,microbatches,num_layers",
    [(4, 4, 4), (2, 8, 4), (8, 2, 8), (4, 4, 8)],
)
@pytest.mark.slow
def test_pp_forward_matches_module(stages, microbatches, num_layers):
    model = _droid(num_layers=num_layers)
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, cond = _batch()
    t = jnp.full((8,), 0.35)
    ref = model.vector_field(variables, t, x, cond=cond, mask=mask)
    mesh = make_pipe_mesh(stages=stages)
    vf = make_pp_vector_field(model, mesh, microbatches=microbatches)
    out = jax.jit(vf)(variables, t, x, cond, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pp_forward_uncond_unmasked():
    """cond=None exercises the ctxt-free path through the pipeline ticks
    (t_emb alone feeds ctxt_embd when ctxt_dim>0; here ctxt_dim comes from
    frequencies only)."""
    model = _droid(cond_dim=0)
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, _ = _batch(cond_dim=0, masked=False)
    t = jnp.full((8,), 0.7)
    ref = model.vector_field(variables, t, x, mask=mask)
    mesh = make_pipe_mesh(stages=4)
    vf = make_pp_vector_field(model, mesh, microbatches=2)
    out = jax.jit(vf)(variables, t, x, None, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pp_grads_match():
    """AD through scan+ppermute is the backward pipeline; grads must equal
    the unpipelined loss gradients."""
    model = _droid()
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, cond = _batch()
    mesh = make_pipe_mesh(stages=4)
    vf = make_pp_vector_field(model, mesh, microbatches=4)
    rng = jax.random.PRNGKey(3)

    def loss_ref(v):
        l, _ = model.loss(v, rng, x, mask=mask, cond=cond, train=True)
        return l

    def loss_pp(v):
        l, _ = model.loss(v, rng, x, mask=mask, cond=cond, train=True, vf_fn=vf)
        return l

    g_ref = jax.grad(loss_ref)(variables)["params"]
    g_pp = jax.jit(jax.grad(loss_pp))(variables)["params"]
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)


@pytest.mark.slow
def test_pp_train_step_matches_dp():
    """One full optimizer step (loss, grads, AdamW, EMA) pipelined over 4
    stages lands on the same parameters as the single-device step."""
    model = _droid()
    opt = make_optimizer(lr=1e-3)
    x, mask, cond = _batch()
    mesh = make_pipe_mesh(stages=4)

    state_ref = create_train_state(model, jax.random.PRNGKey(0), opt)
    step_ref = make_train_step(model, opt)
    state_ref, loss_ref = step_ref(state_ref, jax.random.PRNGKey(5), x, mask, cond)

    state_pp = create_train_state(model, jax.random.PRNGKey(0), opt)
    step_pp = make_train_step_pp(model, opt, mesh, microbatches=4)
    state_pp, loss_pp = step_pp(state_pp, jax.random.PRNGKey(5), x, mask, cond)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_ref.params),
        jax.tree_util.tree_leaves(state_pp.params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


@pytest.mark.slow
def test_dp_pp_forward_matches_module():
    """dp x pp: 2 independent 4-stage pipelines on a ('data','pipe') 2x4
    mesh, batch sharded over 'data' — still a numerical no-op."""
    model = _droid()
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, cond = _batch()
    t = jnp.full((8,), 0.35)
    ref = model.vector_field(variables, t, x, cond=cond, mask=mask)
    mesh = make_pipe_mesh(stages=4, data=2)
    vf = make_pp_vector_field(model, mesh, microbatches=2)
    out = jax.jit(vf)(variables, t, x, cond, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_dp_pp_train_step_matches_dp():
    """A full optimizer step on the 2x4 dp x pp mesh (batch committed to the
    'data' sharding by make_train_step_pp's in_shardings, grads all-reduced
    across the two pipelines by GSPMD) lands on the single-device params."""
    model = _droid()
    opt = make_optimizer(lr=1e-3)
    x, mask, cond = _batch()
    mesh = make_pipe_mesh(stages=4, data=2)

    state_ref = create_train_state(model, jax.random.PRNGKey(0), opt)
    step_ref = make_train_step(model, opt)
    state_ref, loss_ref = step_ref(state_ref, jax.random.PRNGKey(5), x, mask, cond)

    state_pp = create_train_state(model, jax.random.PRNGKey(0), opt)
    step_pp = make_train_step_pp(model, opt, mesh, microbatches=2)
    state_pp, loss_pp = step_pp(state_pp, jax.random.PRNGKey(5), x, mask, cond)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_ref.params),
        jax.tree_util.tree_leaves(state_pp.params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_pp_guards():
    model = _droid(num_layers=4)
    mesh = make_pipe_mesh(stages=4)
    epic = FlowMatchingModel(model="epic", features=3, num_particles=8)
    with pytest.raises(NotImplementedError):
        make_pp_vector_field(epic, mesh)
    # layers not divisible by stages
    model3 = _droid(num_layers=3)
    variables = model3.init(jax.random.PRNGKey(0))
    x, mask, cond = _batch()
    vf = make_pp_vector_field(model3, mesh, microbatches=4)
    with pytest.raises(ValueError, match="divisible"):
        vf(variables, jnp.full((8,), 0.5), x, cond, mask)
