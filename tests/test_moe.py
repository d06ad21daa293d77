"""Expert-choice MoE (nets/moe.py) + expert parallelism (dp_ep).

Beyond-reference (SURVEY 2.8: the reference has no MoE / expert
parallelism). Key invariants:
  - full-capacity MoE == the explicit dense mixture sum_e gate_te * MLP_e(x_t)
  - permutation equivariance over the set axis, padding invariance
  - the EP-sharded train step matches the replicated one numerically
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.nets.common import get_act
from particle_fm_tpu.nets.moe import ExpertChoiceMoE


def _toy(B=3, N=10, D=8, E=4, seed=0, **kw):
    moe = ExpertChoiceMoE(outp_dim=D, num_experts=E, hddn_dim=16, **kw)
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, N, D))
    params = moe.init(jax.random.PRNGKey(1), x)["params"]
    return moe, params, x


def _dense_mixture(params, x, act="lrlu"):
    """Naive reference: every token through every expert, gate-weighted."""
    logits = x @ params["router"]["kernel"] + params["router"]["bias"]
    gates = jax.nn.softmax(logits, axis=-1)  # (B, N, E)
    outs = []
    for e in range(params["w1"].shape[0]):
        h = get_act(act)(x @ params["w1"][e] + params["b1"][e])
        outs.append(h @ params["w2"][e] + params["b2"][e])
    outs = jnp.stack(outs, axis=2)  # (B, N, E, D)
    return jnp.einsum("bne,bned->bnd", gates, outs)


@pytest.mark.slow
def test_full_capacity_equals_dense_mixture():
    """With C=N (capacity_factor=E) every expert takes every token, so the
    routed computation must equal the explicit dense mixture."""
    moe, params, x = _toy(capacity_factor=4.0)  # C = N*4/4 = N
    out = moe.apply({"params": params}, x)
    ref = _dense_mixture(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_permutation_equivariance():
    moe, params, x = _toy(capacity_factor=1.5)
    perm = jax.random.permutation(jax.random.PRNGKey(7), x.shape[1])
    out = moe.apply({"params": params}, x)
    out_p = moe.apply({"params": params}, x[:, perm])
    np.testing.assert_allclose(np.asarray(out[:, perm]), np.asarray(out_p), atol=1e-5)


def test_padding_invariance_and_zero_padded_output():
    """Garbage at padded slots must not change real outputs, and padded slots
    are never routed (their MoE output is exactly 0)."""
    moe, params, x = _toy(N=10, capacity_factor=1.5)
    mask = jnp.ones((3, 10)).at[:, 7:].set(0.0)
    out = moe.apply({"params": params}, x, mask=mask)
    x2 = x.at[:, 7:].set(1e3)
    out2 = moe.apply({"params": params}, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(out[:, :7]), np.asarray(out2[:, :7]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[:, 7:]), 0.0)


def test_tiny_sets_route_without_nans():
    """Sets with fewer real tokens than capacity: experts run out of real
    tokens, picked padding combines with gate 0 — finite everywhere."""
    moe, params, x = _toy(N=10, capacity_factor=4.0)  # C = N
    mask = jnp.zeros((3, 10)).at[:, :2].set(1.0)  # 2 real tokens, C=10
    out = moe.apply({"params": params}, x, mask=mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out[:, 2:]), 0.0)


def _moe_droid(num_layers=2, **moe_kw):
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    return FlowMatchingModel(
        model="droid_fulltransformer",
        features=3,
        num_particles=8,
        frequencies=4,
        t_emb="cosine",
        loss_type="CFM",
        global_cond_dim=2,
        net_config=dict(
            te_config=dict(
                model_dim=32,
                num_layers=num_layers,
                mha_config=dict(num_heads=4, do_layer_norm=True),
                dense_config=dict(act_h="lrlu", nrm="layer"),
                moe_config=dict(num_experts=4, hddn_dim=32, **moe_kw),
            ),
            node_embd_config=dict(act_h="lrlu", nrm="layer"),
            ctxt_embd_config=dict(outp_dim=16, act_h="lrlu", nrm="layer"),
            outp_embd_config=dict(act_h="lrlu", nrm="layer"),
        ),
    )


def _batch(B=16, N=8):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, 3))
    mask = jnp.ones((B, N, 1)).at[:, N - 2 :].set(0.0)
    cond = jax.random.normal(jax.random.PRNGKey(2), (B, 2))
    return x, mask, cond


@pytest.mark.slow
def test_moe_transformer_trains_and_samples():
    """The droid transformer with MoE dense blocks (te_config.moe_config)
    trains (loss drops over a few steps) and samples finitely."""
    from particle_fm_tpu.parallel.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = _moe_droid()
    opt = make_optimizer(lr=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), opt)
    step = make_train_step(model, opt)
    x, mask, cond = _batch()
    losses = []
    for i in range(5):
        state, loss = step(state, jax.random.PRNGKey(10 + i), x, mask, cond)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    samp = model.sample(
        state.variables(), jax.random.PRNGKey(3), n_samples=4, cond=cond[:4],
        mask=mask[:4], ode_steps=8,
    )
    assert np.isfinite(np.asarray(samp)).all()


@pytest.mark.slow
def test_dp_ep_matches_replicated():
    """Expert parallelism is a placement: the train step with expert params
    sharded over 'model' (moe_ep_rules) matches the replicated step
    numerically over 3 steps. SGD (not Adam) isolates the comparison from
    sqrt(nu) amplification of f32 reduction-order noise — with SGD the param
    delta is linear in the (tiny) cross-placement grad difference."""
    import optax

    from particle_fm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from particle_fm_tpu.parallel.tp import moe_ep_rules, shard_state
    from particle_fm_tpu.parallel.train import (
        create_train_state,
        make_train_step,
    )

    model = _moe_droid()
    opt = optax.sgd(1e-2)
    x, mask, cond = _batch()
    mesh = make_mesh(data=4, model=2)
    step = make_train_step(model, opt, mesh=mesh)

    state_ref = replicate(create_train_state(model, jax.random.PRNGKey(0), opt), mesh)
    state_ep = shard_state(
        create_train_state(model, jax.random.PRNGKey(0), opt), mesh, moe_ep_rules()
    )
    xb, mb, cb = shard_batch((x, mask, cond), mesh)
    for i in range(3):
        state_ref, loss_ref = step(state_ref, jax.random.PRNGKey(5 + i), xb, mb, cb)
        state_ep, loss_ep = step(state_ep, jax.random.PRNGKey(5 + i), xb, mb, cb)
        # sharded expert einsums reorder the reductions: tolerate f32
        # accumulation-order noise (measured rel diff ~1.4e-5 on loss ~6.8)
        np.testing.assert_allclose(float(loss_ep), float(loss_ref), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_ref.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_ep.params)),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
    # the expert params really are sharded over 'model'
    w1 = state_ep.params["flows_0"]["net"]["te"]["layer_0"]["moe"]["w1"]
    assert "model" in str(w1.sharding.spec)
