"""Droid transformer / cross-attention / MDMA / MLP network tests."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel
from particle_fm_tpu.nets.mdma import MDMA
from particle_fm_tpu.nets.transformer import (
    DenseNetwork,
    FullCrossAttentionEncoder,
    FullTransformerEncoder,
    MultiHeadedAttentionBlock,
)
from particle_fm_tpu.ops.attention import masked_attention
from tests.conftest import synthetic_cloud
import pytest

TE_CONFIG = {
    "model_dim": 32,
    "num_layers": 2,
    "mha_config": {"num_heads": 4, "init_zeros": True, "do_layer_norm": True},
    "dense_config": {"act_h": "lrlu", "nrm": "layer", "output_init_zeros": True},
}
EMBD = {"act_h": "lrlu", "nrm": "layer"}


def _temb(batch, n, dim=12, t=0.5):
    from particle_fm_tpu.nets.time_emb import sincos_embedding

    e = sincos_embedding(jnp.full((batch,), t), dim // 2)
    return jnp.broadcast_to(e[:, None, :], (batch, n, dim))


def test_masked_attention_padding_invariance():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 6, 4, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 10, 4, 8).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 10, 4, 8).astype(np.float32))
    kv_mask = jnp.asarray((np.arange(10)[None, :] < 7).astype(np.float32).repeat(2, 0))
    out1 = masked_attention(q, k, v, kv_mask)
    k_dirty = k + (1 - kv_mask)[..., None, None] * 55.0
    v_dirty = v + (1 - kv_mask)[..., None, None] * 55.0
    out2 = masked_attention(q, k_dirty, v_dirty, kv_mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.slow
def test_masked_attention_bf16_scores_close_to_f32():
    """scores_dtype=bfloat16 (droid sampling fast path) tracks the exact
    f32 path to bf16 resolution, including masked keys and an attn_bias."""
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(3, 6, 4, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(3, 10, 4, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(3, 10, 4, 16).astype(np.float32))
    kv_mask = jnp.asarray((np.arange(10)[None, :] < np.array([[7], [10], [4]])).astype(np.float32))
    bias = jnp.asarray(rs.randn(3, 4, 6, 10).astype(np.float32))
    exact = np.asarray(masked_attention(q, k, v, kv_mask, bias))
    fast = np.asarray(masked_attention(q, k, v, kv_mask, bias, scores_dtype=jnp.bfloat16))
    assert fast.dtype == exact.dtype
    # bf16 has ~3 decimal digits; the post-PV normalization is exact math
    np.testing.assert_allclose(fast, exact, atol=2e-2, rtol=2e-2)
    # padding invariance must hold for the fast path too
    k_dirty = k + (1 - kv_mask)[..., None, None] * 55.0
    v_dirty = v + (1 - kv_mask)[..., None, None] * 55.0
    fast2 = np.asarray(masked_attention(q, k_dirty, v_dirty, kv_mask, bias, scores_dtype=jnp.bfloat16))
    np.testing.assert_allclose(fast, fast2, atol=1e-5)


@pytest.mark.slow
def test_masked_attention_bf16_scores_grads_finite():
    """The fast path stays differentiable (training-safe): finite grads."""

    def loss(q, k, v):
        kv_mask = jnp.ones(k.shape[:2])
        out = masked_attention(q, k, v, kv_mask, scores_dtype=jnp.bfloat16)
        return jnp.sum(out**2)

    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, 5, 2, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 9, 2, 8).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 9, 2, 8).astype(np.float32))
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_masked_attention_matches_torch_sdpa():
    import torch

    rs = np.random.RandomState(1)
    q = rs.randn(2, 5, 2, 8).astype(np.float32)
    k = rs.randn(2, 9, 2, 8).astype(np.float32)
    v = rs.randn(2, 9, 2, 8).astype(np.float32)
    kv_mask = (np.arange(9)[None, :] < np.array([[6], [9]])).astype(np.float32)
    got = np.asarray(
        masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kv_mask))
    )
    tq = torch.tensor(q).permute(0, 2, 1, 3)
    tk = torch.tensor(k).permute(0, 2, 1, 3)
    tv = torch.tensor(v).permute(0, 2, 1, 3)
    tm = torch.tensor(kv_mask, dtype=torch.bool)[:, None, None, :]
    want = (
        torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, attn_mask=tm)
        .permute(0, 2, 1, 3)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_block_zero_init_outputs_zero():
    x, mask, _ = synthetic_cloud(batch=2, n=8, feats=32)
    mha = MultiHeadedAttentionBlock(32, num_heads=4, init_zeros=True)
    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = mha.apply(params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_dense_network_output_init_zeros():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 7).astype(np.float32))
    net = DenseNetwork(outp_dim=5, hddn_dim=16, output_init_zeros=True)
    params = net.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(net.apply(params, x)), 0.0)


@pytest.mark.slow
def test_full_transformer_shapes_and_padding_invariance():
    enc = FullTransformerEncoder(
        outp_dim=3,
        ctxt_dim=12 + 2,
        te_config=TE_CONFIG,
        node_embd_config=EMBD,
        outp_embd_config={**EMBD, "output_init_zeros": True},
        ctxt_embd_config={**EMBD, "outp_dim": 16},
    )
    x, mask, cond = synthetic_cloud(batch=4, n=10, cond_dim=2)
    t = _temb(4, 10)
    params = enc.init(jax.random.PRNGKey(0), t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    out1 = enc.apply(params, t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    assert out1.shape == (4, 10, 3)
    dirty = jnp.asarray(x + (1 - mask) * 9.0)
    out2 = enc.apply(params, t, dirty, jnp.asarray(cond), jnp.asarray(mask))
    # real-particle outputs unaffected by padded garbage
    np.testing.assert_allclose(
        np.asarray(out1) * mask, np.asarray(out2) * mask, atol=2e-5
    )


def test_full_transformer_permutation_equivariance():
    enc = FullTransformerEncoder(
        outp_dim=3,
        ctxt_dim=12,
        te_config=TE_CONFIG,
        ctxt_embd_config={"outp_dim": 16},
    )
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 3).astype(np.float32))
    mask = jnp.ones((2, 8, 1))
    t = _temb(2, 8)
    params = enc.init(jax.random.PRNGKey(1), t, x, None, mask)
    out = np.asarray(enc.apply(params, t, x, None, mask))
    perm = rs.permutation(8)
    out_p = np.asarray(enc.apply(params, t, x[:, perm], None, mask))
    np.testing.assert_allclose(out_p, out[:, perm], atol=1e-4)


def test_full_cross_attention_encoder():
    enc = FullCrossAttentionEncoder(
        outp_dim=3,
        ctxt_dim=12 + 2,
        cae_config={
            "model_dim": 32,
            "num_layers": 2,
            "num_tokens": 4,
            "mha_config": {"num_heads": 4},
            "dense_config": {"hddn_dim": 64},
        },
        ctxt_embd_config={"outp_dim": 16},
    )
    x, mask, cond = synthetic_cloud(batch=3, n=10, cond_dim=2)
    t = _temb(3, 10)
    params = enc.init(jax.random.PRNGKey(0), t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    out = enc.apply(params, t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    assert out.shape == (3, 10, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_mdma_shapes_and_masking():
    net = MDMA(latent=8, hidden_dim=16, layers=2, num_heads=4, global_cond_dim=1)
    x, mask, cond = synthetic_cloud(batch=3, n=10, feats=4, cond_dim=1)
    t = _temb(3, 10)
    params = net.init(jax.random.PRNGKey(0), t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    out = net.apply(params, t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    assert out.shape == (3, 10, 1)
    np.testing.assert_array_equal(np.asarray(out) * (1 - mask), 0.0)


@pytest.mark.slow
def test_droid_model_trains_via_flow_matching_model():
    model = FlowMatchingModel(
        model="droid_fulltransformer",
        features=3,
        num_particles=10,
        frequencies=6,
        global_cond_dim=2,
        loss_type="droid",
        net_config={
            "te_config": TE_CONFIG,
            "ctxt_embd_config": {"outp_dim": 16},
        },
    )
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, cond = synthetic_cloud(batch=4, n=10, cond_dim=2)
    loss, _ = model.loss(
        variables, jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask), jnp.asarray(cond)
    )
    assert np.isfinite(float(loss))
    out = model.sample(
        variables,
        jax.random.PRNGKey(2),
        n_samples=4,
        cond=jnp.asarray(cond),
        mask=jnp.asarray(mask),
        ode_steps=4,
    )
    assert out.shape == (4, 10, 3)


@pytest.mark.slow
def test_mdma_model_via_flow_matching_model():
    model = FlowMatchingModel(
        model="mdma",
        features=1,
        num_particles=10,
        frequencies=6,
        global_cond_dim=1,
        add_time_to_input=False,
        loss_type="CFM",
        net_config={"latent": 8, "hidden_dim": 16, "layers": 2, "num_heads": 4,
                    "global_cond_dim": 1},
    )
    variables = model.init(jax.random.PRNGKey(0))
    x, mask, cond = synthetic_cloud(batch=4, n=10, feats=1, cond_dim=1)
    loss, _ = model.loss(
        variables, jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(mask), jnp.asarray(cond)
    )
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_flat_flow_matching_model():
    model = FlatFlowMatchingModel(features=10, cond_dim=1)
    variables = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(16, 10).astype(np.float32))
    cond = jnp.asarray(rs.randn(16, 1).astype(np.float32))
    loss, _ = model.loss(variables, jax.random.PRNGKey(1), x, cond=cond)
    assert np.isfinite(float(loss))
    out = model.sample(variables, jax.random.PRNGKey(2), cond=cond, ode_steps=10)
    assert out.shape == (16, 10)
    assert np.isfinite(np.asarray(out)).all()
