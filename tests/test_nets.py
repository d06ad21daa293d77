"""EPiC network property tests: shapes, padding invariance, permutation
equivariance, weight-norm init identity."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.nets.common import WNDense
from particle_fm_tpu.nets.epic import EPiCEncoder
from particle_fm_tpu.nets.time_emb import cosine_encoding, sincos_embedding
from tests.conftest import synthetic_cloud
import pytest


def _encoder(**kw):
    defaults = dict(feats=3, hid_dim=32, latent_dim=8, equiv_layers=2)
    defaults.update(kw)
    return EPiCEncoder(**defaults)


@pytest.mark.slow
def test_epic_shapes_and_mask_zeroing():
    enc = _encoder()
    x, mask, _ = synthetic_cloud(batch=4, n=12)
    t = sincos_embedding(jnp.zeros((4,)), 6)
    t = jnp.broadcast_to(t[:, None, :], (4, 12, 12))
    params = enc.init(jax.random.PRNGKey(0), t, jnp.asarray(x), None, jnp.asarray(mask))
    out = enc.apply(params, t, jnp.asarray(x), None, jnp.asarray(mask))
    assert out.shape == (4, 12, 3)
    # padded outputs are exactly zero
    np.testing.assert_array_equal(np.asarray(out) * (1 - mask), np.zeros_like(x))


def test_epic_padding_invariance():
    enc = _encoder()
    x, mask, _ = synthetic_cloud(batch=4, n=12)
    t = jnp.broadcast_to(sincos_embedding(jnp.full((4,), 0.3), 6)[:, None, :], (4, 12, 12))
    params = enc.init(jax.random.PRNGKey(0), t, jnp.asarray(x), None, jnp.asarray(mask))
    out1 = enc.apply(params, t, jnp.asarray(x), None, jnp.asarray(mask))
    dirty = jnp.asarray(x + (1 - mask) * 7.7)
    out2 = enc.apply(params, t, dirty, None, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_epic_permutation_equivariance():
    enc = _encoder()
    batch, n = 2, 10
    rs = np.random.RandomState(0)
    x = rs.randn(batch, n, 3).astype(np.float32)
    mask = np.ones((batch, n, 1), np.float32)
    t = jnp.broadcast_to(sincos_embedding(jnp.full((batch,), 0.5), 6)[:, None, :], (batch, n, 12))
    params = enc.init(jax.random.PRNGKey(1), t, jnp.asarray(x), None, jnp.asarray(mask))
    out = np.asarray(enc.apply(params, t, jnp.asarray(x), None, jnp.asarray(mask)))
    perm = rs.permutation(n)
    out_p = np.asarray(
        enc.apply(params, t, jnp.asarray(x[:, perm]), None, jnp.asarray(mask))
    )
    np.testing.assert_allclose(out_p, out[:, perm], atol=1e-5)


@pytest.mark.slow
def test_epic_conditioning_changes_output():
    enc = _encoder(global_cond_dim=4, local_cond_dim=4)
    x, mask, cond = synthetic_cloud(batch=4, n=12, cond_dim=4)
    t = jnp.broadcast_to(sincos_embedding(jnp.full((4,), 0.5), 6)[:, None, :], (4, 12, 12))
    params = enc.init(
        jax.random.PRNGKey(0), t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask)
    )
    out1 = enc.apply(params, t, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(mask))
    out2 = enc.apply(params, t, jnp.asarray(x), jnp.asarray(cond) + 1.0, jnp.asarray(mask))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_weight_norm_identity_at_init():
    """w = g*v/||v|| with g init ||v|| must equal plain dense at init."""
    x = jnp.asarray(np.random.RandomState(0).randn(5, 7).astype(np.float32))
    wn = WNDense(11, use_weight_norm=True)
    params = wn.init(jax.random.PRNGKey(3), x)
    plain = WNDense(11, use_weight_norm=False)
    plain_params = {"params": {"kernel": params["params"]["kernel"], "bias": params["params"]["bias"]}}
    np.testing.assert_allclose(
        np.asarray(wn.apply(params, x)),
        np.asarray(plain.apply(plain_params, x)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_sincos_embedding_matches_reference_formula():
    t = jnp.asarray([0.25, 0.5])
    emb = np.asarray(sincos_embedding(t, 3))
    freqs = 2.0 ** np.arange(3) * np.pi
    want = np.concatenate(
        [np.cos(np.asarray(t)[:, None] * freqs), np.sin(np.asarray(t)[:, None] * freqs)],
        axis=-1,
    )
    np.testing.assert_allclose(emb, want, rtol=1e-5, atol=1e-6)


def test_cosine_encoding_matches_reference_formula():
    t = jnp.asarray([0.0, 0.3, 1.0])
    enc = np.asarray(cosine_encoding(t, outp_dim=4))
    freqs = np.exp(np.arange(4))
    want = np.cos(np.asarray(t)[:, None] * freqs * np.pi)
    np.testing.assert_allclose(enc, want, rtol=1e-5, atol=1e-6)
