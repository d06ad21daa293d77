"""Fused short-sequence attention kernel vs the einsum reference.

The kernel is explicit-only (not auto-dispatched): measured slower than the
einsum path at the production droid config on v5e and faulting the TPU
worker on mixed Lq!=Lk shapes — see ops/attention.attention's docstring.
These tests pin its numerics (interpret mode) so the measured-negative
result stays reproducible."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.ops.attention import _fused_fits, masked_attention
from particle_fm_tpu.ops.pallas.short_attention import fused_short_attention


def _inputs(b=3, lq=10, lk=10, h=4, d=16, seed=0, masked=True):
    rs = np.random.RandomState(seed)
    q = rs.randn(b, lq, h, d).astype(np.float32)
    k = rs.randn(b, lk, h, d).astype(np.float32)
    v = rs.randn(b, lk, h, d).astype(np.float32)
    if masked:
        n_valid = rs.randint(2, lk + 1, b)
        mask = (np.arange(lk)[None, :] < n_valid[:, None]).astype(np.float32)
    else:
        mask = None
    return q, k, v, mask


@pytest.mark.slow
@pytest.mark.parametrize("masked", [True, False])
def test_fused_matches_einsum(masked):
    q, k, v, mask = _inputs(masked=masked)
    ref = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           None if mask is None else jnp.asarray(mask))
    out = fused_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                None if mask is None else jnp.asarray(mask),
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_with_attn_bias():
    """attn_bias path (ParT pairwise interaction attention)."""
    q, k, v, mask = _inputs(seed=1)
    rs = np.random.RandomState(2)
    bias = rs.randn(3, 4, 10, 10).astype(np.float32)
    ref = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask), jnp.asarray(bias))
    out = fused_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(mask), jnp.asarray(bias), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_fused_cross_attention_shapes():
    """Lq != Lk (perceiver there-and-back layers) + non-multiple-of-8 pads."""
    q, _, _, _ = _inputs(lq=5, seed=3)
    _, k, v, mask = _inputs(lk=13, seed=4)
    ref = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask))
    out = fused_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(mask), interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_fused_bf16_inputs():
    q, k, v, mask = _inputs(seed=5)
    args = [jnp.asarray(a, jnp.bfloat16) for a in (q, k, v)]
    ref = masked_attention(*args, jnp.asarray(mask))
    out = fused_short_attention(*args, jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_fused_fits_budget():
    assert _fused_fits(16, 150, 150, 16)      # droid production config
    assert _fused_fits(8, 128, 128, 16)       # ParT classifier
    assert not _fused_fits(16, 1024, 1024, 64)  # long sequences -> flash/einsum


# ---------------------------------------------------------------------------
# packed_short_attention (take 2: packed lane-major layout, custom VJP)
# ---------------------------------------------------------------------------

from particle_fm_tpu.ops.pallas.short_attention import packed_short_attention


@pytest.mark.slow
@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("l", [10, 16, 150])
def test_packed_matches_einsum(masked, l):
    q, k, v, mask = _inputs(lq=l, lk=l, masked=masked, seed=7)
    ref = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           None if mask is None else jnp.asarray(mask))
    out = packed_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 None if mask is None else jnp.asarray(mask),
                                 interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_packed_with_attn_bias():
    q, k, v, mask = _inputs(seed=8)
    rs = np.random.RandomState(9)
    bias = rs.randn(3, 4, 10, 10).astype(np.float32)
    ref = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask), jnp.asarray(bias))
    out = packed_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(mask), jnp.asarray(bias),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_packed_bf16_inputs():
    q, k, v, mask = _inputs(seed=10, lq=150, lk=150)
    args = [jnp.asarray(a, jnp.bfloat16) for a in (q, k, v)]
    ref = masked_attention(*args, jnp.asarray(mask))
    out = packed_short_attention(*args, jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_packed_rejects_cross_attention():
    q, _, _, _ = _inputs(lq=5, seed=3)
    _, k, v, mask = _inputs(lk=13, seed=4)
    with pytest.raises(ValueError, match="Lq == Lk"):
        packed_short_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), interpret=True)


@pytest.mark.slow
def test_packed_grad_matches_einsum():
    """The custom VJP (einsum-path recompute) must match einsum-path grads."""
    q, k, v, mask = _inputs(b=2, lq=12, lk=12, h=2, d=8, seed=11)
    qj, kj, vj, mj = map(jnp.asarray, (q, k, v, mask))

    def loss_packed(q, k, v):
        return jnp.sum(packed_short_attention(q, k, v, mj, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(masked_attention(q, k, v, mj) ** 2)

    g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(qj, kj, vj)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qj, kj, vj)
    for gp, gr in zip(g_packed, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-4)


def test_packed_grad_with_bias():
    q, k, v, mask = _inputs(b=2, lq=12, lk=12, h=2, d=8, seed=12)
    rs = np.random.RandomState(13)
    bias = jnp.asarray(rs.randn(2, 2, 12, 12).astype(np.float32))
    qj, kj, vj, mj = map(jnp.asarray, (q, k, v, mask))

    def loss_packed(q, b):
        return jnp.sum(packed_short_attention(q, kj, vj, mj, b, interpret=True) ** 2)

    def loss_ref(q, b):
        return jnp.sum(masked_attention(q, kj, vj, mj, b) ** 2)

    gq_p, gb_p = jax.grad(loss_packed, argnums=(0, 1))(qj, bias)
    gq_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(qj, bias)
    np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r), atol=1e-4)
