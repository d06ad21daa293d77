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
