"""Flash attention kernel vs the reference einsum attention (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.ops.attention import masked_attention
from particle_fm_tpu.ops.pallas.flash_attention import flash_masked_attention
import pytest


def _data(b=2, lq=16, lk=24, h=2, d=8, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, lq, h, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, lk, h, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, lk, h, d).astype(np.float32))
    mask = jnp.asarray((np.arange(lk)[None, :] < rs.randint(5, lk + 1, (b, 1))).astype(np.float32))
    return q, k, v, mask


@pytest.mark.slow
def test_flash_matches_reference():
    q, k, v, mask = _data()
    ref = masked_attention(q, k, v, mask)
    out = flash_masked_attention(q, k, v, mask, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_flash_padding_to_block_multiple():
    # Lk=20 not a multiple of block_k=16: padded keys must not contribute
    q, k, v, mask = _data(lk=20)
    ref = masked_attention(q, k, v, mask)
    out = flash_masked_attention(q, k, v, mask, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_no_mask():
    q, k, v, _ = _data()
    ref = masked_attention(q, k, v, None)
    out = flash_masked_attention(q, k, v, None, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
