"""Masked-op property tests: padding invariance + torch-oracle math parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.ops.masked import (
    huber,
    masked_huber,
    masked_mean,
    masked_mse,
    masked_sum,
    meansum_pool,
)
from tests.conftest import synthetic_cloud


def test_masked_pool_padding_invariance():
    x, mask, _ = synthetic_cloud(batch=8, n=20)
    x_dirty = x + (1.0 - mask) * 123.0  # garbage in padded slots
    m1, s1 = meansum_pool(jnp.asarray(x), jnp.asarray(mask))
    m2, s2 = meansum_pool(jnp.asarray(x_dirty), jnp.asarray(mask))
    np.testing.assert_allclose(m1, m2, rtol=1e-6)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_masked_mean_sum_against_numpy():
    x, mask, _ = synthetic_cloud(batch=4, n=10)
    got_sum = np.asarray(masked_sum(jnp.asarray(x), jnp.asarray(mask)))
    got_mean = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    want_sum = (x * mask).sum(axis=1)
    want_mean = want_sum / mask.sum(axis=1)
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-6)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-5)


def test_masked_mse_matches_reference_normalization():
    x, mask, _ = synthetic_cloud(batch=4, n=10)
    v = np.random.RandomState(1).randn(*x.shape).astype(np.float32) * mask
    u = np.random.RandomState(2).randn(*x.shape).astype(np.float32) * mask
    got = float(masked_mse(jnp.asarray(v), jnp.asarray(u), jnp.asarray(mask)))
    want = np.square(v - u).sum() / mask.sum()
    assert got == pytest.approx(want, rel=1e-5)


def test_huber_matches_torch():
    torch = pytest.importorskip("torch")
    err = np.linspace(-3, 3, 101).astype(np.float32)
    got = np.asarray(huber(jnp.asarray(err)))
    want = torch.nn.functional.huber_loss(
        torch.tensor(err), torch.zeros(101), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_huber_denominator():
    x, mask, _ = synthetic_cloud(batch=4, n=10)
    v = jnp.asarray(x)
    got = float(masked_huber(v, jnp.zeros_like(v), jnp.asarray(mask)))
    want = np.asarray(huber(v)).sum() / mask.sum()
    assert got == pytest.approx(want, rel=1e-5)


def test_class_token_attention_matches_einsum_path():
    """ops/attention.class_token_attention (explicit-only impl, MDMA-cliff
    study — docs/RESULTS.md r4): the Lq=1 reduce form must be numerically
    the einsum path, masked and unmasked."""
    import jax

    from particle_fm_tpu.ops.attention import (
        attention,
        class_token_attention,
        masked_attention,
    )

    B, Lk, H, D = 4, 12, 8, 16
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, 1, H, D).astype(np.float32))
    k = jnp.asarray(rs.randn(B, Lk, H, D).astype(np.float32))
    v = jnp.asarray(rs.randn(B, Lk, H, D).astype(np.float32))
    n_valid = rs.randint(1, Lk + 1, size=B)
    mask = jnp.asarray((np.arange(Lk)[None, :] < n_valid[:, None]).astype(np.float32))

    for m in (None, mask):
        ref = np.asarray(masked_attention(q, k, v, kv_mask=m))
        got = np.asarray(class_token_attention(q, k, v, kv_mask=m))
        np.testing.assert_allclose(got, ref, atol=2e-5)
        # the dispatching front-end routes impl="class_token" to the same fn
        via = np.asarray(attention(q, k, v, kv_mask=m, impl="class_token"))
        np.testing.assert_allclose(via, got, atol=1e-6)

    # differentiability (it sits on a potential training path)
    g = jax.grad(lambda qq: float(0) + jnp.sum(class_token_attention(qq, k, v, mask)))(q)
    assert np.isfinite(np.asarray(g)).all()

    # scores_dtype has no class_token variant (always f32 VPU accumulation) —
    # the front-end must reject it rather than silently drop it (ADVICE r4)
    with pytest.raises(ValueError, match="scores_dtype"):
        attention(q, k, v, kv_mask=mask, impl="class_token", scores_dtype=jnp.bfloat16)
