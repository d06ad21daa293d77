"""Reference-parity golden tests.

Every expected number below is a LITERAL pinned from the reference's exact
formulas evaluated in torch/float64 on the fixed inputs defined here
(derivation: transcribe the formula at the cited reference line, evaluate at
(X, T, Z, V)). They are NOT derived from this repo's own code — any silent
drift in a loss/schedule/normalization formula fails these tests.

Reference formulas:
  FM-OT      particle_fm/models/components/losses.py:56-77
  CFM        losses.py:101-136
  Droid      losses.py:308-342
  Diffusion  losses.py:235-285 (huber, mle_loss_weight=0.001)
  VP sched   models/components/diffusion.py:21-62
  sigma=5 z-score  data/components/utils.py:164-199
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu.losses import flow_matching as fm

# fixed inputs (shared by the torch derivation that produced the literals)
X = np.array(
    [[[0.5, -1.0], [1.5, 0.25], [0.0, 0.0]],
     [[-0.75, 2.0], [0.1, -0.3], [0.6, 0.9]]], np.float32)
MASK = np.array([[[1.0], [1.0], [0.0]], [[1.0], [1.0], [1.0]]], np.float32)
T = np.array([0.25, 0.75], np.float32)
Z = np.array(
    [[[0.3, -0.2], [-1.1, 0.8], [0.05, -0.6]],
     [[1.2, 0.4], [-0.5, 0.7], [0.9, -1.3]]], np.float32)
V = np.array(
    [[[0.2, 0.1], [-0.4, 0.6], [0.0, 0.3]],
     [[0.8, -0.2], [0.15, 0.5], [-0.6, 0.25]]], np.float32)


@pytest.fixture()
def fixed_draws(monkeypatch):
    """Pin the loss-internal random draws: t = T, every normal draw = Z."""
    monkeypatch.setattr(fm, "_sample_t", lambda rng, b, dtype: jnp.asarray(T, dtype))
    real_normal = jax.random.normal

    def fake_normal(rng, shape=(), dtype=None):
        if tuple(shape) == X.shape:
            return jnp.asarray(Z, dtype or jnp.float32)
        return real_normal(rng, shape, dtype) if dtype else real_normal(rng, shape)

    monkeypatch.setattr(jax.random, "normal", fake_normal)


def const_vf(t, y, cond, mask):
    return jnp.asarray(V)


def test_fm_ot_loss_reference_value(fixed_draws):
    # torch/float64: sum((V - ((1-sigma)Z - X)*MASK)^2) / MASK.sum()
    loss = fm.fm_ot_loss(const_vf, jax.random.PRNGKey(0), jnp.asarray(X),
                         mask=jnp.asarray(MASK), sigma=1e-4)
    np.testing.assert_allclose(float(loss), 3.297693613640001, rtol=1e-5)


def test_cfm_loss_reference_value(fixed_draws):
    # torch/float64: x0 = Z, u = (Z - X)*MASK -> 3.298
    loss = fm.cfm_loss(const_vf, jax.random.PRNGKey(0), jnp.asarray(X),
                       mask=jnp.asarray(MASK), sigma=1e-4)
    np.testing.assert_allclose(float(loss), 3.2980000000000005, rtol=1e-5)


def test_droid_loss_reference_value(fixed_draws):
    # torch/float64: u = Z*MASK -> 1.271
    loss = fm.droid_loss(const_vf, jax.random.PRNGKey(0), jnp.asarray(X),
                         mask=jnp.asarray(MASK))
    np.testing.assert_allclose(float(loss), 1.2710000000000001, rtol=1e-5)


def test_diffusion_loss_reference_value(fixed_draws):
    # torch/float64 with HuberLoss(reduction='none'), VP(0.999, 0.02),
    # mle_loss_weight=0.001 -> 0.5754219045283966
    from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule

    loss = fm.diffusion_loss(
        const_vf, jax.random.PRNGKey(0), jnp.asarray(X), mask=jnp.asarray(MASK),
        criterion="huber", schedule=VPDiffusionSchedule(max_sr=0.999, min_sr=0.02),
        mle_loss_weight=0.001,
    )
    np.testing.assert_allclose(float(loss), 0.5754219045283966, rtol=1e-5)


@pytest.mark.parametrize(
    "max_sr,min_sr,signal,noise,beta",
    [
        (0.999, 0.02,
         [0.9125815672244246, 0.386209600926502],
         [0.40889470913942266, 0.9224110494525702],
         [1.3496306265577704, 7.194101437449496]),
        (1.0, 1e-8,
         [0.9238795334679953, 0.38268343929418625],
         [0.38268343005539096, 0.9238795296411609],
         [1.30129026708279, 7.584475382572868]),
    ],
)
def test_vp_schedule_reference_values(max_sr, min_sr, signal, noise, beta):
    # torch/float64 evaluation of diffusion.py:21-62 at t = [0.25, 0.75]
    from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule

    sched = VPDiffusionSchedule(max_sr=max_sr, min_sr=min_sr)
    sr, nr = sched(jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(sr), signal, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nr), noise, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.get_betas(jnp.asarray(T))), beta, rtol=1e-5)


def test_sigma5_normalization_reference_values():
    # utils.py:164-199 at mean=[0.1,-0.2], std=[2.0,0.5]:
    # x[0,0]=[0.5,-1.0] -> [1.0, -8.0]; x[1,2]=[0.6,0.9] -> [1.25, 11.0]
    from particle_fm_tpu.data.utils import inverse_normalize_tensor, normalize_tensor

    mean, std = np.array([0.1, -0.2]), np.array([2.0, 0.5])
    xn = normalize_tensor(X.copy(), mean, std, 5)
    np.testing.assert_allclose(xn[0, 0], [1.0, -8.0], rtol=1e-6)
    np.testing.assert_allclose(xn[1, 2], [1.25, 11.0], rtol=1e-6)
    back = inverse_normalize_tensor(xn, mean, std, 5)
    np.testing.assert_allclose(back, X, atol=1e-6)
