"""Pallas kernel numerics: fused EPiC layer vs the linen reference layer
(interpret mode — runs on the CPU test mesh; the TPU path is exercised by
bench/profiling runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.nets.epic import EPiCLayer
from particle_fm_tpu.ops.pallas.epic_layer import epic_layer_fused_fwd
import pytest


def _fold(p):
    v, g, b = p["kernel"], p["g"], p["bias"]
    w = v * (g[None, :] / jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12))
    return w, b


@pytest.mark.slow
def test_fused_epic_layer_matches_linen():
    B, N, H, L, F2, C = 8, 16, 128, 8, 12, 2
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, N, H).astype(np.float32))
    g = jnp.asarray(rs.randn(B, L).astype(np.float32))
    t = jnp.asarray(np.tile(rs.randn(B, 1, F2).astype(np.float32), (1, N, 1)))
    cond = jnp.asarray(rs.randn(B, C).astype(np.float32))
    mask = jnp.asarray(
        (np.arange(N)[None, :] < rs.randint(4, N + 1, (B, 1))).astype(np.float32)
    )[..., None]

    layer = EPiCLayer(
        hid_dim=H, latent_dim=L, global_cond_dim=C, local_cond_dim=C,
        t_local_cat=True, t_global_cat=True,
    )
    params = layer.init(jax.random.PRNGKey(0), t, g, x, cond=cond, mask=mask)
    ref_g, ref_x = layer.apply(params, t, g, x, cond=cond, mask=mask)

    pp = params["params"]
    wg1, bg1 = _fold(pp["fc_global1"])
    wg2, bg2 = _fold(pp["fc_global2"])
    w1, b1 = _fold(pp["fc_local1"])
    w2, b2 = _fold(pp["fc_local2"])
    w1s = jnp.concatenate([w1[:F2], w1[F2 + H : F2 + H + L], w1[F2 + H + L :]], axis=0)
    w1x = w1[F2 : F2 + H]
    w2s = jnp.concatenate([w2[:F2], w2[F2 + H :]], axis=0)
    w2x = w2[F2 : F2 + H]
    set_feat = jnp.concatenate([t[:, 0, :], cond], axis=-1)

    xo, go = epic_layer_fused_fwd(
        x, g, mask[..., 0], set_feat,
        wg1, bg1, wg2, bg2, w1x, w1s, b1, w2x, w2s, b2,
        sum_scale=1e-2, tg_dim=F2, tl_dim=F2, c_dim=C, tile_b=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(xo), np.asarray(ref_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ref_g), atol=2e-4)
