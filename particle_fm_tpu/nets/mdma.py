"""MDMA: cross-attention flow network with a class token (CaloChallenge).

Per layer, a single class token attends over all particles (O(N) per layer),
is mixed with the conditioning (multiplicity + optional global cond), and is
broadcast back to the particles. Output is 1 feature (hit energy).

Parity: particle_fm/models/components/mdma.py:6-176 (itself from the MDMA
paper). Conventions preserved: class token initialized as sum(x)/avg_n,
conditioning via GLU gating, key-padding-masked attention, masked output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from particle_fm_tpu.nets.common import WNDense, WNDenseSplit, cat
from particle_fm_tpu.ops.attention import attention


def _glu(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class MDMABlock(nn.Module):
    embed_dim: int  # class-token (latent) dim
    hidden: int
    num_heads: int = 8
    t_local_cat: bool = True
    t_global_cat: bool = True
    global_cond_dim: int = 0
    local_cat_cond: bool = False
    global_cat_cond: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x_cls, cond, mask, t_in=None, deterministic=True):
        act = lambda v: jax.nn.leaky_relu(v, 0.01)
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=False, dtype=self.dtype, name=name
        )
        sdense = lambda feats, name: WNDenseSplit(
            feats, use_weight_norm=False, dtype=self.dtype, name=name
        )
        res = x
        # t (and cond) are constant across the particle axis, so the local
        # concats ride WNDenseSplit (identical parameter layout to Dense on
        # the concat: x @ W_x + broadcast(set_segs @ W_set)) instead of
        # materializing (B, N, hidden + extras) buffers per block — same
        # concat-free trick as the EPiC local MLPs / transformer MLPBlock.
        t_set = t_in[:, 0, :] if self.t_local_cat else None
        cond_set = cond[:, 0, -1:] if self.local_cat_cond else None
        if self.t_global_cat:
            x_cls = cat(x_cls, t_in[:, :1, :])
        if self.global_cat_cond:
            x_cls = cat(x_cls, cond[..., -1:])
        # fc0(act(cat(x, t, cond))): act is elementwise, so it distributes
        # over the segments
        x = sdense(self.hidden, "fc0")(
            [
                (act(x), "particle"),
                (act(t_set) if t_set is not None else None, "set"),
                (act(cond_set) if cond_set is not None else None, "set"),
            ]
        )
        x_cls = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(dense(self.hidden, "fc0_cls")(act(x_cls)))

        # class token attends over particles (torch nn.MultiheadAttention equiv:
        # q/k/v projections + output projection)
        head_dim = self.hidden // self.num_heads
        q = dense(self.hidden, "attn_q")(x_cls)
        k = dense(self.hidden, "attn_k")(x)
        v = dense(self.hidden, "attn_v")(x)
        split = lambda z: z.reshape(z.shape[:-1] + (self.num_heads, head_dim))
        a = attention(split(q), split(k), split(v), kv_mask=mask[..., 0])
        x_cls = dense(self.hidden, "attn_out")(a.reshape(a.shape[:-2] + (self.hidden,)))

        x_cls = cat(x_cls, cond) if not self.t_global_cat else cat(x_cls, cond, t_in[:, :1, :])
        x_cls = dense(self.embed_dim, "fc1_cls")(x_cls)
        if self.t_global_cat:
            x_cls = cat(x_cls, t_in[:, :1, :])
        if self.global_cat_cond:
            x_cls = cat(x_cls, cond[..., -1:])
        x_cls = dense(self.embed_dim, "fc2_cls")(x_cls)
        # fc1(cat(x, cond, x_cls_broadcast)) + res, concat-free
        x = sdense(self.hidden, "fc1")(
            [(x, "particle"), (cond_set, "set"), (x_cls[:, 0, :], "set")]
        ) + res
        return x, x_cls


class MDMA(nn.Module):
    """Stack of MDMA blocks; output is a single feature per particle."""

    out_features: int = 1  # reference hard-codes 1 (energy); set = features
    # for a full flow over (E, z, alpha, r) — the reference's fm_mdma config
    # silently broadcasts its 1-dim output against 4-dim targets
    latent: int = 16
    hidden_dim: int = 256
    layers: int = 16
    global_cond_dim: int = 0
    frequencies: int = 6
    t_local_cat: bool = True
    t_global_cat: bool = True
    avg_n: int = 30
    num_heads: int = 8
    local_cat_cond: bool = False
    global_cat_cond: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None, mask=None, deterministic: bool = True):
        act = lambda v: jax.nn.leaky_relu(v, 0.01)
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=False, dtype=self.dtype, name=name
        )
        sdense = lambda feats, name: WNDenseSplit(
            feats, use_weight_norm=False, dtype=self.dtype, name=name
        )
        if mask is None:
            mask = jnp.ones_like(x[..., :1])
        t_set = t[:, 0, :] if self.t_local_cat else None
        cond_set = cond[..., -1:] if self.local_cat_cond else None
        x = act(
            sdense(self.hidden_dim, "embed")(
                [(x, "particle"), (t_set, "set"), (cond_set, "set")]
            )
        )
        x = x * mask

        # class token init: scaled sum pooling + multiplicity (+ cond)
        x_cls = jnp.sum(x, axis=1, keepdims=True) / self.avg_n
        n_valid = jnp.sum(mask, axis=1, keepdims=True)  # (B, 1, 1)
        x_cls = cat(x_cls, n_valid)
        has_cond = self.global_cat_cond or self.global_cond_dim > 0
        if has_cond:
            x_cls = cat(x_cls, cond[:, None, :])
        x_cls = dense(self.latent, "embed_cls")(x_cls)

        cond_vec = n_valid
        if has_cond:
            cond_vec = cat(cond_vec, cond[:, None, :])
        x_cls = _glu(cat(x_cls, dense(self.latent, "cond")(cond_vec)))

        for i in range(self.layers):
            x, x_cls = MDMABlock(
                embed_dim=self.latent,
                hidden=self.hidden_dim,
                num_heads=self.num_heads,
                t_local_cat=self.t_local_cat,
                t_global_cat=self.t_global_cat,
                global_cond_dim=self.global_cond_dim,
                local_cat_cond=self.local_cat_cond,
                global_cat_cond=self.global_cat_cond,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, x_cls, cond_vec, mask, t_in=t, deterministic=deterministic)

        x = sdense(self.out_features, "out")(
            [
                (act(x), "particle"),
                (act(cond_set) if cond_set is not None else None, "set"),
            ]
        )
        return x * mask
