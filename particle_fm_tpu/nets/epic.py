"""EPiC (Equivariant Point Cloud) networks — TPU-native implementation.

DeepSets-style permutation-equivariant layers with global-local message
passing (https://arxiv.org/abs/2301.08128). All ops are fixed-shape
matmuls + masked reductions, which XLA fuses and tiles onto the MXU; the
pool->broadcast pattern is O(N) in the set size.

Behavioral parity with the reference implementation:
  - EPiC_layer:        particle_fm/models/components/epic.py:17-203
  - EPiC_encoder:      epic.py:206-391
  - EPiC_discriminator: epic.py:394-598
(The math is re-derived from the paper + reference behavior; code is original.)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from particle_fm_tpu.nets.common import WNDense, WNDenseSplit, cat, get_act
from particle_fm_tpu.ops.masked import meansum_pool


class EPiCLayer(nn.Module):
    """One EPiC global-local block.

    Takes (x_global (B, latent), x_local (B, N, H)) and returns updated
    (x_global, x_local). Time embedding and conditioning are concatenated
    into the MLP inputs when enabled.
    """

    hid_dim: int = 256
    latent_dim: int = 16
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    t_local_cat: bool = False
    t_global_cat: bool = False
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    sum_scale: float = 1e-2
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        t: jnp.ndarray | None,
        x_global: jnp.ndarray,
        x_local: jnp.ndarray,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        act = get_act(self.activation)
        n = x_local.shape[-2]

        # t is constant across the particle axis in this framework (per-set
        # time), so the local path consumes its per-set slice — this is what
        # lets the concat-free split Denses below work
        t_set = t[..., 0, :] if (self.t_local_cat and t is not None) else None
        t_global = t[..., 0, :] if (self.t_global_cat and t is not None) else None
        g_cond = cond if self.global_cond_dim > 0 else None
        l_cond = cond if (self.local_cond_dim > 0 and cond is not None) else None

        wn = self.use_weight_norm
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )
        sdense = lambda feats, name: WNDenseSplit(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )

        # mean+sum pooling over particles
        pooled_mean, pooled_sum = meansum_pool(x_local, mask, self.sum_scale)

        # global MLPs (second has a residual connection before the activation)
        g_in = cat(t_global, pooled_mean, pooled_sum, x_global, g_cond)
        x_global1 = act(dense(self.hid_dim, "fc_global1")(g_in))
        x_global = act(
            dense(self.latent_dim, "fc_global2")(cat(t_global, x_global1, g_cond)) + x_global
        )
        x_global = nn.Dropout(self.dropout, deterministic=deterministic)(x_global)

        # local MLPs (second has a residual connection before the activation).
        # concat order matches the reference (t, x, global2local, cond); the
        # per-set segments ride a tiny (B, k) matmul instead of being
        # broadcast-materialized per particle.
        x_local1 = act(
            sdense(self.hid_dim, "fc_local1")(
                [(t_set, "set"), (x_local, "particle"), (x_global, "set"), (l_cond, "set")]
            )
        )
        x_local = act(
            sdense(self.hid_dim, "fc_local2")(
                [(t_set, "set"), (x_local1, "particle"), (l_cond, "set")]
            )
            + x_local
        )
        x_local = nn.Dropout(self.dropout, deterministic=deterministic)(x_local)

        return x_global, x_local


class EPiCEncoder(nn.Module):
    """EPiC generator/encoder: local embed -> pooled global init -> N EPiC
    layers -> local output head. Output is multiplied by the mask.

    Call: (t_emb (B,N,2f) | None, x (B,N,F_in), cond (B,C) | None, mask (B,N,1) | None)
          -> (B, N, feats)
    """

    feats: int = 3  # output features
    hid_dim: int = 256
    latent_dim: int = 16
    equiv_layers: int = 8
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    t_local_cat: bool = False
    t_global_cat: bool = False
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    sum_scale: float = 1e-2
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        t: jnp.ndarray | None,
        x: jnp.ndarray,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = get_act(self.activation)
        n = x.shape[-2]

        t_set = t[..., 0, :] if (self.t_local_cat and t is not None) else None
        t_global = t[..., 0, :] if (self.t_global_cat and t is not None) else None
        g_cond = cond if self.global_cond_dim > 0 else None
        l_cond = cond if (self.local_cond_dim > 0 and cond is not None) else None

        wn = self.use_weight_norm
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )
        sdense = lambda feats, name: WNDenseSplit(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )

        # input local MLPs (second with residual); concat-free split Denses
        h = act(
            sdense(self.hid_dim, "fc_l1")([(t_set, "set"), (x, "particle"), (l_cond, "set")])
        )
        h = act(
            sdense(self.hid_dim, "fc_l2")([(t_set, "set"), (h, "particle"), (l_cond, "set")])
            + h
        )
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        # pooled global init: cat(scaled_sum, mean) -> two MLPs (no residual)
        z_mean, z_sum = meansum_pool(h, mask, self.sum_scale)
        g = cat(z_sum, z_mean)
        g = act(dense(self.hid_dim, "fc_g1")(cat(t_global, g, g_cond)))
        g = act(dense(self.latent_dim, "fc_g2")(cat(t_global, g, g_cond)))

        # stack of EPiC layers
        for i in range(self.equiv_layers):
            g, h = EPiCLayer(
                hid_dim=self.hid_dim,
                latent_dim=self.latent_dim,
                global_cond_dim=self.global_cond_dim,
                local_cond_dim=self.local_cond_dim,
                t_local_cat=self.t_local_cat,
                t_global_cat=self.t_global_cat,
                activation=self.activation,
                use_weight_norm=wn,
                sum_scale=self.sum_scale,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"epic_layer_{i}",
            )(t, g, h, cond=cond, mask=mask, deterministic=deterministic)

        # output head
        out = act(
            sdense(self.feats, "fc_l3")([(t_set, "set"), (h, "particle"), (l_cond, "set")])
        )
        if mask is not None:
            out = out * mask
        return out


class EPiCDiscriminator(nn.Module):
    """EPiC set classifier: local embed -> EPiC layers -> pooled global MLP head.

    Used for gen-vs-real classifier tests. `num_sup_sets` > 1 pools over
    super-sets (e.g. the two jets of an LHCO dijet event) before the head.
    Parity: particle_fm/models/components/epic.py:394-598.
    """

    hid_dim: int = 256
    latent_dim: int = 16
    equiv_layers: int = 8
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    sum_scale: float = 1e-2
    dropout: float = 0.0
    num_sup_sets: int = 1
    out_dim: int = 1  # 1 logit (reference) or n_classes
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        act = get_act(self.activation)
        wn = self.use_weight_norm
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )

        # conditioning concat exactly as the reference embeds it
        # (epic.py:543-570): local = cond broadcast per particle into
        # fc_l1/fc_l2, global = cond into fc_g1/fc_g2. (The reference's time
        # paths, t_local_cat/t_global_cat, default off for discriminators and
        # are not carried.)
        g_cond = cond if self.global_cond_dim > 0 else None
        l_cond = None
        if self.local_cond_dim > 0:
            if cond is None:
                raise ValueError("local_cond_dim > 0 requires cond")
            l_cond = jnp.broadcast_to(
                cond[..., None, :], x.shape[:-1] + (cond.shape[-1],)
            )

        h = act(dense(self.hid_dim, "fc_l1")(cat(x, l_cond)))
        h = act(dense(self.hid_dim, "fc_l2")(cat(h, l_cond)) + h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        z_mean, z_sum = meansum_pool(h, mask, self.sum_scale)
        g = cat(z_sum, z_mean, g_cond)
        g = act(dense(self.hid_dim, "fc_g1")(g))
        g = act(dense(self.latent_dim, "fc_g2")(cat(g, g_cond)))

        for i in range(self.equiv_layers):
            g, h = EPiCLayer(
                hid_dim=self.hid_dim,
                latent_dim=self.latent_dim,
                global_cond_dim=self.global_cond_dim,
                local_cond_dim=self.local_cond_dim,
                activation=self.activation,
                use_weight_norm=wn,
                sum_scale=self.sum_scale,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"epic_layer_{i}",
            )(None, g, h, cond=cond, mask=mask, deterministic=deterministic)

        # final pooled representation -> classifier head
        z_mean, z_sum = meansum_pool(h, mask, self.sum_scale)
        g_final = cat(z_sum, z_mean, g)
        if self.num_sup_sets > 1:
            # super-set pooling (epic.py:584-590): sum the S per-set feature
            # vectors of one event and emit cat(scaled_sum, mean) — the
            # reference's permutation-invariant dijet head. Input here is
            # (B*S, N, F) with ADJACENT rows forming one event (the
            # reference takes (B, S, N, F); per-set math is identical, the
            # reshape below regroups the S axis). Callers must keep groups
            # intact through shuffling/batching (GenVsRealDataModule does) —
            # note the generative LHCO "all" layout is Fortran-ordered and is
            # NOT directly compatible with this head.
            d = g_final.shape[-1]
            s2 = g_final.reshape(-1, self.num_sup_sets, d).sum(axis=-2)
            g_final = cat(s2 * self.sum_scale, s2 / self.num_sup_sets)
        out = act(dense(self.hid_dim, "fc_d1")(g_final))
        # no residual on the second head dense (reference epic.py:595-597)
        out = act(dense(self.hid_dim, "fc_d2")(out))
        out = dense(self.out_dim, "fc_out")(out)
        return out


class EPiCDiscriminator2(nn.Module):
    """Headless EPiC trunk: local embed -> EPiC layers -> final meansum cat.

    Returns cat(scaled_sum, mean, global) of dim 2*hid_dim + latent_dim per
    set — the reusable feature extractor the reference's hierarchical
    discriminator composes twice.
    Parity: particle_fm/models/components/epic.py:776-964
    (EPiC_discriminator_2.forward; its fc_g3/fc_g4/out layers are dead
    parameters — constructed at :869-873 but never used in forward — so the
    trunk here simply doesn't have them). Weight-transplant-tested against
    the executed torch module in tests/test_torch_parity.py.
    """

    hid_dim: int = 256
    latent_dim: int = 16
    equiv_layers: int = 6
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    sum_scale: float = 1e-2
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, cond=None, mask=None, deterministic: bool = True):
        act = get_act(self.activation)
        wn = self.use_weight_norm
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )
        g_cond = cond if self.global_cond_dim > 0 else None

        h = act(dense(self.hid_dim, "fc_l1")(x))
        h = act(dense(self.hid_dim, "fc_l2")(h) + h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        z_mean, z_sum = meansum_pool(h, mask, self.sum_scale)
        g = act(dense(self.hid_dim, "fc_g1")(cat(jnp.concatenate([z_sum, z_mean], -1), g_cond)))
        g = act(dense(self.latent_dim, "fc_g2")(cat(g, g_cond)))

        for i in range(self.equiv_layers):
            g, h = EPiCLayer(
                hid_dim=self.hid_dim,
                latent_dim=self.latent_dim,
                global_cond_dim=self.global_cond_dim,
                local_cond_dim=self.local_cond_dim,
                activation=self.activation,
                use_weight_norm=wn,
                sum_scale=self.sum_scale,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"epic_layer_{i}",
            )(None, g, h, cond=cond, mask=mask, deterministic=deterministic)

        x_mean, x_sum = meansum_pool(h, mask, self.sum_scale)
        return jnp.concatenate([x_sum, x_mean, g], axis=-1)


class EPiCDiscriminator3(nn.Module):
    """Two-level (particle + jet) discriminator for multi-jet events, with
    two DISTINCT EPiCDiscriminator2 trunks like the reference.

    Flow: each of the event's `num_sup_sets` jets runs through the particle
    trunk -> (B, S, 2h+l) jet features; a second, distinct jet trunk
    processes that small set into one event feature (B, 2h+l); the head
    (fc_g3 -> fc_g4 -> out, like epic.py:700-704) consumes the event feature
    concatenated with the flattened per-jet features.

    Parity: particle_fm/models/components/epic.py:601-773
    (EPiC_discriminator3). Note the reference module as written cannot
    execute: its jet trunk pools over jets to (B, 2h+l) (epic.py:958-964)
    but fc_g3's declared width is (2h+l)*num_sup_sets (:700-702) — a
    guaranteed shape error (there is also a stray debug print at :764), and
    it appears in no experiment config. This implementation keeps the
    two-distinct-trunk topology and the head stack, and feeds the head both
    levels (event feature + per-jet features) so the second trunk actually
    contributes.

    Call: x (B*S, N, F) with mask (B*S, N, 1) — jets flattened into the batch
    (ADJACENT rows form one event); returns (B, 1) event logits.
    """

    hid_dim: int = 128
    latent_dim: int = 16
    equiv_layers: int = 3
    num_sup_sets: int = 2
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    sum_scale: float = 1e-2
    dropout: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, cond=None, mask=None, deterministic: bool = True):
        act = get_act(self.activation)
        wn = self.use_weight_norm
        dense = lambda feats, name: WNDense(
            feats, use_weight_norm=wn, dtype=self.dtype, name=name
        )
        s = self.num_sup_sets
        feat_dim = 2 * self.hid_dim + self.latent_dim

        trunk_kwargs = dict(
            hid_dim=self.hid_dim,
            latent_dim=self.latent_dim,
            equiv_layers=self.equiv_layers,
            activation=self.activation,
            use_weight_norm=wn,
            sum_scale=self.sum_scale,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        # distinct trunks: separate parameters for the particle and jet level
        jet_feats = EPiCDiscriminator2(name="particle_trunk", **trunk_kwargs)(
            x, mask=mask, deterministic=deterministic
        )  # (B*S, 2h+l)
        jet_set = jet_feats.reshape(-1, s, feat_dim)  # (B, S, 2h+l)

        event_feats = EPiCDiscriminator2(name="jet_trunk", **trunk_kwargs)(
            jet_set, mask=None, deterministic=deterministic
        )  # (B, 2h+l)

        head_in = jnp.concatenate(
            [event_feats, jet_set.reshape(jet_set.shape[0], s * feat_dim)], axis=-1
        )
        out = act(dense(self.hid_dim, "fc_g3")(head_in))
        out = act(dense(self.hid_dim, "fc_g4")(out))
        return dense(1, "out")(out)
