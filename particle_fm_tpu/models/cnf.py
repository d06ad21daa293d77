"""CNF vector-field wrapper: time embedding + architecture dispatch.

Parity: particle_fm/models/flow_matching_module.py:74-233 (class CNF).
The wrapper embeds the scalar per-set time t -> (B, N, 2*frequencies),
optionally concatenates it to the input features, and dispatches to one of
the set architectures:

  "epic"                     EPiCEncoder            (nets/epic.py)
  "droid_fulltransformer"    FullTransformerEncoder (nets/transformer.py)
  "droid_fullcrossattention" FullCrossAttentionEncoder
  "mdma"                     MDMA                   (nets/mdma.py)
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from particle_fm_tpu.nets.common import get_act
from particle_fm_tpu.nets.epic import EPiCEncoder
from particle_fm_tpu.nets.norm_layer import IterativeNormLayer
from particle_fm_tpu.nets.time_emb import (
    GaussianFourierProjection,
    broadcast_time_embedding,
    cosine_encoding,
    sincos_embedding,
)


class CNF(nn.Module):
    """One flow transform: t-embedding + vector-field network."""

    model: str = "epic"
    features: int = 3
    frequencies: int = 6
    hidden_dim: int = 128
    layers: int = 8
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    latent: int = 16
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    t_local_cat: bool = False
    t_global_cat: bool = False
    add_time_to_input: bool = True
    t_emb: str = "sincos"
    dropout: float = 0.0
    sum_scale: float = 1e-2
    # self-conditioning: the net consumes cat(x, x1_hat) — the reference's
    # notebook-only CFM variant (notebooks/02, README.md:52), first-class here
    self_cond: bool = False
    net_config: Mapping[str, Any] = FrozenDict()
    dtype: jnp.dtype | None = None

    def setup(self):
        input_dim = (
            self.features + 2 * self.frequencies if self.add_time_to_input else self.features
        )
        del input_dim  # input dim is inferred by flax; kept for documentation
        if self.model == "epic":
            self.net = EPiCEncoder(
                feats=self.features,
                hid_dim=self.hidden_dim,
                latent_dim=self.latent,
                equiv_layers=self.layers,
                global_cond_dim=self.global_cond_dim,
                local_cond_dim=self.local_cond_dim,
                t_local_cat=self.t_local_cat,
                t_global_cat=self.t_global_cat,
                activation=self.activation,
                use_weight_norm=self.use_weight_norm,
                sum_scale=self.sum_scale,
                dropout=self.dropout,
                dtype=self.dtype,
                **dict(self.net_config),
            )
        elif self.model == "droid_fulltransformer":
            from particle_fm_tpu.nets.transformer import FullTransformerEncoder

            self.net = FullTransformerEncoder(
                outp_dim=self.features,
                ctxt_dim=self.global_cond_dim + 2 * self.frequencies,
                dtype=self.dtype,
                **dict(self.net_config),
            )
        elif self.model == "droid_fullcrossattention":
            from particle_fm_tpu.nets.transformer import FullCrossAttentionEncoder

            self.net = FullCrossAttentionEncoder(
                outp_dim=self.features,
                ctxt_dim=self.global_cond_dim + 2 * self.frequencies,
                dtype=self.dtype,
                **dict(self.net_config),
            )
        elif self.model == "mdma":
            from particle_fm_tpu.nets.mdma import MDMA

            cfg = dict(self.net_config)
            cfg.setdefault("out_features", self.features)
            self.net = MDMA(dtype=self.dtype, **cfg)
        else:
            raise NotImplementedError(f"Model {self.model} not implemented.")

        if self.t_emb == "gaussian":
            self.gfp = GaussianFourierProjection(embed_dim=self.hidden_dim)
            self.gfp_dense = nn.Dense(self.hidden_dim)
            self.gfp_out = nn.Dense(2 * self.frequencies)

    def time_embedding(self, t: jnp.ndarray, n_particles: int) -> jnp.ndarray:
        """t: scalar or (B,) -> (B, N, 2*frequencies) (B broadcastable)."""
        if self.t_emb == "gaussian":
            t = jnp.asarray(t)
            if t.ndim == 0:
                t = t[None]
            act = get_act(self.activation)
            emb = act(self.gfp_dense(self.gfp(t)))
            emb = self.gfp_out(emb)
            return jnp.broadcast_to(
                emb[..., None, :], emb.shape[:-1] + (n_particles, emb.shape[-1])
            )
        # sincos / cosine share the parameter-free helper with parallel/pp.py
        return broadcast_time_embedding(t, n_particles, self.t_emb, self.frequencies)

    def __call__(
        self,
        t: jnp.ndarray,
        x: jnp.ndarray,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        deterministic: bool = True,
        x_sc: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        if self.self_cond:
            x = jnp.concatenate(
                [x, jnp.zeros_like(x) if x_sc is None else x_sc], axis=-1
            )
        t_emb = self.time_embedding(t, x.shape[-2]).astype(x.dtype)
        # scalar sampling times produce batch-1 embeddings; broadcast to x's batch
        t_emb = jnp.broadcast_to(t_emb, x.shape[:-1] + (t_emb.shape[-1],))
        if self.add_time_to_input:
            x = jnp.concatenate([t_emb, x], axis=-1)
        return self.net(t_emb, x, cond, mask, deterministic=deterministic)


class CNFStack(nn.Module):
    """n_transforms CNFs applied sequentially + optional in-model normalizers.

    This is the trainable top-level module; FlowMatchingModel wraps it with
    losses, samplers and train/eval plumbing.
    """

    n_transforms: int = 1
    features: int = 3
    global_cond_dim: int = 0
    use_normaliser: bool = False
    normaliser_config: Mapping[str, Any] = FrozenDict()
    cnf_config: Mapping[str, Any] = FrozenDict()

    def setup(self):
        self.flows = [
            CNF(features=self.features, global_cond_dim=self.global_cond_dim, **dict(self.cnf_config))
            for _ in range(self.n_transforms)
        ]
        if self.use_normaliser:
            self.normaliser = IterativeNormLayer(self.features, **dict(self.normaliser_config))
            if self.global_cond_dim > 0:
                self.ctxt_normaliser = IterativeNormLayer(
                    self.global_cond_dim, **dict(self.normaliser_config)
                )

    def __call__(self, t, x, cond=None, mask=None, deterministic=True, x_sc=None):
        """Vector field v(t, x): the composition of all flow transforms."""
        for flow in self.flows:
            x = flow(t, x, cond=cond, mask=mask, deterministic=deterministic, x_sc=x_sc)
        return x

    def flow_k(self, k: int, t, x, cond=None, mask=None, deterministic=True, x_sc=None):
        """Apply a single flow transform (for per-flow ODE integration)."""
        return self.flows[k](
            t, x, cond=cond, mask=mask, deterministic=deterministic, x_sc=x_sc
        )

    def normalise(self, x, mask=None, update_stats: bool = False):
        return self.normaliser(x, mask, update_stats=update_stats)

    def normalise_cond(self, cond, update_stats: bool = False):
        return self.ctxt_normaliser(cond, update_stats=update_stats)

    def reverse_norm(self, x, mask=None):
        return self.normaliser.reverse(x, mask)
