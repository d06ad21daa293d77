"""Expert-choice mixture-of-experts dense block for the droid transformer.

Beyond the reference (SURVEY 2.8: the reference has no MoE / expert
parallelism) — this is the scaling path for the transformer families: the
encoder layer's dense block becomes E expert MLPs with expert-choice routing
(Zhou et al. 2022, arXiv:2202.09368), selected per layer via
`te_config.moe_config` on FullTransformerEncoder.

TPU-first design decisions:
  - **Expert-choice, not token-choice**: each expert takes its top-C tokens
    by router score, so the dispatch shapes are STATIC ((B, E, C, N) one-hot
    einsums — no data-dependent gather sizes, no capacity overflow, no
    load-balancing auxiliary loss to plumb through the generic train step).
    Load is perfectly balanced by construction.
  - **Per-set routing**: experts choose tokens within each set (batch rows
    stay independent), so routing is permutation-equivariant over the set
    axis, batch-size invariant, and padded tokens are never picked (their
    router scores are sunk to -1 before the top-k; any that do get picked in
    near-empty sets combine with gate clamped to 0).
  - **Stacked expert params**: w1/b1/w2/b2 carry a leading (E, ...) axis so
    expert parallelism is a GSPMD sharding annotation (parallel/tp.py::
    moe_ep_rules shards the expert axis over 'model'), not a code path — the
    dispatch/combine einsums become XLA collectives automatically.

All einsums run on the MXU in `dtype` (bf16-capable); the router runs in
f32 because top-k ties and softmax normalizers are precision-sensitive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from particle_fm_tpu.nets.common import cat, get_act, torch_linear_init


def _expert_init(fan_in: int):
    """torch-style U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for stacked (E, ...)
    expert params — same per-expert init as the dense blocks they replace."""
    return torch_linear_init(fan_in)


class ExpertChoiceMoE(nn.Module):
    """Expert-choice routed MoE MLP over set tokens.

    Call: (x (B, N, D), mask (B, N) bool|float|None, ctxt (B, C)|None)
    -> (B, N, outp_dim). Tokens chosen by no expert return 0 (the encoder
    layer's residual connection carries them through unchanged).
    """

    outp_dim: int
    num_experts: int = 4
    hddn_dim: int = 64
    capacity_factor: float = 2.0
    ctxt_dim: int = 0
    act: str = "lrlu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, ctxt=None, deterministic: bool = True):
        B, N, _ = x.shape
        E = self.num_experts
        C = int(np.ceil(N * self.capacity_factor / E))
        C = max(1, min(C, N))

        if self.ctxt_dim:
            if ctxt is None:
                raise ValueError("ExpertChoiceMoE expects ctxt but none given")
            ctxt_b = jnp.broadcast_to(ctxt[:, None, :], (B, N, ctxt.shape[-1]))
            x = cat(x, ctxt_b)
        d_in = x.shape[-1]

        # router in f32: scores (B, N, E) = softmax over experts
        logits = nn.Dense(
            E, kernel_init=torch_linear_init(d_in), bias_init=nn.initializers.zeros,
            name="router",
        )(x.astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)
        if mask is not None:
            # sink padded tokens below every real score (softmax >= 0) so
            # top-k only reaches them when a set has fewer than C real tokens
            scores = jnp.where(mask[..., None] > 0, scores, -1.0)

        # each expert picks its top-C tokens within each set
        g, idx = jax.lax.top_k(jnp.swapaxes(scores, 1, 2), C)  # (B, E, C)
        g = jnp.maximum(g, 0.0)  # picked padding (score -1) combines with 0
        dispatch = jax.nn.one_hot(idx, N, dtype=x.dtype)  # (B, E, C, N)

        w1 = self.param("w1", _expert_init(d_in), (E, d_in, self.hddn_dim))
        b1 = self.param("b1", _expert_init(d_in), (E, self.hddn_dim))
        w2 = self.param("w2", _expert_init(self.hddn_dim), (E, self.hddn_dim, self.outp_dim))
        b2 = self.param("b2", _expert_init(self.hddn_dim), (E, self.outp_dim))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            dispatch = dispatch.astype(self.dtype)
            w1, b1, w2, b2 = (p.astype(self.dtype) for p in (w1, b1, w2, b2))

        x_e = jnp.einsum("becn,bnd->becd", dispatch, x)  # gather per expert
        h = jnp.einsum("becd,edh->bech", x_e, w1) + b1[None, :, None]
        h = get_act(self.act)(h)
        y_e = jnp.einsum("bech,ehd->becd", h, w2) + b2[None, :, None]
        # combine: scatter expert outputs back to token slots, gate-weighted
        weighted = dispatch * g[..., None].astype(dispatch.dtype)
        return jnp.einsum("becn,becd->bnd", weighted, y_e)
