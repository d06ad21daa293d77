"""PC-Droid transformer family: Normformer encoder + perceiver cross-attention.

Behavioral parity with the reference (particle_fm/models/components/
droid_transformer.py, itself adapted from rodem-hep/pcdroid):
  - MultiHeadedAttentionBlock (:117-284): q/k/v projections, kv-only padding
    mask, optional pre-output LayerNorm, optional zero-init output proj.
  - TransformerEncoderLayer (:287-344): pre-LN residual attention + residual
    context-conditioned dense block (Normformer/FoundationTransformer style).
  - TransformerCrossAttentionLayer (:347-397).
  - TransformerEncoder (:400-437): N layers + final LayerNorm.
  - FullTransformerEncoder (:440-548): ctxt = concat(t_emb, cond) -> dense
    embedders around the encoder.
  - CrossAttentionEncoder (:551-619): `num_tokens` learnable global tokens,
    there-and-back cross attention per layer (O(N*K) instead of O(N^2)).
  - FullCrossAttentionEncoder (:622-711).
  - MLPBlock / DenseNetwork (:714-1011): config-driven MLP stacks with
    context injection ("lrlu" = LeakyReLU(0.1)).

All attention runs through ops/attention.masked_attention (bf16 matmuls on
the MXU, f32 softmax). LayerNorms use epsilon=1e-5 (torch's default) so the
weight-transplant goldens in tests/test_torch_parity.py match the executed
reference to float precision.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from particle_fm_tpu.nets.common import WNDense, WNDenseSplit, cat, get_act
from particle_fm_tpu.ops.attention import attention


def _broadcast_ctxt(ctxt: jnp.ndarray | None, x: jnp.ndarray) -> jnp.ndarray | None:
    """Expand a (B, C) context to the rank of x, like DenseNetwork.forward."""
    if ctxt is None:
        return None
    while ctxt.ndim < x.ndim:
        ctxt = ctxt[..., None, :]
    return jnp.broadcast_to(ctxt, x.shape[:-1] + (ctxt.shape[-1],))


class MLPBlock(nn.Module):
    """Linear -> act -> (norm) -> (dropout), n_layers deep, optional residual.

    Context is concatenated to the input of the first layer only."""

    outp_dim: int
    ctxt_dim: int = 0
    n_layers: int = 1
    act: str = "lrlu"
    nrm: str = "none"
    drp: float = 0.0
    do_res: bool = False
    init_zeros: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, ctxt=None, deterministic: bool = True):
        inpt = x
        ctxt_set = None  # per-set ctxt handled concat-free in lin_0
        if self.ctxt_dim:
            if ctxt is None:
                raise ValueError("Was expecting contextual information but none given!")
            if ctxt.ndim < x.ndim and not (self.init_zeros and self.n_layers == 1):
                # (B, C) context against (B, N, F) tokens: feed the first
                # Dense as x @ W_x + broadcast(ctxt @ W_c) via WNDenseSplit
                # (identical param layout to Dense-on-concat) instead of
                # materializing the (B, N, F+C) broadcast concat — the
                # droid dense blocks pay more HBM on that concat than on
                # the matmul itself (same trick as the EPiC local MLPs)
                ctxt_set = ctxt
            else:
                x = cat(x, _broadcast_ctxt(ctxt, x))
        for n in range(self.n_layers):
            if n == 0 and ctxt_set is not None:
                x = WNDenseSplit(
                    self.outp_dim,
                    use_weight_norm=False,
                    dtype=self.dtype,
                    name=f"lin_{n}",
                )([(x, "particle"), (ctxt_set, "set")])
            else:
                x = WNDense(
                    self.outp_dim,
                    use_weight_norm=False,
                    init_zeros=self.init_zeros and n == self.n_layers - 1,
                    dtype=self.dtype,
                    name=f"lin_{n}",
                )(x)
            if self.act != "none":
                x = get_act(self.act)(x)
            if self.nrm == "layer":
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"nrm_{n}")(x)
            elif self.nrm not in ("none",):
                raise ValueError(f"No normalisation with name: {self.nrm}")
            if self.drp > 0:
                x = nn.Dropout(self.drp, deterministic=deterministic)(x)
        if self.do_res and inpt.shape[-1] == self.outp_dim:
            x = x + inpt
        return x


class DenseNetwork(nn.Module):
    """Input block -> hidden blocks -> output block, with context injection."""

    outp_dim: int = 0
    ctxt_dim: int = 0
    hddn_dim: int | Sequence[int] = 32
    num_blocks: int = 1
    n_lyr_pbk: int = 1
    act_h: str = "lrlu"
    act_o: str = "none"
    do_out: bool = True
    nrm: str = "none"
    drp: float = 0.0
    drp_on_output: bool = False
    nrm_on_output: bool = False
    do_res: bool = False
    ctxt_in_inpt: bool = True
    ctxt_in_hddn: bool = False
    output_init_zeros: bool = False
    dtype: jnp.dtype | None = None

    def hidden_dims(self) -> list[int]:
        if isinstance(self.hddn_dim, int):
            return self.num_blocks * [self.hddn_dim]
        return list(self.hddn_dim)

    def out_dim(self, inpt_dim: int) -> int:
        hddn = self.hidden_dims()
        return (self.outp_dim or inpt_dim) if self.do_out else hddn[-1]

    @nn.compact
    def __call__(self, x, ctxt=None, deterministic: bool = True):
        if self.ctxt_dim and not (self.ctxt_in_inpt or self.ctxt_in_hddn):
            raise ValueError("Network has context inputs but nowhere to use them!")
        hddn = self.hidden_dims()
        inpt_dim = x.shape[-1]
        x = MLPBlock(
            outp_dim=hddn[0],
            ctxt_dim=self.ctxt_dim if self.ctxt_in_inpt else 0,
            act=self.act_h,
            nrm=self.nrm,
            drp=self.drp,
            dtype=self.dtype,
            name="input_block",
        )(x, ctxt, deterministic)
        for i, (h1, h2) in enumerate(zip(hddn[:-1], hddn[1:])):
            x = MLPBlock(
                outp_dim=h2,
                ctxt_dim=self.ctxt_dim if self.ctxt_in_hddn else 0,
                n_layers=self.n_lyr_pbk,
                act=self.act_h,
                nrm=self.nrm,
                drp=self.drp,
                do_res=self.do_res,
                dtype=self.dtype,
                name=f"hidden_block_{i}",
            )(x, ctxt, deterministic)
        if self.do_out:
            x = MLPBlock(
                outp_dim=self.outp_dim or inpt_dim,
                act=self.act_o,
                init_zeros=self.output_init_zeros,
                nrm=self.nrm if self.nrm_on_output else "none",
                drp=self.drp if self.drp_on_output else 0.0,
                dtype=self.dtype,
                name="output_block",
            )(x, None, deterministic)
        return x


class MultiHeadedAttentionBlock(nn.Module):
    """Generic MHA: self- or cross-attention with kv-side padding mask."""

    model_dim: int
    num_heads: int = 1
    drp: float = 0.0
    init_zeros: bool = False
    do_selfattn: bool = False
    do_layer_norm: bool = False
    # storage dtype for the materialized (B, H, Lq, Lk) score tensors:
    # "float32" (default, reference-exact) or "bfloat16" (halves the
    # score-tensor HBM traffic that dominates droid sampling — see
    # ops/attention.masked_attention). Reductions accumulate f32 either way.
    scores_dtype: str | None = None
    # attention dispatch: "auto" (einsum/flash by shape), or "packed" to use
    # the fused short-set Pallas kernel on self-attention shapes (falls back
    # to einsum for cross-attention / CPU) — see ops/attention.attention.
    attn_impl: str = "auto"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        q,
        k=None,
        v=None,
        kv_mask=None,
        attn_bias=None,
        deterministic: bool = True,
    ):
        if self.model_dim % self.num_heads:
            raise ValueError("Model dimension must be divisible by number of heads!")
        head_dim = self.model_dim // self.num_heads
        if k is None:
            k = q
        if v is None:
            v = k

        if self.do_selfattn:
            qkv = WNDense(
                3 * self.model_dim, use_weight_norm=False, dtype=self.dtype, name="all_linear"
            )(q)
            q_out, k_out, v_out = jnp.split(qkv, 3, axis=-1)
        else:
            q_out = WNDense(self.model_dim, use_weight_norm=False, dtype=self.dtype, name="q_linear")(q)
            k_out = WNDense(self.model_dim, use_weight_norm=False, dtype=self.dtype, name="k_linear")(k)
            v_out = WNDense(self.model_dim, use_weight_norm=False, dtype=self.dtype, name="v_linear")(v)

        def split_heads(t):
            return t.reshape(t.shape[:-1] + (self.num_heads, head_dim))

        a_out = attention(
            split_heads(q_out), split_heads(k_out), split_heads(v_out), kv_mask, attn_bias,
            impl=self.attn_impl,
            scores_dtype=jnp.dtype(self.scores_dtype) if self.scores_dtype else None,
        )
        a_out = a_out.reshape(a_out.shape[:-2] + (self.model_dim,))
        if self.drp > 0:
            a_out = nn.Dropout(self.drp, deterministic=deterministic)(a_out)
        if self.do_layer_norm:
            a_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(a_out)
        return WNDense(
            self.model_dim,
            use_weight_norm=False,
            init_zeros=self.init_zeros,
            dtype=self.dtype,
            name="out_linear",
        )(a_out)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN residual self-attention + residual ctxt-conditioned dense.

    With `moe_config` set, the dense block is an expert-choice MoE
    (nets/moe.ExpertChoiceMoE) instead of the DenseNetwork — beyond the
    reference; unpicked tokens ride the residual connection unchanged."""

    model_dim: int
    mha_config: Mapping[str, Any] = FrozenDict()
    dense_config: Mapping[str, Any] = FrozenDict()
    ctxt_dim: int = 0
    moe_config: Mapping[str, Any] | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, ctxt=None, attn_bias=None, deterministic=True):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadedAttentionBlock(
            self.model_dim,
            do_selfattn=True,
            dtype=self.dtype,
            name="self_attn",
            **dict(self.mha_config),
        )(h, kv_mask=mask, attn_bias=attn_bias, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        if self.moe_config is not None:
            from particle_fm_tpu.nets.moe import ExpertChoiceMoE

            x = x + ExpertChoiceMoE(
                outp_dim=self.model_dim,
                ctxt_dim=self.ctxt_dim,
                dtype=self.dtype,
                name="moe",
                **dict(self.moe_config),
            )(h, mask=mask, ctxt=ctxt, deterministic=deterministic)
        else:
            x = x + DenseNetwork(
                outp_dim=self.model_dim,
                ctxt_dim=self.ctxt_dim,
                dtype=self.dtype,
                name="dense",
                **dict(self.dense_config),
            )(h, ctxt, deterministic)
        return x


class TransformerCrossAttentionLayer(nn.Module):
    """Pre-LN residual cross-attention + residual dense."""

    model_dim: int
    mha_config: Mapping[str, Any] = FrozenDict()
    dense_config: Mapping[str, Any] = FrozenDict()
    ctxt_dim: int = 0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, q_seq, kv_seq, kv_mask=None, ctxt=None, deterministic=True):
        kv_n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm0")(kv_seq)
        q_n = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(q_seq)
        q_seq = q_seq + MultiHeadedAttentionBlock(
            self.model_dim,
            do_selfattn=False,
            dtype=self.dtype,
            name="cross_attn",
            **dict(self.mha_config),
        )(q_n, kv_n, kv_mask=kv_mask, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(q_seq)
        q_seq = q_seq + DenseNetwork(
            outp_dim=self.model_dim,
            ctxt_dim=self.ctxt_dim,
            dtype=self.dtype,
            name="dense",
            **dict(self.dense_config),
        )(h, ctxt, deterministic)
        return q_seq


class TransformerEncoder(nn.Module):
    """Stack of encoder layers + final LayerNorm."""

    model_dim: int = 64
    num_layers: int = 3
    mha_config: Mapping[str, Any] = FrozenDict()
    dense_config: Mapping[str, Any] = FrozenDict()
    ctxt_dim: int = 0
    moe_config: Mapping[str, Any] | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, ctxt=None, attn_bias=None, deterministic=True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.model_dim,
                self.mha_config,
                self.dense_config,
                self.ctxt_dim,
                moe_config=self.moe_config,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, mask, ctxt, attn_bias, deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(x)


def _default_embd_dims(model_dim: int, *cfgs: dict) -> None:
    """The reference widens the embedder MLPs to 2*model_dim by default."""
    for cfg in cfgs:
        cfg.setdefault("hddn_dim", 2 * model_dim)


def resolve_fte_configs(
    te_config: Mapping[str, Any],
    node_embd_config: Mapping[str, Any],
    outp_embd_config: Mapping[str, Any],
    ctxt_embd_config: Mapping[str, Any],
) -> tuple[dict, dict, dict, dict, int]:
    """Resolve FullTransformerEncoder sub-configs (shared with parallel/pp.py
    so the pipelined re-composition cannot drift from __call__):
    returns (te_config, node_cfg, outp_cfg, ctxt_cfg, model_dim) with the
    2*model_dim embedder-width defaults applied."""
    te_config = dict(te_config)
    node_cfg = dict(node_embd_config)
    outp_cfg = dict(outp_embd_config)
    ctxt_cfg = dict(ctxt_embd_config)
    te_config.setdefault("dense_config", {})
    te_config["dense_config"] = dict(te_config["dense_config"])
    if "model_dim" in te_config:
        _default_embd_dims(
            te_config["model_dim"], node_cfg, ctxt_cfg, outp_cfg, te_config["dense_config"]
        )
    model_dim = te_config.get("model_dim", 64)
    return te_config, node_cfg, outp_cfg, ctxt_cfg, model_dim


class FullTransformerEncoder(nn.Module):
    """Node/ctxt/output embedders around a TransformerEncoder.

    Call: (t_emb (B,N,2f), x (B,N,F_in), cond (B,C)|None, mask (B,N,1)|None).
    The per-set context is concat(t_emb[:, 0], cond)."""

    outp_dim: int
    ctxt_dim: int = 0
    te_config: Mapping[str, Any] = FrozenDict()
    node_embd_config: Mapping[str, Any] = FrozenDict()
    outp_embd_config: Mapping[str, Any] = FrozenDict()
    ctxt_embd_config: Mapping[str, Any] = FrozenDict()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None, mask=None, deterministic: bool = True):
        te_config, node_cfg, outp_cfg, ctxt_cfg, model_dim = resolve_fte_configs(
            self.te_config, self.node_embd_config, self.outp_embd_config, self.ctxt_embd_config
        )

        kv_mask = mask[..., 0] if mask is not None else None
        ctxt = None
        ctxt_out = 0
        if self.ctxt_dim:
            ctxt_in = cat(t[..., 0, :], cond)
            ctxt = DenseNetwork(dtype=self.dtype, name="ctxt_embd", **ctxt_cfg)(
                ctxt_in, deterministic=deterministic
            )
            ctxt_out = ctxt.shape[-1]

        x = DenseNetwork(
            outp_dim=model_dim, ctxt_dim=ctxt_out, dtype=self.dtype, name="node_embd", **node_cfg
        )(x, ctxt, deterministic)
        x = TransformerEncoder(
            ctxt_dim=ctxt_out, dtype=self.dtype, name="te", **te_config
        )(x, mask=kv_mask, ctxt=ctxt, deterministic=deterministic)
        x = DenseNetwork(
            outp_dim=self.outp_dim, ctxt_dim=ctxt_out, dtype=self.dtype, name="outp_embd", **outp_cfg
        )(x, ctxt, deterministic)
        return x


class CrossAttentionEncoder(nn.Module):
    """Perceiver-style: K learnable global tokens, there-and-back cross attn."""

    model_dim: int = 64
    num_tokens: int = 4
    num_layers: int = 5
    mha_config: Mapping[str, Any] = FrozenDict()
    dense_config: Mapping[str, Any] = FrozenDict()
    ctxt_dim: int = 0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, seq, mask=None, ctxt=None, deterministic: bool = True):
        tokens = self.param(
            "global_tokens",
            nn.initializers.normal(stddev=1.0),
            (1, self.num_tokens, self.model_dim),
        )
        g = jnp.broadcast_to(tokens, (seq.shape[0], self.num_tokens, self.model_dim)).astype(
            seq.dtype
        )
        for i in range(self.num_layers):
            g = TransformerCrossAttentionLayer(
                self.model_dim,
                self.mha_config,
                self.dense_config,
                self.ctxt_dim,
                dtype=self.dtype,
                name=f"from_layer_{i}",
            )(g, seq, mask, ctxt, deterministic)
            seq = TransformerCrossAttentionLayer(
                self.model_dim,
                self.mha_config,
                self.dense_config,
                self.ctxt_dim,
                dtype=self.dtype,
                name=f"to_layer_{i}",
            )(seq, g, None, ctxt, deterministic)
        return seq


class FullCrossAttentionEncoder(nn.Module):
    """Node/ctxt/output embedders around a CrossAttentionEncoder."""

    outp_dim: int
    ctxt_dim: int = 0
    cae_config: Mapping[str, Any] = FrozenDict()
    node_embd_config: Mapping[str, Any] = FrozenDict()
    outp_embd_config: Mapping[str, Any] = FrozenDict()
    ctxt_embd_config: Mapping[str, Any] = FrozenDict()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, t, x, cond=None, mask=None, deterministic: bool = True):
        cae_config = dict(self.cae_config)
        node_cfg = dict(self.node_embd_config)
        outp_cfg = dict(self.outp_embd_config)
        ctxt_cfg = dict(self.ctxt_embd_config)
        cae_config.setdefault("dense_config", {})
        cae_config["dense_config"] = dict(cae_config["dense_config"])
        if "model_dim" in cae_config:
            _default_embd_dims(
                cae_config["model_dim"], node_cfg, ctxt_cfg, outp_cfg, cae_config["dense_config"]
            )
        model_dim = cae_config.get("model_dim", 64)

        kv_mask = mask[..., 0] if mask is not None else None
        ctxt = None
        ctxt_out = 0
        if self.ctxt_dim:
            ctxt_in = cat(t[..., 0, :], cond)
            ctxt = DenseNetwork(dtype=self.dtype, name="ctxt_embd", **ctxt_cfg)(
                ctxt_in, deterministic=deterministic
            )
            ctxt_out = ctxt.shape[-1]

        x = DenseNetwork(
            outp_dim=model_dim, ctxt_dim=ctxt_out, dtype=self.dtype, name="node_embd", **node_cfg
        )(x, ctxt, deterministic)
        x = CrossAttentionEncoder(
            ctxt_dim=ctxt_out, dtype=self.dtype, name="cae", **cae_config
        )(x, mask=kv_mask, ctxt=ctxt, deterministic=deterministic)
        x = DenseNetwork(
            outp_dim=self.outp_dim, ctxt_dim=ctxt_out, dtype=self.dtype, name="outp_embd", **outp_cfg
        )(x, ctxt, deterministic)
        return x
