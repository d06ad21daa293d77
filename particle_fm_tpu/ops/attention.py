"""Masked multi-head attention core.

TPU notes: for the reference's workloads (30-558 particles) the full O(N^2)
attention fits comfortably in VMEM and XLA fuses the softmax chain, so the
einsum form below is the production path. A blockwise (flash-style) Pallas
kernel lives in ops/pallas/flash_attention.py for longer sequences; both
share this interface.

Parity: the kv-mask philosophy follows the reference (droid_transformer.py
merge_masks:16-52): only keys are masked ("let the padded nodes receive what
they want — their outputs don't matter"), so no query masking and never a
fully-masked row as long as each set has >= 1 real particle.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn

NEG_INF = -1e9  # large-negative instead of -inf: bf16-safe, avoids NaN rows


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with key-side padding mask.

    q: (B, Lq, H, D), k/v: (B, Lk, H, D), kv_mask: (B, Lk) bool/float,
    attn_bias: (B, H, Lq, Lk) additive. Returns (B, Lq, H, D).
    Softmax runs in float32 regardless of input dtype (TPU-friendly:
    the matmuls stay bf16 on the MXU, the reduction stays accurate).
    """
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    if kv_mask is not None:
        keep = kv_mask.astype(bool)[:, None, None, :]
        logits = jnp.where(keep, logits, NEG_INF)
    weights = jnn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
