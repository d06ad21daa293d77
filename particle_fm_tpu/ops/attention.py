"""Masked multi-head attention core.

TPU notes: for the reference's workloads (30-558 particles) the full O(N^2)
attention fits comfortably in VMEM and XLA fuses the softmax chain, so the
einsum form below is the production path. The blockwise (flash-style) Pallas
kernel in ops/pallas/flash_attention.py takes over for longer sequences
(measured 1.9x faster at L=4096, D=128 on v5e); `attention` dispatches
automatically.

Parity: the kv-mask philosophy follows the reference (droid_transformer.py
merge_masks:16-52): only keys are masked ("let the padded nodes receive what
they want — their outputs don't matter"), so no query masking and never a
fully-masked row as long as each set has >= 1 real particle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn

NEG_INF = -1e9  # large-negative instead of -inf: bf16-safe, avoids NaN rows


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
    scores_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with key-side padding mask.

    q: (B, Lq, H, D), k/v: (B, Lk, H, D), kv_mask: (B, Lk) bool/float,
    attn_bias: (B, H, Lq, Lk) additive. Returns (B, Lq, H, D).

    `scores_dtype` controls the STORAGE dtype of the materialized
    (B, H, Lq, Lk) score tensors (default float32 — reference-exact:
    f32 logits + the plain fused f32 softmax, weights downcast to q.dtype
    only for the PV matmul).

    scores_dtype=bfloat16 targets short-set models whose sampling cost is
    dominated by score-tensor HBM traffic (droid: head_dim 16, L=150 —
    measured ~2/3 of every vector-field eval, docs/RESULTS.md round 3):
    the QK logits AND the exp() intermediate are stored in bf16 (softmax
    max/sum still accumulate in f32), and the row normalization is folded
    into the (B, Lq, H, D) output AFTER the PV matmul, which skips the
    divide pass over the large tensor entirely. ~0.4% relative error on
    the attention weights; measured 1.46x end-to-end droid sampling
    throughput on v5e (273 -> 398 jets/s) vs 1.19x for a bf16-logits
    variant that kept the in-place softmax divide.
    """
    d = q.shape[-1]
    if scores_dtype is None or jnp.dtype(scores_dtype) == jnp.float32:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if attn_bias is not None:
            logits = logits + attn_bias.astype(jnp.float32)
        if kv_mask is not None:
            keep = kv_mask.astype(bool)[:, None, None, :]
            logits = jnp.where(keep, logits, NEG_INF)
        weights = jnn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", weights, v)

    sdt = jnp.dtype(scores_dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=sdt)
    logits = logits * jnp.asarray(1.0 / (d**0.5), sdt)
    if attn_bias is not None:
        logits = logits + attn_bias.astype(sdt)
    if kv_mask is not None:
        keep = kv_mask.astype(bool)[:, None, None, :]
        logits = jnp.where(keep, logits, jnp.asarray(NEG_INF, sdt))
    # max is exact in any float dtype; exp accumulates f32, stored back sdt
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp((logits - m).astype(jnp.float32)).astype(sdt)
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)  # (B,H,Lq,1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)
    inv = (1.0 / denom[..., 0]).transpose(0, 2, 1)[..., None]  # (B,Lq,H,1)
    return (out * inv).astype(q.dtype)


def class_token_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Single-query attention (Lq == 1) as VPU reductions, not matmuls.

    q: (B, 1, H, D), k/v: (B, Lk, H, D) -> (B, 1, H, D). Numerically the
    einsum path with f32 accumulation, restated as elementwise-mul +
    axis reductions.

    Why: with Lq=1 the einsum form is a degenerate batched dot (M=1) whose
    (B, H) batch dims make XLA:TPU assign a BATCH-ON-LANES layout
    ({0,2,1}: batch minor-most, 128-lane-tiled) to the big (B, Lk, hidden)
    K/V producers. That layout is only aligned when B is a multiple of 128
    with the working set still VMEM-resident — the measured MDMA B=256
    throughput cliff (+83% over B=224/288, docs/RESULTS.md rounds 3-4; HLO
    at B=288 shows 16 staging copies of the bf16[B,150,256] K/V tensors
    that vanish at exactly B=256). The reduce form keeps the natural
    channel-minor layout, making throughput monotone in batch size instead
    of cliffed.

    MEASURED OUTCOME (v5e, 2026-08): NEGATIVE — explicit-only (impl=
    "class_token"), not auto-dispatched. The reduce form is SLOWER at every
    batch (B=256: 9.7 vs 6.2 us/jet/eval; B=224: 11.7 vs 7.8): the f32
    broadcast-multiply reads the full K/V streams per pass on the VPU with
    an 8-wide minor head axis, costing more than the batched-dot layout
    damage it avoids, and it forfeits the VMEM-resident fusion that makes
    B=256 fast. Kept as recorded infrastructure; the production fix for the
    cliff is batch-padding to the aligned size (models/flow_matching.py
    mdma sampling path).
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    # (B, Lk, H): contraction over D as an elementwise product + lane reduce
    logits = jnp.sum(q.astype(jnp.float32) * k.astype(jnp.float32), axis=-1)
    logits = logits * scale
    if kv_mask is not None:
        keep = kv_mask.astype(bool)[..., None]  # (B, Lk, 1)
        logits = jnp.where(keep, logits, NEG_INF)
    weights = jnn.softmax(logits, axis=1)  # over Lk
    out = jnp.sum(weights[..., None] * v.astype(jnp.float32), axis=1, keepdims=True)
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
    impl: str = "auto",
    scores_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """Dispatching front-end: impl in {"auto", "einsum", "flash", "fused",
    "packed"}.

    "auto" picks the blockwise flash kernel for long sequences with
    lane-tiling head dims on accelerator backends, else the einsum path.

    "packed" (ops/pallas/short_attention.py::packed_short_attention) is the
    short-set fused kernel in the packed (B, L, H*D) lane-major layout: zero
    HBM materialization of the (B, H, L, L) scores AND zero relayout of
    q/k/v. Self-attention shapes only (Lq == Lk <= 256); silently falls back
    to the einsum path for cross-attention shapes, longer sets, or the CPU
    backend (no Mosaic), so a model config can set it arch-wide.
    Differentiable (einsum-path VJP). MEASURED (v5e, droid production
    config, end-to-end sampling, 2026-08): 436 jets/s at B=128 vs the
    bf16-scores einsum path's 556 at its tuned batch — at that batch the
    einsum path is already at the VPU-softmax floor (score HBM traffic
    fully overlapped), so the kernel's saved traffic buys nothing and its
    per-head lane-slice relayouts cost ~25%. It DOES beat the einsum paths
    at large dispatch (B=640: packed 362 vs bf16-einsum 411 vs f32 273),
    but production tunes the batch per arch, so it stays explicit-only.

    "fused" (fused_short_attention — same goal, take 1) is EXPLICIT-ONLY and
    kept as a measured negative result: on v5e it was SLOWER end to end than
    the einsum path at the droid production config (158 vs 273 jets/s — the
    (B, H, L, D) blocks pay XLA-side transposes, 8x D=16 lane padding, and a
    full-f32 in-place softmax), and its mixed Lq!=Lk shapes faulted the TPU
    worker. See docs/RESULTS.md round 3; do not auto-dispatch.
    """
    lq, lk, d = q.shape[1], k.shape[1], k.shape[-1]
    on_accel = jax.default_backend() != "cpu"
    if impl == "class_token" and lq == 1 and attn_bias is None:
        # explicit-impl-only path; it always scores in f32 (VPU reductions)
        # and has no scores_dtype variant — reject rather than silently
        # dropping the request (ADVICE r4). Note its fully-masked-set
        # behavior (uniform weights over padded keys) also differs from the
        # einsum path; unreachable under the >=1-real-particle convention.
        if scores_dtype is not None:
            raise ValueError(
                "impl='class_token' does not support scores_dtype "
                "(always f32 accumulation); drop the option or use einsum"
            )
        return class_token_attention(q, k, v, kv_mask)
    if impl == "auto":
        use_flash = on_accel and attn_bias is None and lk >= 1024 and d % 128 == 0
        impl = "flash" if use_flash else "einsum"
    if impl == "packed":
        from particle_fm_tpu.ops.pallas.short_attention import (
            MAX_PACKED_LEN,
            packed_short_attention,
        )

        if on_accel and lq == lk and lk <= MAX_PACKED_LEN:
            return packed_short_attention(q, k, v, kv_mask, attn_bias)
        impl = "einsum"
    if impl == "flash":
        from particle_fm_tpu.ops.pallas.flash_attention import flash_masked_attention

        return flash_masked_attention(q, k, v, kv_mask)
    if impl == "fused":
        from particle_fm_tpu.ops.pallas.short_attention import fused_short_attention

        return fused_short_attention(q, k, v, kv_mask, attn_bias)
    return masked_attention(q, k, v, kv_mask, attn_bias, scores_dtype)


def _fused_fits(h: int, lq: int, lk: int, d: int, budget_bytes: int = 9_000_000) -> bool:
    """Conservative VMEM estimate for the fused short-sequence kernel: two
    score-sized f32 buffers + q/k/v/out with the head dim padded to 128
    lanes, all resident per program."""
    lqp, lkp = lq + (-lq) % 8, lk + (-lk) % 8
    lanes = max(d, 128)
    scores = 2 * h * lqp * lkp * 4
    qkvo = (2 * h * lkp + 2 * h * lqp) * lanes * 4
    return scores + qkvo <= budget_bytes
