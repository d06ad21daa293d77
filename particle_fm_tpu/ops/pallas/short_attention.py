"""Fused short-sequence masked attention Pallas kernel.

Motivation (measured, docs/RESULTS.md round 3): the droid transformer's
production config (model_dim 256, 16 heads -> head_dim 16, N=150) spends
~2/3 of every vector-field eval in attention — not on FLOPs (the N^2 core is
~10% of the matmul work) but on HBM traffic: the (B, H, L, L) float32 logits
tensor (0.92 GB at B=640) is materialized and round-tripped between the QK^T
matmul, the masked softmax, and the AV matmul. XLA cannot fuse through the
softmax reduction between two MXU ops, so the fix is a kernel that keeps the
whole (H, L, L) score block in VMEM.

Unlike flash attention (ops/pallas/flash_attention.py — streaming softmax
for LONG sequences), this kernel exploits the opposite regime: for particle
clouds L <= ~256 the entire per-set score tensor fits VMEM, so one program
per batch element computes all heads' logits, softmax, and the AV product
with zero HBM materialization of L^2 intermediates. Supports the additive
per-head `attn_bias` (ParT pairwise interaction attention, nets/part.py).

HBM traffic per eval drops from ~(3 passes) * B*H*L*L*4 bytes to just
q/k/v/out (+bias when used): ~12x less for the droid config.

MEASURED OUTCOME on v5e (2026-08): bit-exact vs the einsum path, but SLOWER
end to end at the droid config (158 vs 273 jets/s) — the one-program-per-set
grid (B=640 programs) with D=16 lane padding and VPU-bound softmax loses to
XLA's fused softmax pipeline despite the traffic saving — and the mixed
Lq != Lk cross-attention shapes faulted the TPU worker. The kernel is
therefore EXPLICIT-ONLY (ops/attention.attention never auto-dispatches it);
kept with interpret-mode numeric tests as measured-negative-result
infrastructure, like ops/pallas/epic_layer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, *, scale: float):
    # blocks per program (one batch element): q (1, H, Lq, D), k/v (1, H, Lk, D),
    # mask (1, Lk, 1), bias (1, H, Lq, Lk) or a (1, 1, 1, 1) dummy
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # (H, Lq, Lk): contraction over D, batched over H — stays in VMEM
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    mk = mask_ref[0, :, 0].astype(jnp.float32)  # (Lk,)
    s = s + (mk[None, None, :] - 1.0) * (-NEG)  # mask==0 -> NEG
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


# VMEM budget: q/k/v/out (H, L, D<-128 lanes) f32 + scores (H, Lq, Lk) f32
# must fit comfortably under ~16 MB; 512 keys x 16 heads ~ 2.1 MB scores.
MAX_FUSED_LEN = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-sequence fused attention for short sets.

    q: (B, Lq, H, D), k/v: (B, Lk, H, D), kv_mask: (B, Lk),
    attn_bias: (B, H, Lq, Lk) additive. Returns (B, Lq, H, D).
    Matches ops/attention.masked_attention numerically (f32 softmax).
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if kv_mask is None:
        kv_mask = jnp.ones((b, lk), jnp.float32)

    # pad sequence axes to sublane multiples; padded keys are masked out,
    # padded query rows are dropped on return
    pad_q, pad_k = (-lq) % 8, (-lk) % 8
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask.astype(jnp.float32), ((0, 0), (0, pad_k)))
    if attn_bias is not None and (pad_q or pad_k):
        attn_bias = jnp.pad(attn_bias, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))
    lqp, lkp = lq + pad_q, lk + pad_k

    # (B, L, H, D) -> (B, H, L, D): heads ride the in-kernel batched dot
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    specs = [
        pl.BlockSpec((1, h, lqp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, lkp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h, lkp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lkp, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qt, kt, vt, kv_mask.astype(jnp.float32)[..., None]]
    if attn_bias is not None:
        specs.append(
            pl.BlockSpec(
                (1, h, lqp, lkp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            )
        )
        args.append(attn_bias)
        kernel = functools.partial(_kernel, scale=1.0 / (d**0.5))
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, mr, orf, scale: _kernel(qr, kr, vr, mr, None, orf, scale=scale),
            scale=1.0 / (d**0.5),
        )

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, h, lqp, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3)[:, :lq]
