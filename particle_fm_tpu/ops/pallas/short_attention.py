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


# ---------------------------------------------------------------------------
# Take 2: packed lane-major layout ("packed short attention").
#
# Post-mortem of the kernel above (measured 158 vs einsum's 273 jets/s on the
# droid config) identified three structural costs, all fixed here:
#   1. the XLA-side (B, L, H, D) -> (B, H, L, D) transposes materialize full
#      q/k/v/out tensors in HBM (~4 extra passes/layer) — here q/k/v stay in
#      the PACKED (B, L, H*D) layout the QKV projection already produces (the
#      head split reshape cancels), so the kernel adds zero HBM relayouts;
#   2. D=16 on the lane axis padded every VMEM buffer 8x — here lanes carry
#      H*D (256 for droid), full tiles, and heads are static 16-lane slices
#      relayed out in VMEM (cheap: VMEM-to-VMEM, no HBM);
#   3. the in-place f32 softmax divide — here the row normalization is folded
#      into the tiny (L, D) per-head output after the PV matmul, and the kv
#      mask is a precomputed additive (B, 1, L) f32 vector fused into the
#      scale multiply (one FMA pass over the scores instead of where+divide).
#
# Training still works: a custom_vjp recomputes the einsum-path VJP on the
# backward (same math, XLA-fused), so the kernel only has to be fast forward.
#
# MEASURED OUTCOME (v5e, droid production config, end-to-end NFE=100
# sampling, 2026-08): 2.3-2.8x faster than take 1 (B=640: 362 vs 158) and
# faster than the f32 einsum path at matching batch (362 vs 273), but still
# behind the bf16-scores einsum path at its tuned batch (436 vs 556 jets/s
# at B=128). Per-eval accounting shows why: at the tuned batch the einsum
# path already runs at the VPU softmax floor (~1.5 ms/eval for 3 layers at
# B=128 — the score-tensor HBM traffic is fully overlapped with the VPU
# work), so eliminating that traffic buys nothing, and the kernel's 16
# per-head 16-lane slice relayouts + 160->256 lane padding add ~25% on top
# of the same VPU-bound softmax. Every short-set attention variant here is
# softmax-VPU-bound, not HBM-bound, once the dispatch batch is tuned.
# Kept explicit-only (`mha_config.attn_impl=packed`), numerics tested; it
# is the right path only for deployments pinned to large single dispatches.
# ---------------------------------------------------------------------------


def _packed_kernel(q_ref, k_ref, v_ref, madd_ref, bias_ref, o_ref, *, h, d, scale):
    # blocks per program (one set): q/k/v (1, Lp, H*D) model dtype,
    # madd (1, 1, Lp) f32 additive key mask (0 or -1e9),
    # bias (1, H, Lp, Lp) f32 or None, out (1, Lp, H*D)
    madd = madd_ref[0]  # (1, Lp) broadcasts over query rows
    outs = []
    for i in range(h):  # static unroll: lane slices resolve at compile time
        sl = slice(i * d, (i + 1) * d)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jax.lax.dot_general(  # (Lp, Lp) f32, stays in VMEM
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + madd
        if bias_ref is not None:
            s = s + bias_ref[0, i].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(  # (Lp, D) f32
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o / denom)  # post-PV normalization: D lanes, not Lp
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _packed_call(q, k, v, madd, attn_bias, interpret: bool):
    """q/k/v (B, L, H, D) with Lq == Lk; madd (B, L) f32 additive key mask."""
    b, lq, h, d = q.shape
    pad = (-lq) % 16  # bf16 sublane tile; covers f32's 8 too
    lp = lq + pad
    qp = q.reshape(b, lq, h * d)
    kp = k.reshape(b, lq, h * d)
    vp = v.reshape(b, lq, h * d)
    if pad:
        qp = jnp.pad(qp, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(vp, ((0, 0), (0, pad), (0, 0)))
        madd = jnp.pad(madd, ((0, 0), (0, pad)), constant_values=NEG)
        if attn_bias is not None:
            attn_bias = jnp.pad(attn_bias, ((0, 0), (0, 0), (0, pad), (0, pad)))

    specs = [
        pl.BlockSpec((1, lp, h * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lp, h * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lp, h * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp, madd[:, None, :]]
    scale = 1.0 / (d**0.5)
    if attn_bias is not None:
        specs.append(
            pl.BlockSpec((1, h, lp, lp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(attn_bias)
        kernel = functools.partial(_packed_kernel, h=h, d=d, scale=scale)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, mr, orf, **kw: _packed_kernel(qr, kr, vr, mr, None, orf, **kw),
            h=h, d=d, scale=scale,
        )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, lp, h * d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lp, h * d), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :lq].reshape(b, lq, h, d)


def _ref_math(q, k, v, madd, attn_bias=None):
    """Einsum-path equivalent of the packed kernel's math (for the VJP)."""
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    s = s / jnp.sqrt(jnp.asarray(d, jnp.float32)) + madd[:, None, None, :]
    if attn_bias is not None:
        s = s + attn_bias.astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _packed_attn(q, k, v, madd, interpret):
    return _packed_call(q, k, v, madd, None, interpret)


def _packed_attn_fwd(q, k, v, madd, interpret):
    return _packed_call(q, k, v, madd, None, interpret), (q, k, v, madd)


def _packed_attn_bwd(interpret, res, g):
    q, k, v, madd = res
    _, vjp = jax.vjp(lambda a, b, c: _ref_math(a, b, c, madd), q, k, v)
    return (*vjp(g), None)


_packed_attn.defvjp(_packed_attn_fwd, _packed_attn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _packed_attn_bias(q, k, v, madd, attn_bias, interpret):
    return _packed_call(q, k, v, madd, attn_bias, interpret)


def _packed_attn_bias_fwd(q, k, v, madd, attn_bias, interpret):
    return _packed_call(q, k, v, madd, attn_bias, interpret), (q, k, v, madd, attn_bias)


def _packed_attn_bias_bwd(interpret, res, g):
    q, k, v, madd, attn_bias = res
    _, vjp = jax.vjp(lambda a, b, c, bb: _ref_math(a, b, c, madd, bb), q, k, v, attn_bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, None, dbias


_packed_attn_bias.defvjp(_packed_attn_bias_fwd, _packed_attn_bias_bwd)

# VMEM guard: per program, the unrolled per-head (Lp, Lp->256-lane) f32 score
# buffers dominate; 256 keys x 16 heads worst case ~4 MB if Mosaic keeps all
# heads live. Shapes beyond this use flash/einsum.
MAX_PACKED_LEN = 256


def packed_short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    attn_bias: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-layout fused attention for short EQUAL-length (self-attn) sets.

    q/k/v: (B, L, H, D) with Lq == Lk, kv_mask: (B, L), attn_bias
    (B, H, L, L) additive. Returns (B, L, H, D). Differentiable (einsum-path
    VJP). Matches ops/attention.masked_attention's f32-softmax numerics.
    """
    b, lq, h, d = q.shape
    if k.shape[1] != lq:
        raise ValueError(
            "packed_short_attention requires Lq == Lk (self-attention shapes); "
            f"got Lq={lq}, Lk={k.shape[1]} — use the einsum or flash path."
        )
    if kv_mask is None:
        madd = jnp.zeros((b, lq), jnp.float32)
    else:
        madd = (kv_mask.astype(jnp.float32) - 1.0) * (-NEG)
    if attn_bias is None:
        return _packed_attn(q, k, v, madd, interpret)
    return _packed_attn_bias(q, k, v, madd, attn_bias.astype(jnp.float32), interpret)
