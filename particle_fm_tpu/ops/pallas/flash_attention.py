"""Blockwise (flash-style) masked attention Pallas kernel.

The reference's sets max out at 558 particles, where full O(N^2) attention is
fine (SURVEY 5: "the masked attention kernel should still be written
blockwise so sequence scaling is a config knob, not a rewrite"). This kernel
provides that headroom: the (Lq, Lk) score matrix is never materialized —
softmax runs with streaming max/sum statistics over kv chunks, so memory is
O(Lq * block_k) regardless of sequence length.

Interface matches ops/attention.masked_attention: q (B, Lq, H, D),
k/v (B, Lk, H, D), kv_mask (B, Lk). The batch*head pair is the grid's outer
axis; k/v rows stay VMEM-resident per (batch, head) program (fine up to
~10k particles at D=128) while scores are chunked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, scale: float):
    # blocks: q (1, Lq, D), k/v (1, Lk, D), mask (1, Lk) — one (batch, head)
    # pair per program
    q = q_ref[0].astype(jnp.float32) * scale
    lq, d = q.shape
    lk = k_ref.shape[1]
    n_chunks = lk // block_k

    def chunk(i, carry):
        m_prev, l_prev, acc = carry
        ks = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        mk = mask_ref[0, pl.ds(i * block_k, block_k), 0].astype(jnp.float32)
        s = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)  # (Lq, blk)
        s = s + (mk[None, :] - 1.0) * (-NEG_INF)  # mask==0 -> NEG_INF
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jnp.dot(p, vs, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((lq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((lq, 1), jnp.float32)
    acc0 = jnp.zeros((lq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, chunk, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_q", "interpret"))
def flash_masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    block_k: int = 128,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming-softmax masked attention. Shapes like masked_attention.

    VMEM per program = one q tile (block_q x D) + the kv rows of one
    (batch, head) pair; practical ceiling ~16k keys at D=128."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    if kv_mask is None:
        kv_mask = jnp.ones((b, lk), q.dtype)
    kv_mask = kv_mask.astype(jnp.float32)

    # pad Lk (masked out) and Lq (rows discarded) to block multiples
    pad_k = (-lk) % block_k
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
        kv_mask = jnp.pad(kv_mask, ((0, 0), (0, pad_k)))
        lk += pad_k
    lq_orig = lq
    block_q = min(block_q, max(8, lq))
    pad_q = (-lq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
        lq += pad_q

    # (B, L, H, D) -> (B*H, L, D)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)

    scale = 1.0 / (d**0.5)
    kernel = functools.partial(_kernel, block_k=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            # mask as (B, Lk, 1): trailing dims satisfy Mosaic block tiling
            pl.BlockSpec((1, lk, 1), lambda i, j: (i // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, kv_mask[..., None])
    return out.reshape(b, h, lq, d).transpose(0, 2, 1, 3)[:, :lq_orig]
