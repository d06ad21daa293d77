"""Fused EPiC-layer Pallas kernel (experimental — currently NOT the default).

One EPiC layer = masked mean+sum pool -> 2 global MLPs -> broadcast -> 2
local MLPs with residuals, computed with a tile of sets resident in VMEM:
ONE read + ONE write of x_local per layer.

Measured on v5e (JetNet-150 flagship shapes, bf16, batch 1024, 2026-08):
XLA's own fusion of the concat-free jnp layer inside the sampler scan runs
~145 us/layer end-to-end; this kernel at its VMEM-feasible tile (tile_b=8,
tile_b>=32 exceeds the 16 MB scoped-vmem limit) runs ~1.1 ms/layer — XLA
wins because it fuses across all 6 layers of the step function and
pipelines DMA better than a per-layer grid. Kept as validated
infrastructure: the win would come from a whole-encoder kernel (weights
~400 KB, activations resident across all layers), which is the natural
next step if the sampler ever becomes HBM-bound at larger hidden sizes.

Semantics match nets/epic.py::EPiCLayer exactly (same parameter tensors,
same concat order, leaky_relu activations). Forward-only: there is no
custom_vjp, so this kernel is for inference paths; training uses the jnp
layer (whose gradients XLA derives normally).

Weight layout (as produced by EPiCLayer with weight-norm already folded):
  wg1: (tg + 2H + L + C, H)   global MLP 1        bg1: (H,)
  wg2: (tg + H + C, L)        global MLP 2        bg2: (L,)
  w1x: (H, H)  w1s: (tl + L + C, H)   local MLP 1 split  b1: (H,)
  w2x: (H, H)  w2s: (tl + C, H)       local MLP 2 split  b2: (H,)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def _kernel(
    x_ref,      # (TB, N, H) local features
    g_ref,      # (TB, L) global features
    mask_ref,   # (TB, N) mask
    set_ref,    # (TB, S) per-set features: cat(t_global/local..., cond) precomputed slices
    wg1_ref, bg1_ref, wg2_ref, bg2_ref,
    w1x_ref, w1s_ref, b1_ref, w2x_ref, w2s_ref, b2_ref,
    xo_ref, go_ref,
    *, sum_scale: float, tg_dim: int, tl_dim: int, c_dim: int,
):
    x = x_ref[:]          # (TB, N, H)
    g = g_ref[:]          # (TB, L)
    f32 = jnp.float32
    # minor-dim insertion is only supported for 32-bit types on TPU, so the
    # mask expands in f32 regardless of the activation dtype
    mask = mask_ref[:].astype(f32)  # (TB, N)
    sfeat = set_ref[:]    # (TB, tg/tl + C) layout: [t_emb, cond]

    xm = x * mask[..., None]
    pooled_sum = jnp.sum(xm, axis=1)                       # (TB, H)
    count = jnp.sum(mask, axis=1, keepdims=True)           # (TB, 1)
    pooled_mean = pooled_sum / count
    pooled_scaled = pooled_sum * sum_scale

    t_g = sfeat[:, :tg_dim]
    t_l = sfeat[:, :tl_dim]
    cond = sfeat[:, sfeat.shape[-1] - c_dim :] if c_dim else sfeat[:, :0]

    # global path (tiny matmuls)
    g_in = jnp.concatenate([t_g, pooled_mean, pooled_scaled, g, cond], axis=-1)
    g1 = _act(jnp.dot(g_in, wg1_ref[:], preferred_element_type=f32) + bg1_ref[:])
    g_new = _act(
        jnp.dot(jnp.concatenate([t_g, g1.astype(x.dtype), cond], axis=-1), wg2_ref[:],
                preferred_element_type=f32)
        + bg2_ref[:]
        + g.astype(f32)
    )
    go_ref[:] = g_new.astype(g.dtype)

    # per-set biases for the local matmuls
    s1 = jnp.concatenate([t_l, g_new.astype(x.dtype), cond], axis=-1)
    bias1 = jnp.dot(s1, w1s_ref[:], preferred_element_type=f32) + b1_ref[:]  # (TB, H)
    s2 = jnp.concatenate([t_l, cond], axis=-1) if (tl_dim or c_dim) else None
    bias2 = (
        jnp.dot(s2, w2s_ref[:], preferred_element_type=f32) + b2_ref[:]
        if s2 is not None and s2.shape[-1] > 0
        else jnp.broadcast_to(b2_ref[:], (x.shape[0], b2_ref.shape[-1])).astype(f32)
    )

    # local path: both matmuls + residual, all resident in VMEM
    tb, n, h = x.shape
    x2 = x.reshape(tb * n, h)
    x1 = _act(
        jnp.dot(x2, w1x_ref[:], preferred_element_type=f32).reshape(tb, n, -1)
        + bias1[:, None, :]
    ).astype(x.dtype)
    out = _act(
        jnp.dot(x1.reshape(tb * n, -1), w2x_ref[:], preferred_element_type=f32).reshape(
            tb, n, -1
        )
        + bias2[:, None, :]
        + x.astype(f32)
    )
    xo_ref[:] = out.astype(x.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sum_scale", "tg_dim", "tl_dim", "c_dim", "tile_b", "interpret"),
)
def epic_layer_fused_fwd(
    x_local, x_global, mask, set_feat,
    wg1, bg1, wg2, bg2, w1x, w1s, b1, w2x, w2s, b2,
    sum_scale: float = 1e-2,
    tg_dim: int = 0,
    tl_dim: int = 0,
    c_dim: int = 0,
    tile_b: int = 8,
    interpret: bool = False,
):
    """x_local (B,N,H), x_global (B,L), mask (B,N), set_feat (B, t+C)."""
    b, n, h = x_local.shape
    l = x_global.shape[-1]
    assert b % tile_b == 0, f"batch {b} not divisible by tile_b {tile_b}"
    grid = (b // tile_b,)

    def tile0(i):
        return (i, 0, 0)

    def tile2(i):
        return (i, 0)

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((b, n, h), x_local.dtype),
        jax.ShapeDtypeStruct((b, l), x_global.dtype),
    )
    kernel = functools.partial(
        _kernel, sum_scale=sum_scale, tg_dim=tg_dim, tl_dim=tl_dim, c_dim=c_dim
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n, h), tile0, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, l), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), tile2, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, set_feat.shape[-1]), tile2, memory_space=pltpu.VMEM),
            full(*wg1.shape), full(*bg1.shape), full(*wg2.shape), full(*bg2.shape),
            full(*w1x.shape), full(*w1s.shape), full(*b1.shape),
            full(*w2x.shape), full(*w2s.shape), full(*b2.shape),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n, h), tile0, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, l), tile2, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(x_local, x_global, mask, set_feat, wg1, bg1, wg2, bg2, w1x, w1s, b1, w2x, w2s, b2)
