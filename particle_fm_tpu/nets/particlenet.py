"""ParticleNet: dynamic-kNN EdgeConv point-cloud classifier (JAX/flax).

Parity: the reference wraps `weaver.nn.model.ParticleNet.ParticleNet`
(particle_fm/models/jetclass_classifiers.py:318-557, config
configs/model/particlenet_classifier.yaml: conv_params
[(16,(64,64,64)), (16,(128,128,128)), (16,(256,256,256))],
fc_params [(256, 0.1)]). This is an original TPU-first implementation of the
same architecture (DGCNN-style EdgeConv, arXiv:1902.08570):

- kNN is a batched pairwise-distance matmul (MXU) + `lax.top_k` — static
  shapes, no data-dependent control flow; padded particles are pushed to
  +inf distance so they are never selected as neighbours.
- The per-edge MLP runs as (B, N, k, C) batched Dense ops — XLA tiles these
  onto the MXU directly; mean-over-neighbours aggregation.
- BatchNorm (weaver's choice) is replaced by mask-safe LayerNorm: padded
  points never pollute statistics, no mutable batch_stats state in the train
  step, and no cross-replica stat drift under data parallelism. `use_fts_bn`
  correspondingly applies a LayerNorm to the input features.
- `use_counts=True` pooling = masked mean over real particles.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from particle_fm_tpu.ops.masked import masked_mean

# (k, (c1, c2, c3)) per EdgeConv block — weaver's ParticleNet defaults
PARTICLENET_CONV_PARAMS = ((16, (64, 64, 64)), (16, (128, 128, 128)), (16, (256, 256, 256)))
PARTICLENET_FC_PARAMS = ((256, 0.1),)
# ParticleNet-Lite (configs/model/particlenet_lite_classifier.yaml)
PARTICLENET_LITE_CONV_PARAMS = ((7, (32, 32, 32)), (7, (64, 64, 64)))
PARTICLENET_LITE_FC_PARAMS = ((128, 0.1),)


def knn_indices(points: jnp.ndarray, mask: jnp.ndarray | None, k: int) -> jnp.ndarray:
    """Indices of the k nearest neighbours (self excluded) in `points`.

    points: (B, N, D); mask: (B, N, 1) or None -> (B, N, k) int32.
    Pairwise squared distances via |a|^2 + |b|^2 - 2 a.b (one batched matmul).
    """
    n = points.shape[1]
    sq = jnp.sum(points * points, axis=-1)
    d = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
        "bnd,bmd->bnm", points, points
    )
    big = jnp.asarray(1e9, d.dtype)
    if mask is not None:
        valid = mask[..., 0] > 0
        d = jnp.where(valid[:, None, :], d, big)  # padded points: never neighbours
    d = d + jnp.eye(n, dtype=d.dtype) * big  # exclude self
    k = min(k, n - 1)
    _, idx = jax.lax.top_k(-d, k)
    return idx


def gather_neighbors(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats (B, N, C), idx (B, N, k) -> neighbour features (B, N, k, C)."""
    return jax.vmap(lambda f, i: f[i])(feats, idx)


class EdgeConvBlock(nn.Module):
    """EdgeConv with shortcut: per-edge MLP on [x_i, x_j - x_i], mean over
    neighbours, plus a 1x1 shortcut projection (weaver EdgeConvBlock)."""

    k: int
    channels: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, points, feats, mask=None):
        idx = knn_indices(points, mask, self.k)
        nbr = gather_neighbors(feats, idx)  # (B, N, k, C)
        center = jnp.broadcast_to(feats[:, :, None, :], nbr.shape)
        h = jnp.concatenate([center, nbr - center], axis=-1)
        for c in self.channels:
            h = nn.Dense(c, use_bias=False, dtype=self.dtype)(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = nn.relu(h)
        h = h.mean(axis=2)  # aggregate neighbours
        sc = nn.Dense(self.channels[-1], use_bias=False, dtype=self.dtype)(feats)
        sc = nn.LayerNorm(dtype=self.dtype)(sc)
        out = nn.relu(h + sc)
        if mask is not None:
            out = out * mask
        return out


class ParticleNet(nn.Module):
    """Stacked dynamic-graph EdgeConv blocks + masked global pooling + FC head.

    Block 0 builds the graph in coordinate space (eta, phi); later blocks
    rebuild it in the learned feature space (dynamic graph, like weaver).
    """

    num_classes: int = 10
    conv_params: Sequence = PARTICLENET_CONV_PARAMS
    fc_params: Sequence = PARTICLENET_FC_PARAMS
    use_fusion: bool = False
    use_fts_bn: bool = True
    use_counts: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, points, feats, mask=None, deterministic: bool = True):
        fts = feats
        if self.use_fts_bn:
            fts = nn.LayerNorm(dtype=self.dtype, name="fts_norm")(fts)
            if mask is not None:
                fts = fts * mask
        outputs = []
        for i, (k, channels) in enumerate(self.conv_params):
            pts = points if i == 0 else fts
            fts = EdgeConvBlock(k=int(k), channels=tuple(channels), dtype=self.dtype)(
                pts, fts, mask=mask
            )
            outputs.append(fts)
        if self.use_fusion:
            fused = jnp.concatenate(outputs, axis=-1)
            out_ch = max(128, min(1024, (sum(c[-1][-1] for c in self.conv_params) // 128) * 128))
            fts = nn.relu(
                nn.LayerNorm(dtype=self.dtype)(
                    nn.Dense(out_ch, use_bias=False, dtype=self.dtype)(fused)
                )
            )
            if mask is not None:
                fts = fts * mask

        # use_counts: average over *real* particles only
        pooled = masked_mean(fts, mask) if self.use_counts else fts.mean(axis=1)

        h = pooled
        for out_dim, drop_rate in self.fc_params:
            h = nn.relu(nn.Dense(int(out_dim), dtype=self.dtype)(h))
            h = nn.Dropout(rate=float(drop_rate))(h, deterministic=deterministic)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(h)


class ParticleNetClassifierNet(nn.Module):
    """(x, mask) -> logits adapter: slices the coordinate columns out of the
    feature tensor (point_indices) so ParticleNet fits the uniform
    (x, mask, cond) batch contract."""

    n_classes: int = 10
    point_indices: Sequence[int] = (0, 1)
    net_config: Mapping[str, Any] = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, cond=None, deterministic: bool = True):
        points = x[..., tuple(self.point_indices)]
        cfg = dict(self.net_config or {})
        # explicit name: reinit_head (models/classifiers.py) keys on it
        return ParticleNet(
            num_classes=self.n_classes, dtype=self.dtype, name="particle_net", **cfg
        )(points, x, mask=mask, deterministic=deterministic)
