"""Classifier models for the gen-vs-real evaluation tests.

Parity:
  - EPiCClassifier: particle_fm/models/epic_classifier.py:40-223 — binary
    classifier (generated vs real) on point clouds, BCE loss, Accuracy/AUROC.
  - HLClassifier: models/hl_classifier.py:40-232 — "cathode" MLP on
    high-level features.
  - JetClassClassifier: models/jetclass_classifiers.py — the reference wraps
    ParticleTransformer/ParticleNet imported from the external weaver-core
    package (hard-coded sys.path); here arch="part" is a native ParT with the
    defining pairwise interaction attention (nets/part.py; pair_input_dim=4,
    pair_embed_dims=[64,64,64] like jetclass_classifiers.py:28-44),
    arch="particlenet" is the kNN EdgeConv net, arch="transformer" a plain
    Normformer baseline, and the EPiC classifier variant is native. CE loss
    with optional fine-tuning (reinitialise the final head).

All expose the Trainer-compatible interface: init / loss(variables, rng, x,
mask, cond, train) -> (scalar, aux) with cond = labels, plus predict().
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.core import FrozenDict

from particle_fm_tpu.nets.epic import EPiCDiscriminator
from particle_fm_tpu.nets.mlp import CathodeClassifier
from particle_fm_tpu.nets.transformer import DenseNetwork, FullTransformerEncoder
from particle_fm_tpu.ops.masked import masked_mean


class TransformerClassifierNet(nn.Module):
    """Normformer encoder + masked mean pooling + dense head (n_classes)."""

    n_classes: int = 10
    te_config: Mapping[str, Any] = FrozenDict()
    head_config: Mapping[str, Any] = FrozenDict()
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mask=None, cond=None, deterministic: bool = True):
        te_cfg = dict(self.te_config) or {"model_dim": 128, "num_layers": 3}
        model_dim = te_cfg.get("model_dim", 128)
        h = DenseNetwork(outp_dim=model_dim, dtype=self.dtype, name="embed")(
            x, deterministic=deterministic
        )
        from particle_fm_tpu.nets.transformer import TransformerEncoder

        h = TransformerEncoder(dtype=self.dtype, name="encoder", **te_cfg)(
            h, mask=mask[..., 0] if mask is not None else None, deterministic=deterministic
        )
        pooled = masked_mean(h, mask)
        return DenseNetwork(
            outp_dim=self.n_classes, dtype=self.dtype, name="head", **dict(self.head_config)
        )(pooled, deterministic=deterministic)


@dataclasses.dataclass(eq=False)
class SetClassifierModel:
    """Set classifier (binary or multiclass) over (x, mask) with labels in cond."""

    arch: str = "epic"  # "epic" | "transformer" | "part" | "particlenet"
    n_classes: int = 1  # 1 => binary with BCE logits; >1 => softmax CE
    num_particles: int = 150
    features: int = 3
    net_config: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    dtype: Any = None

    def __post_init__(self):
        # super-set grouping (epic only): S adjacent input rows form one
        # event and the module emits ONE logit per event (B/S) — loss labels
        # are grouped and predict() repeats probs back to per-row so every
        # consumer (Trainer batching, ClassifierEvalCallback AUROC) keeps
        # working on per-row arrays. GenVsRealDataModule(num_sup_sets=S)
        # keeps the groups contiguous through shuffling/splitting.
        self.sup_sets = int(dict(self.net_config).get("num_sup_sets", 1))
        if self.sup_sets > 1 and self.arch != "epic":
            raise ValueError("num_sup_sets > 1 is only supported for arch='epic'")
        if self.arch == "epic":
            cfg = dict(self.net_config)
            cfg.setdefault("hid_dim", 128)
            cfg.setdefault("latent_dim", 10)
            cfg.setdefault("equiv_layers", 3)
            cfg["out_dim"] = max(self.n_classes, 1)
            self.module = EPiCDiscriminator(dtype=self.dtype, **cfg)
        elif self.arch == "transformer":
            self.module = TransformerClassifierNet(
                n_classes=max(self.n_classes, 1), dtype=self.dtype, **dict(self.net_config)
            )
        elif self.arch == "part":
            from particle_fm_tpu.nets.part import ParTClassifierNet

            cfg = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in dict(self.net_config).items()
            }
            self.module = ParTClassifierNet(
                n_classes=max(self.n_classes, 1), dtype=self.dtype, **cfg
            )
        elif self.arch == "particlenet":
            from particle_fm_tpu.nets.particlenet import ParticleNetClassifierNet

            cfg = dict(self.net_config)
            point_indices = cfg.pop("point_indices", (0, 1))
            self.module = ParticleNetClassifierNet(
                n_classes=max(self.n_classes, 1),
                point_indices=tuple(point_indices),
                net_config=cfg,
                dtype=self.dtype,
            )
        else:
            raise ValueError(f"unknown classifier arch {self.arch}")

    def init(self, rng: jax.Array, batch_size: int = 2) -> dict:
        x = jnp.zeros((batch_size, self.num_particles, self.features))
        mask = jnp.ones((batch_size, self.num_particles, 1))
        return dict(self.module.init(rng, x, mask=mask))

    def reinit_head(self, variables: dict, rng: jax.Array) -> dict:
        """Reinitialise the classification head, keeping the trunk — the
        fine-tune-from-pretrained hook (reference
        jetclass_classifiers.py:250-263 reinitialise_fc).

        Head modules per arch (trunk layers are left untouched):
          epic:        fc_d1/fc_d2/fc_out (post-pooling discriminator MLP;
                       fc_l*/fc_g* are input/global trunk embeds)
          transformer: head (the output DenseNetwork)
          particlenet: particle_net/head (nested below the net module)"""
        fresh = self.init(rng)["params"]
        params = dict(variables["params"])
        if self.arch == "particlenet":
            net_key = "particle_net"  # fixed in ParticleNetClassifierNet
            if net_key not in params:
                raise ValueError(
                    f"expected '{net_key}' module in params, got {sorted(params)}"
                )
            inner = dict(params[net_key])
            inner["head"] = fresh[net_key]["head"]
            params[net_key] = inner
        else:
            head_keys = (
                ("fc_d1", "fc_d2", "fc_out") if self.arch == "epic" else ("head",)
            )  # "part" and "transformer" both name their output Dense "head"
            for k in head_keys:
                if k in params:
                    params[k] = fresh[k]
        out = dict(variables)
        out["params"] = params
        return out

    def logits(self, variables, x, mask=None):
        return self.module.apply(variables, x, mask=mask)

    def loss(self, variables, rng, x, mask=None, cond=None, train: bool = False):
        logits = self.module.apply(
            variables, x, mask=mask, deterministic=not train,
            rngs={"dropout": rng} if train else None,
        )
        labels = cond
        if self.sup_sets > 1:
            # per-event logits (B/S): take one label per group (identical
            # within an event by the datamodule's grouping contract)
            labels = labels.reshape(-1, self.sup_sets, *labels.shape[1:])[:, 0]
        if self.n_classes == 1:
            labels = labels.reshape(logits.shape).astype(logits.dtype)
            loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
        else:
            if labels.ndim == 2 and labels.shape[-1] == self.n_classes:
                labels = jnp.argmax(labels, axis=-1)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32).reshape(-1)
            ).mean()
        return loss, {}

    @partial(jax.jit, static_argnames=("self",))
    def predict(self, variables, x, mask=None):
        """Probabilities: sigmoid (binary) or softmax (multiclass). With
        super-set grouping, the per-event probability is repeated onto each
        of its S rows (ranking-identical, so AUROC/accuracy are unchanged)."""
        logits = self.module.apply(variables, x, mask=mask)
        if self.sup_sets > 1:
            logits = jnp.repeat(logits, self.sup_sets, axis=0)
        if self.n_classes == 1:
            return jax.nn.sigmoid(logits)[..., 0]
        return jax.nn.softmax(logits, axis=-1)


@dataclasses.dataclass(eq=False)
class HLClassifierModel:
    """Cathode MLP classifier on flat high-level features (binary)."""

    features: int = 4
    layers: tuple = (64, 64, 64)
    dtype: Any = None

    def __post_init__(self):
        self.module = CathodeClassifier(layers=self.layers, dtype=self.dtype)

    def init(self, rng: jax.Array, batch_size: int = 2) -> dict:
        return dict(self.module.init(rng, jnp.zeros((batch_size, self.features))))

    def loss(self, variables, rng, x, mask=None, cond=None, train: bool = False):
        logits = self.module.apply(variables, x)
        labels = cond.reshape(logits.shape).astype(logits.dtype)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean(), {}

    @partial(jax.jit, static_argnames=("self",))
    def predict(self, variables, x, mask=None):
        return jax.nn.sigmoid(self.module.apply(variables, x))[..., 0]


def binary_metrics(probs, labels) -> dict:
    """Accuracy + AUROC on the host (sklearn), like torchmetrics in the
    reference (epic_classifier.py:66-83)."""
    import numpy as np
    from sklearn.metrics import roc_auc_score

    probs = np.asarray(probs)
    labels = np.asarray(labels).reshape(-1)
    acc = float(((probs > 0.5) == (labels > 0.5)).mean())
    auc = float(roc_auc_score(labels, probs))
    return {"accuracy": acc, "auroc": auc}
