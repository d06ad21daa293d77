"""Tensor parallelism via GSPMD parameter sharding.

The reference has no TP (SURVEY 2.8) — its only parallelism is DDP — but the
TPU-native design gets it almost for free: annotate the big kernels with a
'model'-axis `NamedSharding` and XLA's SPMD partitioner propagates the
shardings through the jitted train step, inserting the all-reduces
(Megatron-style: first local MLP column-sharded, second row-sharded so the
contraction emits one psum per layer over ICI).

Usage:
    mesh = make_mesh(data=4, model=2)
    rules = epic_tp_rules()
    state = shard_state(state, mesh, rules)     # params placed with TP specs
    train_step = make_train_step(model, opt, mesh=mesh, tp_rules=rules)

Rules are (path-regex, PartitionSpec) pairs matched against
"/"-joined parameter paths; first match wins, default = replicated.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def epic_tp_rules() -> list[tuple[str, P]]:
    """Megatron pattern for the EPiC local path (the FLOPs-dominant matmuls):
    fc_local1 / fc_l1 column-sharded, fc_local2 / fc_l2 row-sharded."""
    return [
        (r".*(fc_local1|fc_l1)/kernel$", P(None, "model")),
        (r".*(fc_local1|fc_l1)/(g|bias)$", P("model")),
        (r".*(fc_local2|fc_l2)/kernel$", P("model", None)),
    ]


def transformer_tp_rules() -> list[tuple[str, P]]:
    """Head-sharded attention + column/row-sharded MLPs for the droid nets."""
    return [
        (r".*(q_linear|k_linear|v_linear|all_linear)/kernel$", P(None, "model")),
        (r".*(q_linear|k_linear|v_linear|all_linear)/bias$", P("model")),
        (r".*out_linear/kernel$", P("model", None)),
        (r".*dense/input_block/lin_0/kernel$", P(None, "model")),
        (r".*dense/input_block/lin_0/bias$", P("model")),
        (r".*dense/output_block/lin_0/kernel$", P("model", None)),
    ]


def moe_ep_rules() -> list[tuple[str, P]]:
    """Expert parallelism: shard the leading expert axis of the stacked MoE
    params (nets/moe.ExpertChoiceMoE: w1/b1 (E, ...), w2/b2 (E, ...)) over
    'model'. The dispatch/combine einsums ('becn,bnd->becd' etc.) contract
    against batch-sharded tokens, so GSPMD inserts the expert all-to-all/
    all-gather — expert parallelism is a placement, not a code path."""
    return [
        (r".*moe/(w1|w2)$", P("model", None, None)),
        (r".*moe/(b1|b2)$", P("model", None)),
    ]


def _spec_for(path: str, shape, rules) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            # drop axes the tensor doesn't have / that don't divide evenly
            if len(spec) > len(shape):
                return P()
            return spec
    return P()


def param_specs(params, rules) -> dict:
    """PartitionSpec pytree for a param tree under the given rules."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = _spec_for(path_str(kp), np.shape(leaf), rules)
    return specs


def tree_shardings(tree, mesh: Mesh, rules) -> object:
    """NamedSharding pytree matching `tree`'s structure (params or any tree
    whose leaves mirror param paths, like adam mu/nu)."""

    def path_str(kp):
        return "/".join(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)

    def spec(kp, leaf):
        s = _spec_for(path_str(kp), np.shape(leaf), rules)
        # an axis only shards if it divides the dim evenly
        dims = np.shape(leaf)
        cleaned = []
        for i, ax in enumerate(s):
            if ax is None:
                cleaned.append(None)
                continue
            if i < len(dims) and dims[i] % mesh.shape[ax] == 0:
                cleaned.append(ax)
            else:
                cleaned.append(None)
        return NamedSharding(mesh, P(*cleaned))

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_state(state, mesh: Mesh, rules) -> object:
    """Place a TrainState with TP param shardings ('model' axis), everything
    else replicated. Optimizer moments follow the param layout automatically
    (their tree paths embed the same param names)."""
    repl = NamedSharding(mesh, P())

    def place(tree, use_rules):
        if use_rules:
            sh = tree_shardings(tree, mesh, rules)
            return jax.tree_util.tree_map(jax.device_put, tree, sh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)

    return state.replace(
        params=place(state.params, True),
        ema_params=place(state.ema_params, True),
        opt_state=place(state.opt_state, True),
        norm_stats=place(state.norm_stats, False),
        step=jax.device_put(state.step, repl),
    )
