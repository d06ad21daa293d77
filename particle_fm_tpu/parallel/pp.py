"""Pipeline parallelism (GPipe-style) for the droid transformer stack.

Beyond-reference: the reference's only parallelism is Lightning DDP
(SURVEY 2.8).  On a TPU pod the deep Normformer stack of the droid family
(configs/model/fm_droid_transformer.yaml) can instead be split *by layer*
across devices, with activations flowing stage -> stage over ICI:

  - the L encoder layers' parameters are stacked on a leading axis and
    sharded over a 'pipe' mesh axis (S stages, L % S == 0, each device
    holds L/S contiguous layers),
  - the batch is split into M microbatches; the pipeline runs M + S - 1
    ticks inside one `lax.scan`, every tick applying each stage's layers
    to its in-flight microbatch and rotating activations forward with
    `lax.ppermute` (a neighbour-only ICI hop),
  - the schedule is a pure function, so `jax.grad` differentiates straight
    through it — the transpose of `ppermute` is the reverse-direction
    `ppermute`, which IS the backward pipeline; no hand-written 1F1B
    schedule is needed for correctness (XLA overlaps the per-tick collective
    with the next tick's compute where profitable).

Embedders (node/ctxt/outp) and the final LayerNorm stay replicated — they
are a rounding error of the FLOPs — so only the O(L) layer stack is staged.
Bubble fraction is the GPipe (S-1)/(M+S-1); pick microbatches >= 4*S for
>~80% pipeline utilization.

This module recomposes FullTransformerEncoder.__call__ at the params level
(flax submodule .apply on the corresponding subtrees) because the pipeline
engine needs the layer parameters as explicit stacked arrays inside
`shard_map`, which flax's module-bound variables cannot express.  Config
resolution is shared with the module via nets.transformer.resolve_fte_configs
and tests/test_pp.py pins forward/grad equality to the unpipelined module,
so the recomposition cannot drift silently.

Usage:
    mesh = make_pipe_mesh(stages=4)                      # 1-D ('pipe',) mesh
    vf = make_pp_vector_field(model, mesh, microbatches=8)
    train_step = make_train_step_pp(model, opt, mesh, microbatches=8)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def make_pipe_mesh(
    stages: int | None = None,
    devices=None,
    with_data_axis: bool = False,
    data: int = 1,
) -> Mesh:
    """('pipe',) mesh over `stages` devices (default: all).

    `with_data_axis=True` prepends a size-1 'data' axis so the mesh is
    drop-in compatible with the trainer's batch-sharding helpers (the batch
    "shards" over the trivial axis, i.e. stays replicated across stages).

    `data > 1` builds the dp×pp composition: a ('data', 'pipe') mesh of
    `data` independent pipelines of `stages` stages each.  Stage neighbours
    are consecutive devices (the reshape keeps each pipeline's rotation on
    adjacent ICI links); the batch shards over 'data' and gradient
    all-reduce across replicas is inserted by GSPMD outside the pipeline's
    shard_map."""
    if devices is None:
        devices = jax.devices()
    if stages is None:
        stages = len(devices) // data
    if data > 1 or with_data_axis:
        need = data * stages
        if len(devices) < need:
            raise ValueError(
                f"dp_pp mesh needs data*stages = {need} devices, have {len(devices)}"
            )
        arr = np.array(devices[:need]).reshape(data, stages)
        return Mesh(arr, ("data", "pipe"))
    return Mesh(np.array(devices[:stages]), ("pipe",))


def stack_layer_params(te_params: dict, num_layers: int) -> dict:
    """Stack the per-layer param subtrees te/layer_{i} on a leading axis."""
    layers = [te_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_layers(
    mesh: Mesh,
    apply_layer,
    stacked_params,
    h: jnp.ndarray,
    kv_mask: jnp.ndarray | None,
    ctxt: jnp.ndarray | None,
    *,
    microbatches: int,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Run h (B, N, D) through L stacked layers, pipelined over `axis`.

    apply_layer(params_one_layer, x, kv_mask, ctxt) -> x is the stage body;
    stacked_params has leading axis L (sharded over `axis` into S stages of
    L/S layers each).  Differentiable end to end.

    Inputs are replicated across stages (each device holds all microbatches
    but stage 0 alone consumes them) and the output is combined with a
    masked psum — both are deliberate simplicity/HBM trade-offs that cost
    O(B) memory and one all-reduce; at droid scale (B*N*D ~ MBs) they are
    noise next to the layer FLOPs.

    If the mesh also has a 'data' axis (dp×pp, make_pipe_mesh(data=D)), the
    batch axis shards over it and each data-replica runs its own complete
    pipeline on its local rows — the microbatch split happens INSIDE the
    shard body on the local shard, so composing dp costs no batch
    collective at all (the gradient all-reduce over 'data' is GSPMD's,
    outside this function).
    """
    S = mesh.shape[axis]
    M = microbatches
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"num_layers ({L}) must be divisible by pipeline stages ({S})")
    B = h.shape[0]
    data_axis = "data" if "data" in mesh.axis_names else None
    D = mesh.shape[data_axis] if data_axis else 1
    if B % (M * D) != 0:
        raise ValueError(
            f"batch ({B}) must be divisible by microbatches*data ({M}*{D})"
        )

    fwd_perm = [(i, i + 1) for i in range(S - 1)]
    batch_spec = P(data_axis) if data_axis else P()

    def stage_body(local_params, h, kv_mask, ctxt):
        # local microbatch split: (B/D, ...) -> (M, B/(D*M), ...)
        hs = h.reshape(M, h.shape[0] // M, *h.shape[1:])
        masks = (
            None
            if kv_mask is None
            else kv_mask.reshape(M, kv_mask.shape[0] // M, *kv_mask.shape[1:])
        )
        ctxts = (
            None
            if ctxt is None
            else ctxt.reshape(M, ctxt.shape[0] // M, *ctxt.shape[1:])
        )
        stage = jax.lax.axis_index(axis)
        is_first = stage == 0
        is_last = stage == S - 1

        def tick(carry, t):
            act, outbuf = carry
            # stage 0 feeds microbatch t; later stages consume the activation
            # rotated in from the previous stage at the end of the last tick
            fed = jax.lax.dynamic_index_in_dim(
                hs, jnp.clip(t, 0, M - 1), axis=0, keepdims=False
            )
            x = jnp.where(is_first, fed, act)
            # side inputs for the microbatch THIS stage holds at tick t
            mb_idx = jnp.clip(t - stage, 0, M - 1)
            m = (
                None
                if masks is None
                else jax.lax.dynamic_index_in_dim(masks, mb_idx, axis=0, keepdims=False)
            )
            c = (
                None
                if ctxts is None
                else jax.lax.dynamic_index_in_dim(ctxts, mb_idx, axis=0, keepdims=False)
            )

            def layer_step(xx, p):
                return apply_layer(p, xx, m, c), None

            y, _ = jax.lax.scan(layer_step, x, local_params)
            # the last stage finishes microbatch t-(S-1) at tick t; every
            # write in t in [S-1, M+S-2] is a distinct valid slot, so no
            # bubble tick ever lands in the buffer
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            write = jnp.logical_and(is_last, t >= S - 1)
            slot = jax.lax.dynamic_index_in_dim(outbuf, out_idx, axis=0, keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(write, y, slot), out_idx, axis=0
            )
            act_next = jax.lax.ppermute(y, axis, fwd_perm)
            return (act_next, outbuf), None

        # the carries become device-varying after the first tick (ppermute /
        # stage-dependent writes), so mark the replicated zeros as varying
        # for shard_map's manual-axes type system
        act0 = jax.lax.pcast(jnp.zeros_like(hs[0]), (axis,), to="varying")
        outbuf0 = jax.lax.pcast(jnp.zeros_like(hs), (axis,), to="varying")
        (_, outbuf), _ = jax.lax.scan(tick, (act0, outbuf0), jnp.arange(M + S - 1))
        # only the last stage's buffer is real; mask + psum replicates it
        outbuf = jnp.where(is_last, outbuf, jnp.zeros_like(outbuf))
        outbuf = jax.lax.psum(outbuf, axis)
        return outbuf.reshape(h.shape)

    mask_spec = batch_spec if kv_mask is not None else None
    ctxt_spec = batch_spec if ctxt is not None else None
    return shard_map(
        stage_body,
        mesh=mesh,
        in_specs=(P(axis), batch_spec, mask_spec, ctxt_spec),
        out_specs=batch_spec,
    )(stacked_params, h, kv_mask, ctxt)


def _fte_apply_pipelined(fte, params: dict, mesh, microbatches, t, x, cond, mask):
    """FullTransformerEncoder.__call__ recomposed with the te stack pipelined.

    Mirrors nets/transformer.py::FullTransformerEncoder.__call__ line for
    line (configs resolved by the shared resolve_fte_configs); pinned equal
    to the module by tests/test_pp.py::test_pp_forward_matches_module.
    """
    from particle_fm_tpu.nets.transformer import (
        DenseNetwork,
        TransformerEncoderLayer,
        cat,
        resolve_fte_configs,
    )

    te_cfg, node_cfg, outp_cfg, ctxt_cfg, model_dim = resolve_fte_configs(
        fte.te_config, fte.node_embd_config, fte.outp_embd_config, fte.ctxt_embd_config
    )
    num_layers = te_cfg.get("num_layers", 3)

    kv_mask = mask[..., 0] if mask is not None else None
    ctxt = None
    ctxt_out = 0
    if fte.ctxt_dim:
        ctxt_in = cat(t[..., 0, :], cond)
        ctxt = DenseNetwork(dtype=fte.dtype, **ctxt_cfg).apply(
            {"params": params["ctxt_embd"]}, ctxt_in
        )
        ctxt_out = ctxt.shape[-1]

    h = DenseNetwork(
        outp_dim=model_dim, ctxt_dim=ctxt_out, dtype=fte.dtype, **node_cfg
    ).apply({"params": params["node_embd"]}, x, ctxt)

    layer_mod = TransformerEncoderLayer(
        model_dim,
        te_cfg.get("mha_config", {}),
        te_cfg["dense_config"],
        ctxt_dim=ctxt_out,
        moe_config=te_cfg.get("moe_config"),
        dtype=fte.dtype,
    )

    def apply_layer(p, xx, m, c):
        return layer_mod.apply({"params": p}, xx, m, c)

    stacked = stack_layer_params(params["te"], num_layers)
    h = pipeline_layers(
        mesh, apply_layer, stacked, h, kv_mask, ctxt, microbatches=microbatches
    )
    h = nn.LayerNorm(epsilon=1e-5, dtype=fte.dtype).apply(
        {"params": params["te"]["final_norm"]}, h
    )
    return DenseNetwork(
        outp_dim=fte.outp_dim, ctxt_dim=ctxt_out, dtype=fte.dtype, **outp_cfg
    ).apply({"params": params["outp_embd"]}, h, ctxt)


def make_pp_vector_field(model, mesh: Mesh, *, microbatches: int = 8):
    """Pipelined vector field for a droid_fulltransformer FlowMatchingModel.

    Returns vf(variables, t, x, cond, mask) numerically equal to
    model.vector_field but with the encoder-layer stack split over the
    mesh's 'pipe' axis.  Composes with model.loss(..., vf_fn=vf) for
    training and with the ODE samplers for inference.
    """
    if model.model != "droid_fulltransformer":
        raise NotImplementedError(
            "pipeline parallelism is implemented for the deep droid "
            f"transformer stack (got model={model.model!r})"
        )
    if model.n_transforms != 1:
        raise NotImplementedError("pp supports n_transforms=1")
    if model.t_emb == "gaussian":
        raise NotImplementedError("pp supports the parameter-free t embeddings")

    from particle_fm_tpu.nets.time_emb import broadcast_time_embedding
    from particle_fm_tpu.nets.transformer import FullTransformerEncoder

    fte = FullTransformerEncoder(
        outp_dim=model.features,
        ctxt_dim=model.global_cond_dim + 2 * model.frequencies,
        dtype=model.dtype,
        **dict(model.net_config),
    )

    def vf(variables, t, x, cond=None, mask=None):
        params = variables["params"]["flows_0"]
        # same embedding convention as CNF.time_embedding (shared helper)
        t_emb = broadcast_time_embedding(
            t, x.shape[-2], model.t_emb, model.frequencies
        ).astype(x.dtype)
        t_emb = jnp.broadcast_to(t_emb, x.shape[:-1] + (t_emb.shape[-1],))
        if model.add_time_to_input:
            x = jnp.concatenate([t_emb, x], axis=-1)
        return _fte_apply_pipelined(
            fte, params["net"], mesh, microbatches, t_emb, x, cond, mask
        )

    return vf


def make_train_step_pp(
    model,
    optimizer,
    mesh: Mesh,
    *,
    microbatches: int = 8,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
):
    """Jitted train step with the vector field pipelined over mesh['pipe'].

    State lives replicated; the layer-stack shards and the stage rotation
    happen inside the step via shard_map.  Gradients for the staged layers
    are computed by AD's reverse pipeline and land replicated, so the
    optimizer update is identical to the single-device step
    (tests/test_pp.py::test_pp_train_step_matches_dp).

    On a ('data', 'pipe') mesh (make_pipe_mesh(data=D)) the batch shards
    over 'data' — D independent pipelines, gradient all-reduce across them
    inserted by GSPMD (dp×pp; tests/test_pp.py::test_dp_pp_*).
    """
    from particle_fm_tpu.parallel.train import _build_step_fn

    vf = make_pp_vector_field(model, mesh, microbatches=microbatches)
    step_fn = _build_step_fn(
        model,
        optimizer,
        ema_decay=ema_decay,
        ema_every_n=ema_every_n,
        ema_start_step=ema_start_step,
        vf_fn=vf,
    )
    if "data" in mesh.axis_names:
        from particle_fm_tpu.parallel.mesh import batch_sharding, replicated

        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(None, repl, data, data, data),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))
