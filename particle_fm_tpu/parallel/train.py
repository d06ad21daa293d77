"""Sharded train/eval steps: one jitted program, data-parallel over the mesh.

The whole optimization step — loss, backward, AdamW, grad clip, LR schedule,
EMA, running-normalizer update — is one XLA program. With the batch sharded
over the 'data' mesh axis and parameters replicated, XLA emits the gradient
all-reduce over ICI automatically (the TPU-native analogue of the reference's
Lightning DDP + NCCL, configs/trainer/ddp.yaml).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from particle_fm_tpu.parallel.mesh import (
    batch_sharding,
    perm_sharding,
    replicated,
    sp_sharding,
    stacked_sharding,
)
from particle_fm_tpu.training.ema import ema_update


class TrainState(struct.PyTreeNode):
    params: dict
    norm_stats: dict
    ema_params: dict
    opt_state: optax.OptState
    step: jnp.ndarray

    def variables(self, ema: bool = False) -> dict:
        v = {"params": self.ema_params if ema else self.params}
        if self.norm_stats:
            v["norm_stats"] = self.norm_stats
        return v


def create_train_state(model, rng: jax.Array, optimizer: optax.GradientTransformation):
    variables = model.init(rng)
    params = variables["params"]
    norm_stats = variables.get("norm_stats", {})
    return TrainState(
        params=params,
        norm_stats=norm_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_optimizer(
    lr=1e-3,
    weight_decay: float = 5e-5,
    grad_clip: float | None = 0.5,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW + global-norm clipping, mirroring the reference's defaults
    (configs/model/flow_matching.yaml: AdamW lr=1e-3 wd=5e-5; trainer
    gradient_clip_val=0.5). `lr` may be a schedule function."""
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    return optax.chain(*txs)


def _build_step_fn(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
    vf_fn=None,
) -> Callable:
    """The un-jitted training step body (shared by make_train_step,
    make_train_epoch, and pp.make_train_step_pp via `vf_fn`)."""

    def step_fn(state: TrainState, rng: jax.Array, x, mask, cond):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.norm_stats:
                variables["norm_stats"] = state.norm_stats
            extra = {} if vf_fn is None else {"vf_fn": vf_fn}
            loss, new_stats = model.loss(
                variables, rng, x, mask=mask, cond=cond, train=True, **extra
            )
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(
            state.ema_params,
            new_params,
            state.step,
            decay=ema_decay,
            every_n=ema_every_n,
            start_step=ema_start_step,
        )
        new_state = state.replace(
            params=new_params,
            norm_stats=new_stats.get("norm_stats", state.norm_stats),
            ema_params=new_ema,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    return step_fn


def _build_accum_step_fn(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
    vf_fn=None,
) -> Callable:
    """Gradient-accumulation step body: `step(state, rng, xs, ms, cs)` where
    the data args carry a leading microbatch axis (A, B, ...). The A
    microbatch gradients are computed sequentially under one lax.scan (XLA
    keeps a single microbatch's activations live — the point: effective batch
    A*B with batch-B activation memory), combined as a weighted average, and
    ONE optimizer/EMA update is applied per call (state.step counts optimizer
    steps, as in Lightning).

    Weighting: each microbatch contributes with the model's loss-normalization
    mass (`model.loss_accum_weight`, e.g. mask.sum() for the sum/mask.sum()
    flow-matching losses; batch size otherwise), so for mask-normalized losses
    the accumulated gradient equals the single big-batch gradient exactly —
    stricter than Lightning's equal-weight average over microbatches
    (reference surface: pytorch_lightning Trainer(accumulate_grad_batches=A),
    available to every reference config's trainer group). Per-microbatch
    randomness comes from fold_in(step_rng, microbatch_index).
    """
    weight_fn = getattr(model, "loss_accum_weight", None)

    def step_fn(state: TrainState, rng: jax.Array, xs, ms, cs):
        rng = jax.random.fold_in(rng, state.step)
        n_micro = xs.shape[0]

        def micro(carry, inp):
            stats, gsum, wsum, lsum = carry
            i, x, m, c = inp
            rng_i = jax.random.fold_in(rng, i)

            def loss_fn(params):
                variables = {"params": params}
                if stats:
                    variables["norm_stats"] = stats
                extra = {} if vf_fn is None else {"vf_fn": vf_fn}
                return model.loss(
                    variables, rng_i, x, mask=m, cond=c, train=True, **extra
                )

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            w = (
                weight_fn(x, m)
                if weight_fn is not None
                else jnp.asarray(x.shape[0], jnp.float32)
            )
            w = jnp.asarray(w, jnp.float32)
            gsum = jax.tree_util.tree_map(
                lambda a, g: a + w * g.astype(a.dtype), gsum, grads
            )
            return (
                new_stats.get("norm_stats", stats),
                gsum,
                wsum + w,
                lsum + w * loss,
            ), None

        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        carry0 = (state.norm_stats, zero_g, jnp.zeros((), jnp.float32), jnp.zeros(()))
        (new_norm_stats, gsum, wsum, lsum), _ = jax.lax.scan(
            micro, carry0, (jnp.arange(n_micro), xs, ms, cs)
        )
        grads = jax.tree_util.tree_map(lambda a: (a / wsum), gsum)
        # cast the averaged f32 accumulator back to each param's dtype so the
        # optimizer sees the dtypes it was init'd with
        grads = jax.tree_util.tree_map(
            lambda g, p: g.astype(p.dtype), grads, state.params
        )
        loss = lsum / wsum
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(
            state.ema_params,
            new_params,
            state.step,
            decay=ema_decay,
            every_n=ema_every_n,
            start_step=ema_start_step,
        )
        new_state = state.replace(
            params=new_params,
            norm_stats=new_norm_stats,
            ema_params=new_ema,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, loss

    return step_fn


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
    mesh=None,
    sp: bool = False,
    accum: int = 1,
) -> Callable:
    """Build `train_step(state, rng, x, mask, cond) -> (state, loss)` (jitted).

    With `sp=True` the particle axis of x/mask additionally shards over the
    'model' mesh axis (sequence parallelism; place batches with
    shard_batch_sp) — XLA emits the psum for set-axis reductions.

    With `accum=A > 1` the data args instead carry a leading microbatch axis
    (A, B, ...) and the step applies ONE weighted-average optimizer update
    (see _build_accum_step_fn)."""
    if accum > 1:
        step_fn = _build_accum_step_fn(
            model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
            ema_start_step=ema_start_step,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = replicated(mesh)
            data = NamedSharding(mesh, P(None, "data"))
            seq = NamedSharding(mesh, P(None, "data", "model")) if sp else data
            return jax.jit(
                step_fn,
                in_shardings=(None, repl, seq, seq, data),
                out_shardings=(None, repl),
                donate_argnums=(0,),
            )
        return jax.jit(step_fn, donate_argnums=(0,))

    step_fn = _build_step_fn(
        model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
        ema_start_step=ema_start_step,
    )

    if mesh is not None:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        seq = sp_sharding(mesh) if sp else data
        # the state's sharding is inherited from the input arrays (None):
        # replicated for pure DP, FSDP-placed via parallel/fsdp.shard_state_fsdp,
        # or TP-annotated via parallel/tp.shard_state — XLA's SPMD partitioner
        # propagates any of them through the whole step
        return jax.jit(
            step_fn,
            in_shardings=(None, repl, seq, seq, data),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_train_epoch(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
    mesh=None,
    accum: int = 1,
) -> Callable:
    """Build `train_epoch(state, rng, xs, ms, cs) -> (state, losses)`: a
    whole epoch of K steps as ONE jitted lax.scan over stacked batches
    (K, B, ...). On environments where every dispatch pays a large fixed
    relay latency (axon: ~20-30 ms/call) this amortizes it over the epoch —
    the same trick the scan-batched sampler uses (bench.py). The per-step
    rng still varies via fold_in(rng, state.step) inside the step body.

    With `accum=A > 1` the stacked batches are (K, A, B, ...) and each scan
    iteration is one accumulated optimizer step over A microbatches."""
    if accum > 1:
        step_fn = _build_accum_step_fn(
            model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
            ema_start_step=ema_start_step,
        )
    else:
        step_fn = _build_step_fn(
            model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
            ema_start_step=ema_start_step,
        )

    def epoch_fn(state: TrainState, rng: jax.Array, xs, ms, cs):
        def body(st, batch):
            x, m, c = batch
            st, loss = step_fn(st, rng, x, m, c)
            return st, loss

        state, losses = jax.lax.scan(body, state, (xs, ms, cs))
        return state, losses

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = replicated(mesh)
        stacked = (
            NamedSharding(mesh, P(None, None, "data"))
            if accum > 1
            else stacked_sharding(mesh)
        )
        return jax.jit(
            epoch_fn,
            in_shardings=(None, repl, stacked, stacked, stacked),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )
    return jax.jit(epoch_fn, donate_argnums=(0,))


def make_train_superepoch(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.999,
    ema_every_n: int = 1,
    ema_start_step: int = 0,
    mesh=None,
    accum: int = 1,
) -> Callable:
    """Build `superepoch(state, rng, x, mask, cond, perms) -> (state, losses)`:
    E whole epochs as ONE jitted scan-of-scans.

    With `accum=A > 1` perms are (E, K_opt, A, B) and each inner-scan
    iteration is one accumulated optimizer step over A gathered microbatches.

    x/mask/cond are the device-cached full train split (N, ...); perms is
    (E, K, B) int32 — each row an epoch's host-generated shuffle (the SAME
    np.random.default_rng(seed + epoch) permutation the per-epoch paths use,
    so fused and sequential training are bit-identical). Each outer-scan
    iteration gathers its epoch's shuffled batches on device and runs the
    make_train_epoch inner scan; per-step rng still varies via
    fold_in(rng, state.step).

    Motivation (measured, docs/RESULTS.md round 3): each epoch dispatched
    from Python pays a host sync (the per-epoch train_loss readback) plus
    ~30 ms relay latency on tunneled hosts; at the flagship's 0.25 s/epoch
    that overhead is the majority. Fusing E epochs amortizes it E-fold.
    Returns losses (E, K)."""
    if accum > 1:
        step_fn = _build_accum_step_fn(
            model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
            ema_start_step=ema_start_step,
        )
    else:
        step_fn = _build_step_fn(
            model, optimizer, ema_decay=ema_decay, ema_every_n=ema_every_n,
            ema_start_step=ema_start_step,
        )

    def super_fn(state: TrainState, rng: jax.Array, x, mask, cond, perms):
        def epoch_body(st, perm):  # perm (K, B), or (K_opt, A, B) with accum
            flat = perm.reshape(-1)

            def take(a):
                if a is None:
                    return None
                g = jnp.take(a, flat, axis=0)
                return g.reshape(perm.shape + a.shape[1:])

            def body(s, batch):
                xb, mb, cb = batch
                return step_fn(s, rng, xb, mb, cb)

            st, losses = jax.lax.scan(body, st, (take(x), take(mask), take(cond)))
            return st, losses

        state, losses = jax.lax.scan(epoch_body, state, perms)
        return state, losses  # (E, K)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = replicated(mesh)
        data = batch_sharding(mesh)
        perm_sh = (
            NamedSharding(mesh, P(None, None, None, "data"))
            if accum > 1
            else perm_sharding(mesh)
        )
        return jax.jit(
            super_fn,
            in_shardings=(None, repl, data, data, data, perm_sh),
            out_shardings=(None, repl),
            donate_argnums=(0,),
        )
    return jax.jit(super_fn, donate_argnums=(0,))


def make_eval_step(model, mesh=None) -> Callable:
    """Build `eval_step(state, rng, x, mask, cond) -> loss` on current params.

    Validation uses a fixed rng seed upstream (reference fixes torch seed 9999
    each val epoch, flow_matching_module.py:555-557)."""

    def step_fn(state: TrainState, rng: jax.Array, x, mask, cond):
        loss, _ = model.loss(state.variables(), rng, x, mask=mask, cond=cond, train=False)
        return loss

    if mesh is not None:
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            step_fn, in_shardings=(None, repl, data, data, data), out_shardings=repl
        )
    return jax.jit(step_fn)
