"""Training driver: epochs, validation, eval callbacks, checkpoints, logging.

The TPU-native counterpart of the reference's Lightning Trainer usage
(particle_fm/train.py:42-121): one jitted train step (parallel/train.py) runs
over shuffled fixed-shape batches; validation uses a fixed seed (the
reference fixes torch seed 9999 per val epoch, flow_matching_module.py:555);
eval callbacks fire on an epoch schedule and their metrics drive
metric-keyed checkpoints; everything logs to CSV + stdout.
"""

from __future__ import annotations


import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_batch_sp,
)
from particle_fm_tpu.parallel.train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_epoch,
    make_train_step,
    make_train_superepoch,
)
from particle_fm_tpu.training.checkpoint import CheckpointManager

VAL_SEED = 9999  # parity: fixed validation seed


@dataclass
class Trainer:
    model: object
    datamodule: object
    optimizer: object
    max_epochs: int = 10
    ema_decay: float = 0.999
    ema_every_n: int = 1
    ema_start_step: int = 0
    check_val_every_n_epoch: int = 1
    callbacks: Sequence[Callable] = field(default_factory=list)
    ckpt_dir: Optional[str] = None
    ckpt_monitors: dict = field(default_factory=lambda: {"val_loss": "min"})
    ckpt_top_k: int = 1
    # write checkpoints asynchronously: the state is snapshotted on device
    # and the D2H transfer + orbax write run on a background thread, so the
    # epoch loop never blocks on checkpoint I/O (flushed at every read path
    # and at fit end — see training/checkpoint.py)
    ckpt_async: bool = True
    save_last_every_n_epoch: int = 10
    log_dir: Optional[str] = None
    logger_backends: tuple = ("jsonl",)
    logger_kwargs: dict = field(default_factory=dict)  # per-backend init kwargs
    loss_per_jettype: bool = False
    loss_per_jettype_every_n: int = 20
    # upload fixed-shape train data to the device once and shuffle there —
    # avoids a host->device transfer per step (which dominates step time on
    # tunneled TPU hosts). Auto: on when the datamodule allows it and the
    # split is < device_cache_limit_mb.
    cache_data_on_device: Optional[bool] = None
    device_cache_limit_mb: int = 2048
    # streaming path only (split larger than the device cache): how many
    # placed batches a background thread keeps in flight, overlapping host
    # batch prep + H2D transfer with device compute (the reference's
    # DataLoader num_workers/pin_memory role). 0 disables.
    prefetch_batches: int = 2
    # run each epoch as ONE jitted lax.scan over its batches (requires the
    # device cache): amortizes the fixed per-dispatch relay latency
    # (~20-30 ms on tunneled hosts) over the whole epoch
    scan_epochs: bool = True
    # fuse groups of N epochs into ONE jitted scan-of-scans (requires
    # scan_epochs + the device cache): shuffles happen on device per fused
    # epoch (same host-seeded permutations, bit-identical to sequential), and
    # the per-epoch host sync + relay dispatch is paid once per group —
    # measured as the MAJORITY of flagship epoch wall time (RESULTS.md
    # round 3). Validation/callbacks/checkpoints/logging run at group
    # boundaries only; groups align to multiples of fuse_epochs, so choose
    # check_val_every_n_epoch (and callback cadences) as multiples of it to
    # keep their schedules exact. 1 = off (reference-like per-epoch loop).
    fuse_epochs: int = 1
    # gradient accumulation: one optimizer step per N microbatches of
    # datamodule.batch_size (effective batch = N x batch_size with
    # single-microbatch activation memory). Microbatch gradients are averaged
    # weighted by the model's loss-normalization mass (mask.sum() for the
    # masked FM losses), so the update equals the big-batch gradient exactly
    # — stricter than Lightning's accumulate_grad_batches equal-weight mean.
    # Trailing microbatches that don't fill a group are dropped. LR schedules
    # built per optimizer step should use steps_per_epoch // N (train.py
    # does). Not supported with strategy=pp/dp_pp (the pipeline microbatches
    # internally).
    accumulate_grad_batches: int = 1
    seed: int = 0
    verbose: bool = True
    mesh: object = None
    # parallelism strategy (beyond-reference; the reference's only mode is
    # DDP == "dp"):
    #   dp     data parallel, params replicated (default)
    #   fsdp   ZeRO-3: params/EMA/Adam moments sharded over 'data'
    #          (parallel/fsdp.py), weights all-gathered JIT by GSPMD
    #   dp_tp  Megatron-style tensor parallelism on the EPiC local MLPs over
    #          a 'model' axis of size model_axis_size (parallel/tp.py)
    #   sp     sequence parallelism: the particle axis sharded over 'model'
    #   pp     GPipe pipeline parallelism over the droid transformer layer
    #          stack: model_axis_size stages on a ('pipe',) mesh, activations
    #          rotated via ppermute (parallel/pp.py); droid_fulltransformer
    #          only, num_layers % stages == 0, batch % pp_microbatches == 0
    #   dp_pp  dp x pp: device_count/model_axis_size independent pipelines
    #          on a ('data','pipe') mesh, batch sharded over 'data',
    #          gradient all-reduce across replicas via GSPMD
    #   dp_ep  expert parallelism: the stacked MoE expert params (models with
    #          te_config.moe_config, nets/moe.py) shard their expert axis
    #          over a 'model' axis of size model_axis_size (parallel/tp.py::
    #          moe_ep_rules); GSPMD turns dispatch/combine into collectives
    strategy: str = "dp"
    model_axis_size: int = 2
    pp_microbatches: int = 8

    # populated at runtime
    state: TrainState = None
    epoch: int = 0
    metrics_history: list = field(default_factory=list)
    last_metrics: dict = field(default_factory=dict)
    # callbacks may set this (early stopping / trial pruning); the epoch loop
    # breaks after checkpointing
    should_stop: bool = False

    def __post_init__(self):
        # multi-host: only rank 0 writes checkpoints/logs/stdout (the jitted
        # SPMD step itself runs identically on every process)
        from particle_fm_tpu.parallel.mesh import is_rank_zero

        self._rank0 = is_rank_zero()
        if not self._rank0:
            # ckpt_dir is NOT nulled: orbax saves are collective — every
            # process must make the same save/restore calls (orbax barriers
            # internally and gates actual writes to the primary host /
            # shard owners). Deterministic metrics keep the save decisions
            # identical across hosts. Logs/stdout stay rank-0-only.
            self.log_dir = None
            self.verbose = False
        if self.strategy not in ("dp", "fsdp", "dp_tp", "sp", "pp", "dp_pp", "dp_ep"):
            raise ValueError(
                f"unknown trainer.strategy {self.strategy!r} "
                "(expected dp | fsdp | dp_tp | sp | pp | dp_pp | dp_ep)"
            )
        if self.accumulate_grad_batches < 1:
            raise ValueError("trainer.accumulate_grad_batches must be >= 1")
        if self.accumulate_grad_batches > 1 and self.strategy in ("pp", "dp_pp"):
            raise ValueError(
                "accumulate_grad_batches is not supported with strategy=pp/dp_pp "
                "(the pipeline already microbatches internally; raise "
                "pp_microbatches instead)"
            )
        if self.mesh is None:
            if self.strategy in ("pp", "dp_pp"):
                from particle_fm_tpu.parallel.pp import make_pipe_mesh

                stages = self.model_axis_size
                if self.strategy == "dp_pp":
                    n = jax.device_count()
                    if n % stages:
                        raise ValueError(
                            f"strategy=dp_pp needs device_count ({n}) "
                            f"divisible by model_axis_size ({stages})"
                        )
                    # D independent pipelines, batch sharded over 'data'
                    self.mesh = make_pipe_mesh(stages=stages, data=n // stages)
                else:
                    # size-1 'data' axis keeps the trainer's batch/cache
                    # helpers working unchanged (batches replicate across
                    # the stages)
                    self.mesh = make_pipe_mesh(stages=stages, with_data_axis=True)
            elif self.strategy in ("dp_tp", "sp", "dp_ep"):
                n = jax.device_count()
                tp = self.model_axis_size
                if n % tp:
                    raise ValueError(
                        f"strategy={self.strategy} needs device_count ({n}) "
                        f"divisible by model_axis_size ({tp})"
                    )
                self.mesh = make_mesh(data=n // tp, model=tp)
            else:
                self.mesh = make_mesh()
        if self.strategy == "sp" and self.scan_epochs:
            # the scanned-epoch path places batches with stacked (data-only)
            # shardings; run SP through the per-step path instead
            self.scan_epochs = False
        if self.strategy in ("pp", "dp_pp") and self.scan_epochs:
            # PP runs through the per-step path (the scanned-epoch builder
            # has no vf_fn hook); the pipeline's own M+S-1-tick scan already
            # amortizes dispatch overhead
            self.scan_epochs = False
        # multi-host: callbacks still COMPUTE on every process (deterministic
        # seeds keep metrics — and thus early-stopping control flow —
        # identical across hosts) but only rank 0 writes artifact files;
        # callbacks consult this instead of log_dir to avoid the "." fallback
        # racing N hosts into the same cwd paths
        self.artifacts_dir = (self.log_dir or ".") if self._rank0 else None
        if self.strategy in ("pp", "dp_pp"):
            from particle_fm_tpu.parallel.pp import make_train_step_pp

            self.train_step = make_train_step_pp(
                self.model,
                self.optimizer,
                self.mesh,
                microbatches=self.pp_microbatches,
                ema_decay=self.ema_decay,
                ema_every_n=self.ema_every_n,
                ema_start_step=self.ema_start_step,
            )
            # eval/val runs the unpipelined loss — identical numerics, and
            # the size-1 data axis means batches are effectively replicated
            self.eval_step = make_eval_step(self.model, mesh=self.mesh)
        else:
            self.train_step = make_train_step(
                self.model,
                self.optimizer,
                ema_decay=self.ema_decay,
                ema_every_n=self.ema_every_n,
                ema_start_step=self.ema_start_step,
                mesh=self.mesh,
                sp=self.strategy == "sp",
                accum=self.accumulate_grad_batches,
            )
            self.eval_step = make_eval_step(self.model, mesh=self.mesh)
        self.train_epoch = (
            make_train_epoch(
                self.model,
                self.optimizer,
                ema_decay=self.ema_decay,
                ema_every_n=self.ema_every_n,
                ema_start_step=self.ema_start_step,
                mesh=self.mesh,
                accum=self.accumulate_grad_batches,
            )
            if self.scan_epochs
            else None
        )
        self.train_superepoch = (
            make_train_superepoch(
                self.model,
                self.optimizer,
                ema_decay=self.ema_decay,
                ema_every_n=self.ema_every_n,
                ema_start_step=self.ema_start_step,
                mesh=self.mesh,
                accum=self.accumulate_grad_batches,
            )
            if (self.scan_epochs and self.fuse_epochs > 1)
            else None
        )
        self.ckpt = (
            CheckpointManager(
                self.ckpt_dir,
                self.ckpt_monitors,
                self.ckpt_top_k,
                async_save=self.ckpt_async,
            )
            if self.ckpt_dir
            else None
        )
        if self.log_dir:
            os.makedirs(self.log_dir, exist_ok=True)
            from particle_fm_tpu.training.loggers import MultiLogger

            self.logger = MultiLogger(
                self.log_dir,
                backends=tuple(self.logger_backends),
                **(self.logger_kwargs or {}),
            )
        else:
            self.logger = None

    # ------------------------------------------------------------- helpers
    def _log(self, metrics: dict) -> None:
        metrics = {"epoch": self.epoch, **metrics}
        self.metrics_history.append(metrics)
        if self.logger is not None:
            self.logger.log_metrics(metrics, step=self.epoch)
        if self.verbose:
            msg = " ".join(
                f"{k}={v:.5g}" if isinstance(v, (int, float, np.floating)) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(f"[trainer] {msg}", flush=True)

    def _shard(self, batch, seq: bool | None = None):
        """Place a host batch on the mesh. `seq` controls the SP particle-axis
        sharding — True for training batches (the SP train step's committed
        in_shardings), False for eval batches (eval_step is data-sharded)."""
        if seq is None:
            seq = self.strategy == "sp"
        x, mask, cond = batch
        batch = (
            jnp.asarray(x),
            jnp.asarray(mask) if mask is not None else None,
            jnp.asarray(cond) if cond is not None else None,
        )
        if seq:
            # x/mask shard (data, model) on (batch, particle); cond is (B, C)
            x, mask, cond = batch
            xs, ms = shard_batch_sp((x, mask), self.mesh)
            (cs,) = shard_batch((cond,), self.mesh)
            return xs, ms, cs
        return shard_batch(batch, self.mesh)

    def _place_state(self, state):
        """Place the TrainState on the mesh per the strategy: replicated
        (dp/sp), ZeRO-3-sharded (fsdp), or TP-annotated (dp_tp). The jitted
        steps pass state shardings through (in_shardings=None), so the
        placement chosen here is what GSPMD propagates end to end."""
        if self.strategy == "fsdp":
            from particle_fm_tpu.parallel.fsdp import shard_state_fsdp

            return shard_state_fsdp(state, self.mesh)
        if self.strategy == "dp_tp":
            from particle_fm_tpu.parallel.tp import epic_tp_rules, shard_state

            return shard_state(state, self.mesh, epic_tp_rules())
        if self.strategy == "dp_ep":
            from particle_fm_tpu.parallel.tp import moe_ep_rules, shard_state

            return shard_state(state, self.mesh, moe_ep_rules())
        return replicate(state, self.mesh)

    # ---------------------------------------------------------------- fit
    def fit(
        self,
        resume_from: str | None = None,
        load_weights_from: str | None = None,
        initial_state: TrainState | None = None,
    ) -> TrainState:
        state = initial_state or create_train_state(
            self.model, jax.random.PRNGKey(self.seed), self.optimizer
        )
        if load_weights_from:
            from particle_fm_tpu.training.checkpoint import (
                load_weights_from as _load_weights,
            )

            state = _load_weights(load_weights_from, state)
            if self.verbose:
                print(f"[trainer] loaded pretrained weights from {load_weights_from}")
        if resume_from:
            if self.ckpt is None:
                raise ValueError("resume_from requires ckpt_dir")
            state = self.ckpt.restore(resume_from, state)
            if self.verbose:
                print(f"[trainer] resumed from {resume_from} at step {int(state.step)}")
        state = self._place_state(state)
        self.state = state
        self.should_stop = False  # a fresh fit() clears any earlier stop request
        rng = jax.random.PRNGKey(self.seed + 1)
        dev_data = self._maybe_cache_train_data()

        # state.step counts OPTIMIZER steps (steps_per_epoch microbatches
        # make steps_per_epoch // accumulate_grad_batches of them)
        opt_steps_per_epoch = max(
            self.datamodule.steps_per_epoch // self.accumulate_grad_batches, 1
        )
        start_epoch = int(np.asarray(state.step)) // opt_steps_per_epoch
        epoch = start_epoch
        while epoch < self.max_epochs:
            t0 = time.perf_counter()
            # fused-epoch groups align to multiples of fuse_epochs (a resumed
            # mid-group start runs a short first group), so periodic work with
            # cadences that are multiples of fuse_epochs keeps its schedule
            group = 1
            if self.train_superepoch is not None and dev_data is not None:
                group = min(
                    self.fuse_epochs - (epoch % self.fuse_epochs),
                    self.max_epochs - epoch,
                )
            if group > 1:
                perms = self._group_perms(dev_data, epoch, group)
                if perms is None:
                    group = 1  # split smaller than one batch: per-step path
                else:
                    x_all, m_all, c_all = dev_data
                    self.state, losses_arr = self.train_superepoch(
                        self.state, rng, x_all, m_all, c_all, perms
                    )
                    # report the group's LAST epoch (the per-epoch value the
                    # sequential loop would log at this epoch index)
                    train_loss = float(np.mean(np.asarray(losses_arr)[-1]))
                    del perms
            if group == 1:
                stacked = (
                    self._stack_epoch(dev_data, epoch)
                    if (self.train_epoch is not None and dev_data is not None)
                    else None
                )
                if stacked is not None:
                    self.state, losses_arr = self.train_epoch(self.state, rng, *stacked)
                    train_loss = float(np.mean(np.asarray(losses_arr)))
                    # release the epoch's stacked shuffle copy before validation/
                    # eval callbacks run (it is a second full-dataset HBM buffer)
                    del stacked
                else:
                    losses = []
                    batches = (
                        self._epoch_accum_batches(dev_data, epoch)
                        if self.accumulate_grad_batches > 1
                        else self._epoch_batches(dev_data, epoch)
                    )
                    for batch in batches:
                        self.state, loss = self.train_step(self.state, rng, *batch)
                        losses.append(loss)
                    train_loss = float(np.mean([np.asarray(l) for l in losses])) if losses else np.nan
            epoch = epoch + group - 1  # group's last epoch: all per-epoch work below
            self.epoch = epoch
            metrics = {"train_loss": train_loss, "epoch_time": time.perf_counter() - t0}

            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                metrics["val_loss"] = self.validate()

            # per-jet-type validation loss (reference training_step:526-552)
            if self.loss_per_jettype and epoch % self.loss_per_jettype_every_n == 0:
                metrics.update(self._per_jettype_losses())

            # eval callbacks may add metrics (e.g. w1m_mean) and drive ckpts;
            # stopping/pruning callbacks read this epoch's metrics here
            self.last_metrics = metrics
            for cb in self.callbacks:
                out = cb(self)
                if out:
                    metrics.update(out)

            self._log(metrics)

            if self.ckpt is not None:
                for monitor in self.ckpt_monitors:
                    if monitor in metrics:
                        self.ckpt.save_metric(
                            self.state, monitor, float(metrics[monitor]), int(np.asarray(self.state.step))
                        )
                if (epoch + 1) % self.save_last_every_n_epoch == 0 or epoch == self.max_epochs - 1:
                    self.ckpt.save_last(self.state)
            if self.should_stop:
                if self.ckpt is not None:
                    self.ckpt.save_last(self.state)
                if self.verbose:
                    print(f"[trainer] stop requested at epoch {epoch}")
                break
            epoch += 1
        if self.ckpt is not None:
            self.ckpt.flush()  # join queued async checkpoint writes
        return self.state

    def _maybe_cache_train_data(self):
        """Upload the train split once (batch-sharded); None = host batching."""
        dm = self.datamodule
        split = getattr(dm, "train", None)
        if split is None or not getattr(dm, "device_cacheable", False):
            return None
        nbytes = split.x.nbytes + (split.mask.nbytes if split.mask is not None else 0)
        enabled = (
            self.cache_data_on_device
            if self.cache_data_on_device is not None
            else nbytes < self.device_cache_limit_mb * 2**20
        )
        if not enabled:
            return None
        # the stored array must shard evenly over the data axis; trim the
        # ragged tail (< n_dev samples; batching drops a partial batch anyway)
        n_dev = self.mesh.shape["data"]
        n2 = len(split.x) - (len(split.x) % n_dev)
        return self._shard(
            (
                split.x[:n2],
                split.mask[:n2] if split.mask is not None else None,
                split.cond[:n2] if split.cond is not None else None,
            )
        )

    def _epoch_perm(self, n: int, n_use: int, epoch: int):
        """The epoch's shuffle as a sharded device index array. ONE shared
        definition: the scanned-epoch and per-step paths must shuffle
        bit-identically or scan-vs-loop numeric parity silently breaks."""
        perm = np.random.default_rng(self.seed + epoch).permutation(n)[:n_use]
        return shard_batch((jnp.asarray(perm),), self.mesh)[0]

    def _group_perms(self, dev_data, epoch: int, group: int):
        """Stacked (E, K, B) device permutations for a fused-epoch group —
        built with the SAME per-epoch host RNG as _epoch_perm, so fused and
        sequential training shuffle bit-identically. None when the split has
        no full batch (the per-step fallback handles that)."""
        bs = self.datamodule.batch_size
        A = self.accumulate_grad_batches
        n = dev_data[0].shape[0]
        n_use, k = self._usable_batches(n, bs, A)
        if n_use == 0:
            return None
        row_shape = (k // A, A, bs) if A > 1 else (k, bs)
        perms = np.stack(
            [
                np.random.default_rng(self.seed + e)
                .permutation(n)[:n_use]
                .reshape(row_shape)
                for e in range(epoch, epoch + group)
            ]
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        from particle_fm_tpu.parallel.mesh import perm_sharding

        sh = (
            NamedSharding(self.mesh, P(None, None, None, "data"))
            if A > 1
            else perm_sharding(self.mesh)
        )
        return jax.device_put(jnp.asarray(perms), sh)

    def _usable_batches(self, n: int, bs: int, accum: int) -> tuple[int, int]:
        """(n_use, k): samples/microbatches per epoch after dropping the
        ragged tail — and, with accumulation, microbatches beyond the last
        full optimizer-step group. Raises when the split can't fill one
        group (silent zero-step epochs would train nothing)."""
        n_use = n - (n % bs)
        k = n_use // bs
        if accum > 1:
            k -= k % accum
            if k == 0 and n_use > 0:
                raise ValueError(
                    f"accumulate_grad_batches={accum} needs at least {accum} "
                    f"full batches per epoch; train split has {n_use // bs}"
                )
        return k * bs, k

    def _stack_epoch(self, dev_data, epoch: int):
        """The epoch's shuffled batches as stacked (K, B, ...) device arrays
        for the scanned epoch. Returns None only when the split has no full
        batch at all (the per-step loop's short-batch fallback handles that);
        otherwise the `n % batch_size` remainder is dropped, exactly like the
        per-step device path."""
        bs = self.datamodule.batch_size
        A = self.accumulate_grad_batches
        x, mask, cond = dev_data
        n = x.shape[0]
        n_use, k = self._usable_batches(n, bs, A)
        if n_use == 0:
            return None
        perm_dev = self._epoch_perm(n, n_use, epoch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from particle_fm_tpu.parallel.mesh import stacked_sharding

        stacked_sh = (
            NamedSharding(self.mesh, P(None, None, "data"))
            if A > 1
            else stacked_sharding(self.mesh)
        )
        row_shape = (k // A, A, bs) if A > 1 else (k, bs)

        def stack(a):
            if a is None:
                return None
            g = jnp.take(a, perm_dev, axis=0).reshape(row_shape + a.shape[1:])
            return jax.device_put(g, stacked_sh)

        return stack(x), stack(mask), stack(cond)

    def _epoch_batches(self, dev_data, epoch: int):
        """Sharded device batches for one epoch. With the device cache, the
        epoch's shuffle is one on-device gather; only the (tiny) permutation
        crosses host->device."""
        bs = self.datamodule.batch_size
        if dev_data is None:
            # streaming path (split larger than the device cache): overlap
            # host batch prep + H2D with device compute via a worker thread
            from particle_fm_tpu.data.prefetch import prefetch_to_device

            yield from prefetch_to_device(
                self.datamodule.train_batches(seed=self.seed + epoch),
                self._shard,
                depth=self.prefetch_batches,
            )
            return
        x, mask, cond = dev_data
        n = x.shape[0]
        n_use = n - (n % bs)
        if n_use == 0 and n > 0:
            # split smaller than batch_size: one short batch beats silently
            # yielding nothing (NaN epoch loss); round down to the mesh size
            bs = max(n - (n % self.mesh.shape["data"]), self.mesh.shape["data"])
            n_use = min(bs, n)
        perm_dev = self._epoch_perm(n, n_use, epoch)
        xs = jnp.take(x, perm_dev, axis=0)
        ms = jnp.take(mask, perm_dev, axis=0) if mask is not None else None
        cs = jnp.take(cond, perm_dev, axis=0) if cond is not None else None
        from particle_fm_tpu.parallel.mesh import batch_sharding, sp_sharding

        sh = batch_sharding(self.mesh)
        # SP: x/mask carry the (batch, particle) sharding the train step's
        # in_shardings were compiled with; cond stays batch-sharded
        sh_seq = sp_sharding(self.mesh) if self.strategy == "sp" else sh
        for i in range(n_use // bs):
            sl = slice(i * bs, (i + 1) * bs)
            # slicing a sharded axis produces a resharded array; re-place it
            # (device-to-device, no host round-trip) so jit's in_shardings match
            yield tuple(
                jax.device_put(a[sl], s) if a is not None else None
                for a, s in ((xs, sh_seq), (ms, sh_seq), (cs, sh))
            )

    def _epoch_accum_batches(self, dev_data, epoch: int):
        """Stacked (A, B, ...) microbatch groups for one epoch when
        accumulate_grad_batches=A > 1 (per-step path): each yielded group is
        one accumulated optimizer step. Trailing microbatches that don't fill
        a group are dropped (see _usable_batches)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        A = self.accumulate_grad_batches
        bs = self.datamodule.batch_size
        sh = NamedSharding(self.mesh, P(None, "data"))
        sh_seq = (
            NamedSharding(self.mesh, P(None, "data", "model"))
            if self.strategy == "sp"
            else sh
        )

        if dev_data is None:
            # host batching: buffer A raw batches, stack on host, one
            # placement per group — prefetched like the unaccumulated path
            from particle_fm_tpu.data.prefetch import prefetch_to_device

            def groups():
                buf = []
                for batch in self.datamodule.train_batches(seed=self.seed + epoch):
                    buf.append(batch)
                    if len(buf) == A:
                        yield buf
                        buf = []

            def place(buf):
                return tuple(
                    jax.device_put(np.stack([np.asarray(b[j]) for b in buf]), s)
                    if buf[0][j] is not None
                    else None
                    for j, s in ((0, sh_seq), (1, sh_seq), (2, sh))
                )

            yield from prefetch_to_device(groups(), place, depth=self.prefetch_batches)
            return

        x, mask, cond = dev_data
        n = x.shape[0]
        n_use, k = self._usable_batches(n, bs, A)
        if n_use == 0:
            return
        perm_dev = self._epoch_perm(n, n_use, epoch)
        xs = jnp.take(x, perm_dev, axis=0)
        ms = jnp.take(mask, perm_dev, axis=0) if mask is not None else None
        cs = jnp.take(cond, perm_dev, axis=0) if cond is not None else None
        for i in range(k // A):
            sl = slice(i * A * bs, (i + 1) * A * bs)
            yield tuple(
                jax.device_put(a[sl].reshape((A, bs) + a.shape[1:]), s)
                if a is not None
                else None
                for a, s in ((xs, sh_seq), (ms, sh_seq), (cs, sh))
            )

    def _per_jettype_losses(self) -> dict:
        """Validation loss per jet type, selected via the one-hot conditioning
        columns named jet_type_label_* (JetClass convention)."""
        dm = self.datamodule
        names = getattr(dm, "names_conditioning", None)
        split = dm.val
        if not names or split.cond is None:
            return {}
        rng = jax.random.PRNGKey(VAL_SEED)
        n_dev = self.mesh.shape["data"]
        out = {}
        for i, name in enumerate(names):
            if not str(name).startswith("jet_type_label_"):
                continue
            sel = np.where(split.cond[:, i] == 1)[0][:10_000]
            sel = sel[: len(sel) - (len(sel) % n_dev)]
            if len(sel) == 0:
                continue
            batch = (
                split.x[sel],
                split.mask[sel] if split.mask is not None else None,
                split.cond[sel],
            )
            loss = self.eval_step(self.state, rng, *self._shard(batch, seq=False))
            out[f"val_loss_{str(name).replace('jet_type_label_', '')}"] = float(
                np.asarray(loss)
            )
        return out

    # ------------------------------------------------------------ validate
    def validate(self) -> float:
        rng = jax.random.PRNGKey(VAL_SEED)
        losses = []
        n_dev = self.mesh.shape["data"]
        for batch in self.datamodule.val_batches():
            ragged = batch[0].shape[0] % n_dev
            if ragged:
                # trim to an even shard; drop the batch only if it's tiny
                keep = batch[0].shape[0] - ragged
                if keep == 0:
                    continue
                batch = tuple(b[:keep] if b is not None else None for b in batch)
            losses.append(
                np.asarray(self.eval_step(self.state, rng, *self._shard(batch, seq=False)))
            )
        return float(np.mean(losses)) if losses else np.nan

    # ---------------------------------------------------------------- test
    def test(self, ckpt: str = "best", monitor: str | None = None) -> dict:
        """Run the final-eval callbacks on the best/last checkpoint."""
        if self.ckpt is not None:
            path = (
                self.ckpt.best_path(monitor or next(iter(self.ckpt_monitors)))
                if ckpt == "best"
                else self.ckpt.last_path()
            )
            if path is not None:
                self.state = self.ckpt.restore(path, self.state)
        results = {}
        self.testing = True  # scheduled callbacks bypass their epoch gates
        try:
            for cb in self.callbacks:
                if getattr(cb, "on_test", False):
                    out = cb(self)
                    if out:
                        results.update(out)
        finally:
            self.testing = False
        return results
