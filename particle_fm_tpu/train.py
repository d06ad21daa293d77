"""Training entry point.

    python -m particle_fm_tpu.train experiment=jetnet/fm_tops30_cond [key=value ...]

Parity with the reference's particle_fm/train.py:42-121: compose config ->
snapshot the resolved config into the run dir -> instantiate datamodule /
model / callbacks -> fit -> optional test on the best checkpoint -> return
metrics. TPU specifics: builds the device mesh up front and converts
epoch-denominated LR schedules using the datamodule's steps_per_epoch.
"""

from __future__ import annotations

import os
import sys
import time

from particle_fm_tpu.config.core import compose, instantiate, save_config
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.lr_schedules import (
    cosine_warmup_schedule,
    onecycle_cooldown_schedule,
    warmup_to_constant_schedule,
)
from particle_fm_tpu.training.trainer import Trainer

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def build_callbacks(callbacks_cfg: dict | None) -> list:
    """Instantiate callback entries; entries without a `_target_` (e.g. an
    experiment overlay patching a callback after `callbacks=none` removed the
    group) are skipped with a warning instead of crashing the run."""
    out = []
    for name, cb_cfg in (callbacks_cfg or {}).items():
        if not isinstance(cb_cfg, dict) or "_target_" not in cb_cfg:
            print(f"[train] skipping callback {name!r}: no _target_ (group overridden?)")
            continue
        out.append(instantiate(cb_cfg))
    return out


def build_lr(optimizer_cfg: dict, scheduler_cfg: dict | None, steps_per_epoch: int):
    lr = optimizer_cfg.get("lr", 1e-3)
    if not scheduler_cfg:
        return lr
    name = scheduler_cfg.get("name")
    if name == "cosine_warmup":
        return cosine_warmup_schedule(
            lr, scheduler_cfg["warmup"], scheduler_cfg["max_iters"], steps_per_epoch
        )
    if name == "warmup_to_constant":
        return warmup_to_constant_schedule(
            lr, scheduler_cfg.get("num_steps", 100), steps_per_epoch
        )
    if name == "onecycle_cooldown":
        kw = {k: v for k, v in scheduler_cfg.items() if k != "name"}
        return onecycle_cooldown_schedule(lr, steps_per_epoch=steps_per_epoch, **kw)
    if name in (None, "none", "constant"):
        return lr
    raise ValueError(f"unknown scheduler {name}")


def train(cfg: dict, extra_callbacks: list | None = None) -> tuple[dict, dict]:
    """Returns (metrics, objects) like the reference's train().

    `extra_callbacks` lets programmatic drivers (e.g. the hparam sweep's
    pruning callback) attach callbacks that aren't expressible in config."""
    out_dir = os.path.join(
        cfg.get("output_dir", "runs/train"), time.strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(out_dir, exist_ok=True)
    save_config(cfg, os.path.join(out_dir, "config.yaml"))
    print(f"[train] run dir: {out_dir}", flush=True)

    # debug/profiling presets (configs/debug/*; reference debug configs)
    import jax

    # multi-host slice entry (no-op in single-process runs; the TPU-native
    # analogue of the reference's DDP num_nodes, configs/trainer/ddp.yaml)
    from particle_fm_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed((cfg.get("trainer") or {}).get("multihost"))

    debug_cfg = cfg.get("debug") or {}
    profiler_dir = debug_cfg.get("profiler_dir")
    if debug_cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    if debug_cfg.get("disable_jit"):
        jax.config.update("jax_disable_jit", True)
    if profiler_dir:
        jax.profiler.start_trace(str(profiler_dir))

    dm = instantiate(cfg["data"])
    dm.setup()

    model_cfg = dict(cfg["model"])
    optimizer_cfg = model_cfg.pop("optimizer", {})
    scheduler_cfg = model_cfg.pop("scheduler", None)
    model = instantiate(model_cfg)

    trainer_cfg = dict(cfg.get("trainer", {}))
    trainer_cfg.pop("multihost", None)  # consumed by maybe_initialize_distributed
    # LR schedules count OPTIMIZER steps: with gradient accumulation an epoch
    # makes steps_per_epoch // accumulate_grad_batches of them
    accum = int(trainer_cfg.get("accumulate_grad_batches", 1) or 1)
    lr = build_lr(optimizer_cfg, scheduler_cfg, max(dm.steps_per_epoch // max(accum, 1), 1))
    optimizer = make_optimizer(
        lr=lr,
        weight_decay=optimizer_cfg.get("weight_decay", 5e-5),
        grad_clip=trainer_cfg.pop("grad_clip", 0.5),
    )

    callbacks = build_callbacks(cfg.get("callbacks")) + list(extra_callbacks or [])
    ema_cfg = trainer_cfg.pop("ema", {})

    # logger group (configs/logger/*): backends + per-backend kwargs
    logger_cfg = dict(cfg.get("logger") or {})
    logger_backends = tuple(logger_cfg.pop("backends", ["jsonl"]))

    trainer = Trainer(
        model=model,
        datamodule=dm,
        optimizer=optimizer,
        callbacks=callbacks,
        ema_decay=ema_cfg.get("decay", 0.999),
        ema_every_n=ema_cfg.get("every_n", 1),
        ema_start_step=ema_cfg.get("start_step", 0),
        ckpt_dir=os.path.join(out_dir, "checkpoints"),
        log_dir=out_dir,
        logger_backends=logger_backends,
        logger_kwargs=logger_cfg,
        seed=cfg.get("seed", 0),
        # mesh is built by the Trainer itself: trainer.strategy decides the
        # (data, model) axis layout (dp/fsdp -> 1-D, dp_tp/sp -> 2-D)
        **trainer_cfg,
    )

    metrics = {}
    if cfg.get("train", True):
        try:
            trainer.fit(
                resume_from=cfg.get("ckpt_path"),
                load_weights_from=cfg.get("load_weights_from"),
            )
        finally:
            if profiler_dir:
                jax.profiler.stop_trace()
                print(f"[train] profiler trace written to {profiler_dir}")
        if trainer.metrics_history:
            metrics.update(trainer.metrics_history[-1])
    if cfg.get("test", False):
        monitor = "w1m_mean" if "w1m_mean" in trainer.ckpt_monitors else None
        metrics.update(trainer.test(ckpt="best", monitor=monitor))
    save_config(
        {k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))},
        os.path.join(out_dir, "final_metrics.yaml"),
    )
    return metrics, {"trainer": trainer, "model": model, "datamodule": dm, "out_dir": out_dir}


def main(argv: list[str] | None = None) -> dict:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "train", overrides=list(argv))
    from particle_fm_tpu.utils.helpers import task_wrapper

    metrics, _ = task_wrapper(train)(cfg)
    return metrics


if __name__ == "__main__":
    main()
