"""Run loading shared by the offline scripts and tools.

One canonical recipe for: reload a run's saved config, rebuild the
datamodule/model/optimizer (the checkpointed opt_state's structure depends on
the schedule), restore the requested checkpoint, and hand back EMA-ready
variables.
"""

from __future__ import annotations

import os


def load_run(run_dir: str, ckpt: str = "best", ema: bool = True):
    """Returns (cfg, datamodule, model, variables)."""
    import jax

    from particle_fm_tpu.config.core import instantiate, load_config
    from particle_fm_tpu.parallel.train import create_train_state, make_optimizer
    from particle_fm_tpu.train import build_lr
    from particle_fm_tpu.training.checkpoint import CheckpointManager

    cfg = load_config(os.path.join(run_dir, "config.yaml"))
    dm = instantiate(cfg["data"])
    dm.setup()
    model_cfg = dict(cfg["model"])
    opt_cfg = model_cfg.pop("optimizer", {})
    sched_cfg = model_cfg.pop("scheduler", None)
    model = instantiate(model_cfg)
    optimizer = make_optimizer(
        lr=build_lr(opt_cfg, sched_cfg, max(dm.steps_per_epoch, 1)),
        weight_decay=opt_cfg.get("weight_decay", 5e-5),
        grad_clip=cfg.get("trainer", {}).get("grad_clip", 0.5),
    )
    # Build + restore the state on the host CPU backend: restoring onto the
    # accelerator only to device_get it back is a wasted round-trip, and on
    # the tunneled single-chip setup the large D2H pull can wedge the relay
    # stream (observed hang inside jax.device_get of the restored params).
    # Callers move the variables to the accelerator lazily when they jit.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
        cm = CheckpointManager(
            os.path.join(run_dir, "checkpoints"),
            cfg.get("trainer", {}).get("ckpt_monitors", {"val_loss": "min"}),
        )
        path = cm.last_path() if ckpt == "last" else (
            cm.best_path(next(iter(cm.monitors))) or cm.last_path()
        )
        if path is None:
            raise FileNotFoundError(f"no checkpoint found under {run_dir}/checkpoints")
        state = cm.restore(path, state)
        variables = jax.device_get(state.variables(ema=ema))
    return cfg, dm, model, variables
