"""Standalone evaluation entry point.

    python -m particle_fm_tpu.evaluate ckpt_path=<run_dir or ckpt path> [key=value ...]

Parity with the reference's particle_fm/eval.py:33-97: reload the run's
saved config.yaml, rebuild datamodule/model, restore the checkpoint
(best/last/explicit path), run the on_test eval callbacks and write
final_eval_metrics.yaml.
"""

from __future__ import annotations

import os
import sys

import yaml

from particle_fm_tpu.config.core import instantiate, load_config
from particle_fm_tpu.parallel.mesh import make_mesh
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer


def evaluate(run_dir: str, ckpt: str = "best", overrides: dict | None = None) -> dict:
    cfg = load_config(os.path.join(run_dir, "config.yaml"))
    for k, v in (overrides or {}).items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        # CLI values arrive as strings; parse like the train CLI's dotlist
        # (yaml scalar rules: ints, floats, bools, null, strings). YAML 1.1
        # leaves dot-less scientific notation like "1e-3" a string — add the
        # float fallback so numeric overrides always compare numerically.
        if isinstance(v, str):
            v = yaml.safe_load(v)
            if isinstance(v, str):
                try:
                    v = float(v)
                except ValueError:
                    pass
        node[parts[-1]] = v

    dm = instantiate(cfg["data"])
    dm.setup()
    model_cfg = dict(cfg["model"])
    optimizer_cfg = model_cfg.pop("optimizer", {})
    scheduler_cfg = model_cfg.pop("scheduler", None)
    model = instantiate(model_cfg)
    from particle_fm_tpu.train import build_callbacks

    callbacks = build_callbacks(cfg.get("callbacks"))
    trainer_cfg = dict(cfg.get("trainer", {}))
    trainer_cfg.pop("ema", None)
    grad_clip = trainer_cfg.pop("grad_clip", 0.5)
    # rebuild the optimizer exactly as train.py did: the checkpointed
    # opt_state's structure depends on schedule vs constant lr
    from particle_fm_tpu.train import build_lr

    lr = build_lr(optimizer_cfg, scheduler_cfg, max(dm.steps_per_epoch, 1))
    optimizer = make_optimizer(
        lr=lr, weight_decay=optimizer_cfg.get("weight_decay", 5e-5), grad_clip=grad_clip
    )
    trainer = Trainer(
        model=model,
        datamodule=dm,
        optimizer=optimizer,
        callbacks=callbacks,
        ckpt_dir=os.path.join(run_dir, "checkpoints"),
        log_dir=run_dir,
        mesh=make_mesh(),
        **trainer_cfg,
    )
    # materialize a state to restore into
    from particle_fm_tpu.parallel.train import create_train_state
    import jax

    trainer.state = create_train_state(model, jax.random.PRNGKey(0), trainer.optimizer)
    monitor = "w1m_mean" if "w1m_mean" in trainer.ckpt_monitors else None
    results = trainer.test(ckpt=ckpt, monitor=monitor)
    with open(os.path.join(run_dir, "final_eval_metrics.yaml"), "w") as f:
        yaml.safe_dump({k: float(v) for k, v in results.items()}, f)
    return results


def main(argv: list[str] | None = None) -> dict:
    argv = argv if argv is not None else sys.argv[1:]
    kv = dict(a.split("=", 1) for a in argv)
    run_dir = kv.pop("ckpt_path", None) or kv.pop("run_dir", None)
    if run_dir is None:
        raise SystemExit("usage: python -m particle_fm_tpu.evaluate ckpt_path=<run_dir> [ckpt=best|last]")
    ckpt = kv.pop("ckpt", "best")
    return evaluate(run_dir, ckpt=ckpt, overrides=kv)


if __name__ == "__main__":
    main()
