"""Import a trained reference (ewencedr/particle_fm) Lightning checkpoint
into a framework-native run directory.

    python scripts/import_reference_ckpt.py \
        --ckpt /path/to/epoch=...-EMA.ckpt \
        --out runs/imported_tops30 \
        experiment=jetnet/fm_tops30_cond [model.hidden_dim=128 ...]

The trailing dotlist composes this repo's config exactly like the train CLI
— it must describe the SAME model the checkpoint was trained with (the
shape-checked graft fails loudly on any mismatch). The output directory is a
complete run dir (config.yaml snapshot + orbax checkpoint under
checkpoints/last with the imported weights as both params and EMA params),
so every downstream tool works on it unchanged:

    python -m particle_fm_tpu.evaluate ckpt_path=<out> ckpt=last
    python scripts/eval_ckpt.py --run_dir <out> --ckpt last
    python scripts/export_model.py --run_dir <out> --ckpt last
    python scripts/reflow.py --run_dir <out> --ckpt last
    python -m particle_fm_tpu.train ... load_weights_from=<out>

Tensor relayout lives in particle_fm_tpu/utils/torch_import.py; the mapping
itself is proven by the executed-reference forward goldens in
tests/test_torch_parity.py. Reference checkpoint anchors:
flow_matching_module.py:417-445 (flows ModuleList), ema.py:102-143 (the
-EMA.ckpt sidecar — pass that file to import the EMA weights, which is what
the reference evaluates).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> str:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--ckpt", required=True, help="reference .ckpt/.pt file")
    ap.add_argument(
        "--out",
        default=None,
        help="output run dir (default runs/imported/<timestamp>)",
    )
    ap.add_argument(
        "overrides",
        nargs="*",
        help="config dotlist, e.g. experiment=jetnet/fm_tops30_cond model.layers=6",
    )
    args = ap.parse_args(argv)

    import jax

    from particle_fm_tpu.config.core import compose, instantiate, save_config
    from particle_fm_tpu.parallel.train import create_train_state, make_optimizer
    from particle_fm_tpu.train import CONFIG_DIR, build_lr
    from particle_fm_tpu.training.checkpoint import CheckpointManager
    from particle_fm_tpu.utils.torch_import import (
        load_reference_checkpoint,
        variables_from_reference_state_dict,
    )

    cfg = compose(CONFIG_DIR, "train", overrides=list(args.overrides))
    out_dir = args.out or os.path.join(
        "runs/imported", time.strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(out_dir, exist_ok=True)

    # the datamodule is needed only for steps_per_epoch (the checkpointed
    # opt_state embeds the LR schedule structure, mirroring utils/run_io.py)
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

    sd = load_reference_checkpoint(args.ckpt)
    variables = variables_from_reference_state_dict(sd, model)
    print(f"[import] converted {len(sd)} reference tensors from {args.ckpt}")

    # the reference evaluates EMA weights (pass the -EMA.ckpt sidecar to get
    # them); the imported tensors land as BOTH params and ema_params so
    # ema=True and ema=False loads agree
    state = create_train_state(model, jax.random.PRNGKey(0), optimizer)
    state = state.replace(
        params=variables["params"], ema_params=variables["params"]
    )

    save_config(cfg, os.path.join(out_dir, "config.yaml"))
    cm = CheckpointManager(
        os.path.join(out_dir, "checkpoints"),
        cfg.get("trainer", {}).get("ckpt_monitors", {"val_loss": "min"}),
    )
    path = cm.save_last(state)
    cm.flush()  # async save: join the write before reporting the path
    print(f"[import] wrote run dir {out_dir} (checkpoint: {path})")
    print(f"[import] evaluate with: python scripts/eval_ckpt.py --run_dir {out_dir} --ckpt last")
    return out_dir


if __name__ == "__main__":
    main()
