"""Gen-vs-real classifier test for a trained generative run.

    python scripts/classifier_test.py --run_dir <run> [--arch epic|transformer]
        [--n_samples 20000] [--epochs 20]

Parity: the reference's classifier-test workflow (experiment
lhco/epic_classifier + classifier_datamodule): generate samples from the
trained model, mix them with held-out real samples, train an EPiC classifier
to separate them, and report accuracy/AUROC (AUC ~ 0.5 means the generator
is indistinguishable from data).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument(
        "--arch", default="epic", choices=["epic", "transformer", "part", "particlenet", "hl"]
    )
    ap.add_argument(
        "--data_file", default=None,
        help="JetClass classifier h5 (from eval_ckpt.py --write_classifier_h5): "
        "run the 10-class-era JetClass classifier test instead of generating",
    )
    ap.add_argument("--used_flavor", default="Tbqq")
    ap.add_argument(
        "--load_weights_from", default=None,
        help="pretrained classifier checkpoint to fine-tune from "
        "(the head is reinitialised, reference reinitialise_fc)",
    )
    ap.add_argument("--n_samples", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument(
        "--lr", type=float, default=1e-3,
        help="classifier learning rate (the deep ParT net prefers ~3e-4)",
    )
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--ode_steps", type=int, default=100)
    args = ap.parse_args()

    import jax

    from particle_fm_tpu.data.classifier import GenVsRealDataModule
    from particle_fm_tpu.eval.callbacks import ClassifierEvalCallback
    from particle_fm_tpu.eval.generation import generate_data
    from particle_fm_tpu.models.classifiers import SetClassifierModel
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.trainer import Trainer
    from scripts.generate_data_lhco import load_run

    if args.data_file:
        # JetClass classifier test: mixed gen/sim h5 from eval_ckpt.py
        # --write_classifier_h5 (reference jetclass_classifier experiments)
        from particle_fm_tpu.data.jetclass_classifier import (
            JetClassClassifierDataModule,
        )

        cdm = JetClassClassifierDataModule(
            data_file=args.data_file,
            batch_size=args.batch_size,
            used_flavor=args.used_flavor,
            kin_only=args.arch != "hl",
            use_hl_features=args.arch == "hl",
            set_energy_equal_to_p=True,
        )
        cdm.setup()
        if args.arch == "hl":
            from particle_fm_tpu.models.classifiers import HLClassifierModel

            clf = HLClassifierModel(features=cdm.train.x.shape[-1])
        else:
            clf = SetClassifierModel(
                arch=args.arch, n_classes=2,
                num_particles=cdm.train.x.shape[1],
                features=cdm.train.x.shape[-1],
            )
        return _fit_and_report(args, clf, cdm)

    cfg, dm, model, variables = load_run(args.run_dir, args.ckpt)
    real = dm.tensor_test
    mask = dm.mask_test
    cond = dm.tensor_conditioning_test
    n = min(args.n_samples, len(real))

    gen, _ = generate_data(
        model, variables, num_jet_samples=n,
        batch_size=1024,
        cond=cond[:n] if cond is not None else None,
        variable_set_sizes=dm.variable_jet_sizes,
        mask=mask[:n] if mask is not None else None,
        normalized_data=dm.means is not None,
        normalize_sigma=getattr(dm, "normalize_sigma", 5),
        means=dm.means, stds=dm.stds,
        ode_steps=args.ode_steps,
    )
    gen_mask = (np.abs(gen).sum(-1, keepdims=True) > 0).astype(np.float32)

    cdm = GenVsRealDataModule(
        real=real[:n], real_mask=mask[:n], gen=gen, gen_mask=gen_mask,
        batch_size=args.batch_size,
    )
    cdm.setup()
    net_config = {}
    if args.arch == "part":
        # generative runs store (etarel, phirel, ptrel): pt is already
        # linear; pass the datamodule's z-score stats so the pairwise
        # interaction features are computed from raw kinematics (weaver's
        # ParT receives raw pf_vectors next to the normalized inputs)
        net_config = {
            "pt_transform": "identity",
            "kin_means": tuple(np.asarray(cdm.means).reshape(-1).tolist()),
            "kin_stds": tuple(np.asarray(cdm.stds).reshape(-1).tolist()),
        }
    clf = SetClassifierModel(
        arch=args.arch, n_classes=1,
        num_particles=real.shape[1], features=real.shape[-1],
        net_config=net_config,
    )
    return _fit_and_report(args, clf, cdm)


def _fit_and_report(args, clf, cdm):
    import jax
    import optax

    from particle_fm_tpu.eval.callbacks import ClassifierEvalCallback
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.trainer import Trainer

    # warmup-cosine: the deep ParT net (8 layers + class attention) stalls at
    # chance under a cold constant 1e-3 AdamW; the shallow epic/transformer
    # nets are insensitive to the schedule
    steps_per_epoch = max(1, len(cdm.train.x) // args.batch_size)
    total_steps = max(args.epochs * steps_per_epoch, 2)
    lr = optax.warmup_cosine_decay_schedule(
        0.0, args.lr,
        warmup_steps=max(1, min(total_steps // 10, 500)),
        decay_steps=total_steps,
    )
    trainer = Trainer(
        model=clf, datamodule=cdm, optimizer=make_optimizer(lr=lr),
        max_epochs=args.epochs,
        callbacks=[ClassifierEvalCallback(every_n_epochs=1)],
        verbose=True,
    )
    load_from = getattr(args, "load_weights_from", None)
    if load_from and hasattr(clf, "reinit_head"):
        # fine-tune-from-pretrained: load trunk weights, redraw the head
        # (reference jetclass_classifiers.py:250-263 load + reinitialise_fc)
        from particle_fm_tpu.parallel.train import create_train_state
        from particle_fm_tpu.training.checkpoint import load_weights_from

        state = create_train_state(clf, jax.random.PRNGKey(0), trainer.optimizer)
        state = load_weights_from(load_from, state)
        fresh = clf.reinit_head({"params": state.params}, jax.random.PRNGKey(1))
        state = state.replace(
            params=fresh["params"],
            ema_params=jax.tree_util.tree_map(lambda a: a.copy(), fresh["params"]),
        )
        trainer.fit(initial_state=state)
    else:
        trainer.fit()
    final = trainer.metrics_history[-1]
    out = {
        "classifier_auc": float(final["auroc"]),
        "classifier_accuracy": float(final["accuracy"]),
    }
    path = os.path.join(args.run_dir, "classifier_test.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(out, f)
    print(f"[classifier_test] AUC={out['classifier_auc']:.4f} "
          f"(0.5 = indistinguishable) -> {path}")
    return out


if __name__ == "__main__":
    main()
