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
    ap.add_argument(
        "--gen_h5", default=None,
        help="LHCO SR mode (the reference anomaly chain's endpoint, "
        "models/epic_classifier.py + classifier_datamodule.py): xy-mode "
        "output of generate_data_lhco.py (constituents + constituents_y); "
        "trains the dijet EPiC classifier (num_sup_sets=2) on generated vs "
        "REAL signal-region events. --run_dir must be the stage-2 run (its "
        "datamodule supplies the real SR events).",
    )
    ap.add_argument(
        "--control", action="store_true",
        help="with --gen_h5: real-vs-real control split instead of the "
        "generated events (AUC ~ 0.5 calibrates the test itself)",
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

    if args.gen_h5:
        return _lhco_sr_mode(args)

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


def _lhco_sr_mode(args):
    """SR gen-vs-real dijet classifier — the LHCO anomaly chain's payoff.

    Parity: the reference two-stage pipeline terminates in training
    EPiCClassifierLitModule on generated-vs-real SR point clouds
    (particle_fm/models/epic_classifier.py:40-223,
    data/classifier_datamodule.py:20; SURVEY 3.4). Here: the xy-mode output
    of generate_data_lhco.py supplies the generated dijet events; the REAL
    signal-region events come from the stage-2 datamodule's raw loader
    (the SR window is excluded from generative training, so they are
    model-held-out). Events keep their two-jet structure: rows (2i, 2i+1)
    are one event and the EPiC discriminator pools with num_sup_sets=2
    (nets/epic.py super-set head). AUC ~ 0.5 = the generator is
    indistinguishable from real SR data.
    """
    import h5py

    from particle_fm_tpu.data.classifier import GenVsRealDataModule
    from particle_fm_tpu.data.utils import get_mjj
    from particle_fm_tpu.models.classifiers import SetClassifierModel
    from particle_fm_tpu.utils.run_io import load_run

    cfg, dm2, _model, _vars = load_run(args.run_dir, args.ckpt)
    n_p = dm2.num_particles

    # real SR events straight from the raw per-event arrays (the datamodule's
    # split tensors shuffle jets independently, which would break x/y event
    # pairing); constituents arrive (pt, eta, phi) relative -> reorder to the
    # (eta, phi, pt) convention the generative models emit
    jets, consts, mask = dm2._load()
    sr = (get_mjj(jets[:, 0], jets[:, 1]) > 3300) & (
        get_mjj(jets[:, 0], jets[:, 1]) < 3700
    )
    consts, mask = consts[sr][:, :, :n_p, :], mask[sr][:, :, :n_p, :]
    consts = consts[..., [1, 2, 0]] * mask
    real = consts.reshape(-1, n_p, consts.shape[-1]).astype(np.float32)
    real_mask = mask.reshape(-1, n_p, 1).astype(np.float32)

    if args.control:
        # real-vs-real: split the SR events in half; a healthy test reads ~0.5
        n_ev = len(real) // 2 // 2
        gen, gen_mask = real[2 * n_ev : 4 * n_ev], real_mask[2 * n_ev : 4 * n_ev]
        real, real_mask = real[: 2 * n_ev], real_mask[: 2 * n_ev]
    else:
        with h5py.File(args.gen_h5, "r") as f:
            if "constituents_y" not in f:
                raise SystemExit(
                    "--gen_h5 needs xy-mode output (run generate_data_lhco.py "
                    "with --stage2_run_y, one run dir may serve both jets)"
                )
            gx, gy = np.asarray(f["constituents"]), np.asarray(f["constituents_y"])
            mx, my = np.asarray(f["mask"]), np.asarray(f["mask_y"])
        gen = np.stack([gx, gy], axis=1).reshape(-1, gx.shape[1], gx.shape[2])
        gen_mask = np.stack([mx, my], axis=1).reshape(-1, mx.shape[1], 1)
        gen = (gen[:, :n_p] * gen_mask[:, :n_p]).astype(np.float32)
        gen_mask = gen_mask[:, :n_p].astype(np.float32)

    n = min(len(real), len(gen), 2 * args.n_samples)
    n -= n % 2  # whole events
    cdm = GenVsRealDataModule(
        real=real[:n], real_mask=real_mask[:n], gen=gen[:n], gen_mask=gen_mask[:n],
        batch_size=args.batch_size, num_sup_sets=2,
    )
    cdm.setup()
    clf = SetClassifierModel(
        arch="epic", n_classes=1, num_particles=n_p, features=real.shape[-1],
        net_config={"num_sup_sets": 2},
    )
    tag = "control" if args.control else "sr"
    print(f"[classifier_test] LHCO SR mode ({tag}): "
          f"{n} jets ({n // 2} events) per side")
    return _fit_and_report(args, clf, cdm, out_name=f"classifier_test_sr_{tag}.yaml")


def _fit_and_report(args, clf, cdm, out_name: str = "classifier_test.yaml"):
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
    path = os.path.join(args.run_dir, out_name)
    with open(path, "w") as f:
        yaml.safe_dump(out, f)
    print(f"[classifier_test] AUC={out['classifier_auc']:.4f} "
          f"(0.5 = indistinguishable) -> {path}")
    return out


if __name__ == "__main__":
    main()
