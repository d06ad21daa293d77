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
    ap.add_argument("--arch", default="epic", choices=["epic", "transformer"])
    ap.add_argument("--n_samples", type=int, default=20000)
    ap.add_argument("--epochs", type=int, default=20)
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
    clf = SetClassifierModel(
        arch=args.arch, n_classes=1,
        num_particles=real.shape[1], features=real.shape[-1],
    )
    trainer = Trainer(
        model=clf, datamodule=cdm, optimizer=make_optimizer(lr=1e-3),
        max_epochs=args.epochs,
        callbacks=[ClassifierEvalCallback(every_n_epochs=1)],
        verbose=True,
    )
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
