"""Two-stage LHCO generation pipeline (offline driver).

    # one constituent model for both jets (reference generate_data_lhco.py):
    python scripts/generate_data_lhco.py --stage1_run <dir> --stage2_run <dir>
        [--n_samples N] [--out lhco_generated.h5] [--recluster]

    # separate x-jet / y-jet models (reference generate_data_lhco_xy.py):
    python scripts/generate_data_lhco.py --stage1_run <dir> \
        --stage2_run <x_jet run> --stage2_run_y <y_jet run>

Parity: reference scripts/generate_data_lhco.py / generate_data_lhco_xy.py /
generate_data_lhco_clustering.py (SURVEY 3.4): sample stage-1 dijet jet
features in the signal region (conditioned on mjj), condition the stage-2
constituent model(s) on them, optionally re-cluster the generated clouds
with anti-kt (native fastjet_lite) and write everything to h5.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_run(run_dir: str, ckpt: str = "best"):
    """Shared loader (particle_fm_tpu.utils.run_io); kept as an alias for
    backwards compatibility with earlier script imports."""
    from particle_fm_tpu.utils.run_io import load_run as _load

    return _load(run_dir, ckpt, ema=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1_run", required=True, help="jet-feature FM run dir")
    ap.add_argument("--stage2_run", required=True,
                    help="constituent FM run dir (both jets, or the x jet with --stage2_run_y)")
    ap.add_argument("--stage2_run_y", default=None,
                    help="optional separate y-jet constituent run (two-model xy mode)")
    ap.add_argument("--n_samples", type=int, default=10000)
    ap.add_argument("--ode_steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--recluster", action="store_true", help="anti-kt recluster events")
    ap.add_argument(
        "--metrics",
        action="store_true",
        help="with --recluster: W1(mjj) + per-jet feature W1 of the "
        "reclustered generated events vs the real signal region "
        "(reference lhco_complex_data_eval protocol: generated-clustered "
        "vs the real pre-clustered jets)",
    )
    ap.add_argument("--out", default="lhco_generated.h5")
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp

    from particle_fm_tpu.data.utils import inverse_normalize_tensor, normalize_tensor

    # ---------------- stage 1: jet features conditioned on SR mjj
    cfg1, dm1, model1, vars1 = load_run(args.stage1_run)
    cond_sr = dm1.tensor_conditioning_test_sr
    reps = int(np.ceil(args.n_samples / len(cond_sr)))
    cond_sr = np.tile(cond_sr, (reps, 1))[: args.n_samples]
    feats = []
    rng = jax.random.PRNGKey(0)
    for lo in range(0, args.n_samples, args.batch_size):
        hi = min(lo + args.batch_size, args.n_samples)
        rng, sub = jax.random.split(rng)
        out = model1.sample(
            vars1, sub, n_samples=hi - lo, cond=jnp.asarray(cond_sr[lo:hi]),
            ode_steps=args.ode_steps,
        )
        feats.append(np.asarray(out))
    feats = np.concatenate(feats, axis=0)
    # un-normalize stage-1 output to physical jet features
    feats_phys = inverse_normalize_tensor(
        feats, dm1.means, dm1.stds, getattr(dm1, "normalize_sigma", 5)
    )
    print(f"[lhco] stage-1 features: {feats_phys.shape}")

    # ---------------- stage 2: constituents conditioned on stage-1 features
    from particle_fm_tpu.eval.generation import generate_data

    # stage-1 vector layout: (jet1, jet2) x (pt,eta,phi,m) + 2 multiplicities
    jets2 = feats_phys.reshape(len(feats_phys), 2, 5)

    def sample_jet(run_dir: str, jet_idx: int):
        """Generate one jet's constituents from its stage-1 features."""
        cfg2, dm2, model2, vars2 = load_run(run_dir)
        cond_dim = dm2.tensor_conditioning_train.shape[-1]
        cond_phys = jets2[:, jet_idx, :cond_dim]
        cond = normalize_tensor(
            cond_phys, dm2.cond_means, dm2.cond_stds, getattr(dm2, "normalize_sigma", 5)
        ).astype(np.float32)
        # multiplicities drive the mask length
        mult = np.clip(np.round(jets2[:, jet_idx, 4]).astype(int), 1, dm2.num_particles)
        ar = np.arange(dm2.num_particles)[None, :]
        mask = (ar < mult[:, None]).astype(np.float32)[..., None]
        consts, gen_time = generate_data(
            model2,
            vars2,
            num_jet_samples=args.n_samples,
            batch_size=args.batch_size,
            cond=cond,
            variable_set_sizes=True,
            mask=mask,
            normalized_data=dm2.means is not None,
            normalize_sigma=getattr(dm2, "normalize_sigma", 5),
            means=dm2.means,
            stds=dm2.stds,
            log_pt=getattr(dm2, "log_pt", False),
            pt_standardization=getattr(dm2, "pt_standardization", False),
            ode_steps=args.ode_steps,
        )
        print(f"[lhco] jet {jet_idx} constituents: {consts.shape} ({gen_time:.1f}s)")
        return consts, mask, dm2

    consts, mask, dm2 = sample_jet(args.stage2_run, jet_idx=0)
    payload = {
        "jet_features": feats_phys,
        "constituents": consts,
        "mask": mask,
        "mjj_cond": cond_sr,
    }
    if args.stage2_run_y:
        # two-model mode (reference generate_data_lhco_xy.py): a separate
        # model generates the subleading jet from ITS stage-1 features
        consts_y, mask_y, _ = sample_jet(args.stage2_run_y, jet_idx=1)
        payload["constituents_y"] = consts_y
        payload["mask_y"] = mask_y

    if args.recluster:
        from particle_fm_tpu.eval.lhco_utils import cluster_data

        # constituents are relative (eta, phi, pt) -> absolute (pt, eta, phi)
        from particle_fm_tpu.data.utils import get_nonrel_consts

        nonrel = get_nonrel_consts(jets2[:, 0, :4], consts[..., [2, 0, 1]])
        if args.stage2_run_y:
            # whole dijet event: both jets' absolute constituents in one cloud
            nonrel_y = get_nonrel_consts(
                jets2[:, 1, :4], payload["constituents_y"][..., [2, 0, 1]]
            )
            nonrel = np.concatenate([nonrel, nonrel_y], axis=1)
        jets_cl, consts_cl, mask_cl = cluster_data(nonrel, num_particles=dm2.num_particles)
        payload["clustered_jets"] = jets_cl
        payload["clustered_constituents"] = consts_cl
        payload["clustered_mask"] = mask_cl

    if args.metrics:
        if not args.recluster:
            raise SystemExit("--metrics requires --recluster")
        import yaml

        from particle_fm_tpu.data.utils import get_mjj
        from particle_fm_tpu.eval.metrics import (
            calculate_wasserstein_metrics_jets,
            wasserstein_distance_batched,
        )

        jets_cl = payload["clustered_jets"]
        # clusterer returns (pt, y, phi, m) per jet; top-2 jets per event
        mjj_gen = get_mjj(jets_cl[:, 0], jets_cl[:, 1])
        mjj_real = np.asarray(dm2.mjj_sr, dtype=np.float64)
        ok = np.isfinite(mjj_gen)
        n_eval = int(min(ok.sum(), len(mjj_real), 5000))
        w1_kwargs = dict(num_eval_samples=n_eval, num_batches=40)
        metrics = {}
        metrics["w1_mjj_mean"], metrics["w1_mjj_std"] = wasserstein_distance_batched(
            mjj_real, mjj_gen[ok], **w1_kwargs
        )
        # real SR dijet features from the stage-1 datamodule's held-out SR
        # split (tensor_test_sr is stored in PHYSICAL units — the raw copy is
        # taken before normalization in LHCOJetFeatureDataModule.setup).
        # These are the pre-clustered label jets, i.e. the reference's
        # comparison side; note the label eta is pseudorapidity while the
        # clusterer reports rapidity y — pt/m/mjj are estimator-consistent.
        real_sr = np.asarray(dm1.tensor_test_sr, dtype=np.float64).reshape(-1, 2, 5)
        for j, name in ((0, "x"), (1, "y")):
            wj = calculate_wasserstein_metrics_jets(
                real_sr[:, j, :4], jets_cl[:, j], **w1_kwargs
            )
            metrics.update({f"{k}_{name}": float(v) for k, v in wj.items()})
        out_yaml = os.path.splitext(args.out)[0] + "_metrics.yaml"
        with open(out_yaml, "w") as f:
            yaml.safe_dump({k: float(v) for k, v in metrics.items()}, f)
        print(f"[lhco] W1(mjj) = {metrics['w1_mjj_mean']:.2f} "
              f"+- {metrics['w1_mjj_std']:.2f} GeV  -> {out_yaml}")

    with h5py.File(args.out, "w") as f:
        for k, v in payload.items():
            f.create_dataset(k, data=v)
    print(f"[lhco] wrote {args.out}")


if __name__ == "__main__":
    main()
