"""Sweep the classifier-free guidance weight on a trained conditional run.

    python scripts/guidance_sweep.py --run_dir runs/fm_cfg_tops-30/<ts> \
        --ws 0 1 1.25 1.5 2 [--n 5000] [--ode_steps 100]

For each guidance weight w the script samples with the test split's
conditioning and reports, side by side:

  - marginal distribution match: W1M / W1P vs the held-out jets (the
    standard protocol — over-sharpening at large w shows up here), and
  - conditional fidelity: MAE and Pearson r between each generated jet's
    relative mass and its TARGET m/pt from the conditioning vector (what
    guidance is supposed to improve).

Writes guidance_sweep.yaml into the run dir. One checkpoint serves the whole
sweep — w is a sampling-time knob (models/flow_matching.py::make_drift).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument("--ws", type=float, nargs="+", default=[0.0, 1.0, 1.5, 2.0])
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--ode_steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import yaml

    from particle_fm_tpu.data.utils import inverse_normalize_tensor
    from particle_fm_tpu.eval.generation import generate_data
    from particle_fm_tpu.eval.metrics import (
        calculate_all_wasserstein_metrics,
        jet_masses_from_rel,
    )
    from particle_fm_tpu.utils.run_io import load_run

    cfg, dm, model, variables = load_run(args.run_dir, args.ckpt, ema=True)
    if model.cond_dropout <= 0:
        print(
            "[guidance_sweep] WARNING: model trained with cond_dropout=0 — "
            "the null branch was never trained; w != 1 is extrapolation"
        )
    real = dm.tensor_test
    mask = dm.mask_test
    cond = dm.tensor_conditioning_test
    n = min(args.n, len(real))

    # conditioning targets in raw units: (pt, mass) -> target m_rel = m/pt.
    # Column order follows JetNetDataModule._handle_conditioning:
    # [type one-hots..., pt, eta?, mass, num_particles?]
    if not (getattr(dm, "conditioning_pt", False) and getattr(dm, "conditioning_mass", False)):
        raise SystemExit("guidance_sweep needs a run conditioned on jet (pt, mass)")
    pt_i = (len(dm.jet_type) if getattr(dm, "conditioning_type", False) else 0)
    mass_i = pt_i + 1 + (1 if getattr(dm, "conditioning_eta", False) else 0)
    cond_raw = np.asarray(cond[:n], dtype=np.float64)
    if getattr(dm, "cond_means", None) is not None:
        cond_raw = inverse_normalize_tensor(
            cond_raw, np.asarray(dm.cond_means), np.asarray(dm.cond_stds),
            getattr(dm, "normalize_sigma", 5),
        )
    target_mrel = cond_raw[:, mass_i] / np.clip(cond_raw[:, pt_i], 1e-6, None)

    # sanity floor: the real jets' own fidelity to their conditioning
    real_mrel = jet_masses_from_rel(np.asarray(real[:n]))
    floor_mae = float(np.abs(real_mrel - target_mrel).mean())

    results = {"floor_real_mae": floor_mae, "ws": {}}
    print(f"[guidance_sweep] real-jet conditioning floor: MAE(m_rel) = {floor_mae:.5f}")
    for w in args.ws:
        gen, _ = generate_data(
            model,
            variables,
            num_jet_samples=n,
            rng=jax.random.PRNGKey(9999),
            batch_size=args.batch_size,
            cond=cond[:n] if cond is not None else None,
            variable_set_sizes=dm.variable_jet_sizes,
            mask=mask[:n] if mask is not None else None,
            normalized_data=dm.means is not None,
            normalize_sigma=getattr(dm, "normalize_sigma", 5),
            means=dm.means,
            stds=dm.stds,
            ode_steps=args.ode_steps,
            num_points=int(real.shape[1]),
            guidance_scale=None if w == 1.0 else w,
        )
        w1 = calculate_all_wasserstein_metrics(
            real[:n], gen, num_batches=40, num_eval_samples=min(n, 5000)
        )
        gen_mrel = jet_masses_from_rel(gen)
        mae = float(np.abs(gen_mrel - target_mrel).mean())
        r = float(np.corrcoef(gen_mrel, target_mrel)[0, 1])
        row = {
            "w1m": float(w1["w1m_mean"]),
            "w1p": float(w1["w1p_mean"]),
            "cond_mae_mrel": mae,
            "cond_pearson_r": r,
        }
        results["ws"][float(w)] = row
        print(
            f"[guidance_sweep] w={w:<5} W1M={row['w1m']:.5f} W1P={row['w1p']:.5f} "
            f"MAE(m_rel|target)={mae:.5f} r={r:.4f}"
        )

    out = os.path.join(args.run_dir, "guidance_sweep.yaml")
    with open(out, "w") as f:
        yaml.safe_dump(results, f)
    print(f"[guidance_sweep] wrote {out}")


if __name__ == "__main__":
    main()
