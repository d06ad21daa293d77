"""Consistency distillation of a trained flow-matching run for 1-2 step
sampling.

    python scripts/consistency.py --run_dir <teacher_run> [--steps 4000]
        [--eval_steps 1,2,4]

Beyond-reference (the reference's fastest sampler is midpoint at NFE
100-200). Pipeline: restore the teacher (EMA weights) -> consistency-distill
on the teacher's OWN training split (standard CD needs data + the teacher
ODE, no pair generation pass) -> evaluate the student's k-step consistency
sampler and the teacher's ODE ladder against the REAL held-out test split
(W1M/W1P, the reference protocol). Writes <out_dir>/consistency_metrics.yaml.

See particle_fm_tpu/training/consistency.py for the method and design notes.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True, help="teacher run directory")
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument("--mode", default="direct", choices=["cd", "direct"],
                    help="direct (default): regress onto full teacher ODE "
                         "solves — stable at small budgets, reaches teacher "
                         "quality at NFE=1 (costs 2*solver_steps teacher NFE "
                         "per example). cd: standard EMA-target consistency "
                         "distillation (bootstrap targets) — MEASURED "
                         "UNSTABLE on this workload at small distillation "
                         "budgets (docs/RESULTS.md r3: W1M 0.19 -> 8.2 as "
                         "steps grow); kept for experimentation only")
    ap.add_argument("--solver_steps", type=int, default=8,
                    help="teacher midpoint steps per target (direct mode)")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--n_grid", type=int, default=16)
    ap.add_argument("--curriculum", action="store_true",
                    help="two-stage grid: n_grid/2 for the first 40%% of "
                         "steps, then n_grid (iCT-style doubling)")
    ap.add_argument("--target_ema", type=float, default=0.95)
    ap.add_argument("--huber_c", type=float, default=0.15)
    ap.add_argument("--eval_steps", default="1,2,4",
                    help="consistency sampler NFE ladder")
    ap.add_argument("--teacher_nfes", default="100",
                    help="teacher ODE NFE baseline ladder ('' to skip)")
    ap.add_argument("--n_eval", type=int, default=5000)
    ap.add_argument("--eval_batch", type=int, default=2500)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from particle_fm_tpu.data.utils import inverse_normalize_tensor
    from particle_fm_tpu.eval.generation import generate_data
    from particle_fm_tpu.eval.metrics import calculate_all_wasserstein_metrics
    from particle_fm_tpu.training.consistency import (
        consistency_sample,
        distill_consistency,
        distill_direct,
    )
    from particle_fm_tpu.utils.run_io import load_run

    cfg, dm, teacher, tvars = load_run(args.run_dir, args.ckpt, ema=True)
    if getattr(dm, "log_pt", False) or getattr(dm, "pt_standardization", False):
        raise NotImplementedError(
            "consistency.py undoes plain sigma-normalization only; "
            "log_pt/pt_standardization datamodules are not supported"
        )
    out_dir = args.out_dir or os.path.join(
        args.run_dir, f"consistency_{time.strftime('%Y-%m-%d_%H-%M-%S')}"
    )
    os.makedirs(out_dir, exist_ok=True)
    print(f"[consistency] teacher restored from {args.run_dir} -> {out_dir}")

    # ------------------------------------------------------------- distill
    t0 = time.time()
    common = dict(
        mask=dm.mask_train if dm.variable_jet_sizes else None,
        cond=dm.tensor_conditioning_train,
        batch_size=args.batch_size,
        lr=args.lr,
        target_ema=args.target_ema,
        huber_c=args.huber_c,
        seed=args.seed,
        verbose=True,
    )
    stages = (
        [(args.n_grid // 2, int(args.steps * 0.4)), (args.n_grid, args.steps - int(args.steps * 0.4))]
        if args.curriculum
        else [(args.n_grid, args.steps)]
    )
    res, init_v = None, None
    if args.mode == "direct":
        print(f"[consistency] mode=direct solver_steps={args.solver_steps} "
              f"steps={args.steps}")
        common.pop("target_ema")
        res = distill_direct(
            teacher, tvars, dm.tensor_train,
            steps=args.steps, warmup=min(args.warmup, args.steps // 2),
            solver_steps=args.solver_steps, **common,
        )
    else:
        print(
            "[consistency] WARNING: mode=cd (standard EMA-target bootstrap) is "
            "MEASURED UNSTABLE at small distillation budgets on this workload "
            "— quality degrades with more steps (docs/RESULTS.md round-3 "
            "consistency table: W1M 0.19 at 2k steps -> 8.2 at 8k). Use the "
            "default --mode direct for production distillation.",
            file=sys.stderr,
        )
        for n_grid, steps in stages:
            print(f"[consistency] stage: n_grid={n_grid} steps={steps}")
            res = distill_consistency(
                teacher, tvars, dm.tensor_train,
                steps=steps, warmup=min(args.warmup, steps // 2),
                n_grid=n_grid, init_variables=init_v, **common,
            )
            init_v = res.variables
    print(f"[consistency] distilled {args.steps} steps in {time.time() - t0:.1f}s "
          f"(final loss {res.losses[-1]:.5f})")
    np.savez(os.path.join(out_dir, "student.npz"),
             **{"loss_history": res.losses})
    # persist the student in the run's own format so tools can reload it
    import pickle

    with open(os.path.join(out_dir, "student_variables.pkl"), "wb") as f:
        pickle.dump(jax.device_get(res.variables), f)

    # ----------------------------------------------------------------- eval
    real = dm.tensor_test
    maskr = dm.mask_test
    condr = dm.tensor_conditioning_test
    n = min(args.n_eval, len(real))
    results = {"distill_steps": args.steps, "final_loss": float(res.losses[-1])}

    def undo(gen):
        if dm.means is not None:
            gen = inverse_normalize_tensor(
                gen, dm.means, dm.stds, sigma=getattr(dm, "normalize_sigma", 5)
            )
        if maskr is not None:
            gen = gen * maskr[:n]
        return gen

    def student_ladder(tag, variables, ks):
        for k in ks:
            t0 = time.time()
            outs = []
            for s in range(0, n, args.eval_batch):
                e = min(s + args.eval_batch, n)
                g = consistency_sample(
                    teacher,
                    variables,
                    jax.random.PRNGKey(7 + s),
                    n_samples=e - s,
                    cond=condr[s:e] if condr is not None else None,
                    mask=maskr[s:e] if maskr is not None else None,
                    steps=k,
                )
                outs.append(np.asarray(g))
            gen = undo(np.concatenate(outs))
            gtime = time.time() - t0
            w1 = calculate_all_wasserstein_metrics(
                real[:n, :, :3], gen[..., :3], num_eval_samples=min(10_000, n)
            )
            row = {
                "w1m": float(w1["w1m_mean"]), "w1m_std": float(w1["w1m_std"]),
                "w1p": float(w1["w1p_mean"]), "gen_time_s": float(gtime),
            }
            results[f"{tag}_nfe{k}"] = row
            print(f"[consistency] {tag} NFE={k:<3d} W1M={row['w1m']:.4f}"
                  f"±{row['w1m_std']:.4f} W1P={row['w1p']:.4f} ({gtime:.2f}s)")

    ks = [int(s) for s in args.eval_steps.split(",") if s]
    # the un-distilled map g(z,1) IS the teacher's one-Euler-step jump:
    # the improvement over this row is what distillation bought
    student_ladder("init_euler", tvars, ks[:1])
    student_ladder("student", res.variables, ks)
    student_ladder("student_ema", res.target_variables, ks)

    for nfe in [int(s) for s in args.teacher_nfes.split(",") if s]:
        gen, gtime = generate_data(
            teacher, tvars, n,
            batch_size=args.eval_batch,
            cond=condr[:n] if condr is not None else None,
            variable_set_sizes=dm.variable_jet_sizes,
            mask=maskr[:n] if maskr is not None else None,
            normalized_data=dm.means is not None,
            means=dm.means, stds=dm.stds,
            ode_solver="midpoint", ode_steps=nfe // 2 + 1,
            seed=7,
        )
        w1 = calculate_all_wasserstein_metrics(
            real[:n, :, :3], gen[..., :3], num_eval_samples=min(10_000, n)
        )
        row = {
            "w1m": float(w1["w1m_mean"]), "w1m_std": float(w1["w1m_std"]),
            "w1p": float(w1["w1p_mean"]), "gen_time_s": float(gtime),
        }
        results[f"teacher_nfe{nfe}"] = row
        print(f"[consistency] teacher NFE={nfe:<4d} W1M={row['w1m']:.4f}"
              f"±{row['w1m_std']:.4f} W1P={row['w1p']:.4f} ({gtime:.2f}s)")

    with open(os.path.join(out_dir, "consistency_metrics.yaml"), "w") as f:
        yaml.safe_dump(results, f, sort_keys=False)
    print(f"[consistency] wrote {out_dir}/consistency_metrics.yaml")


if __name__ == "__main__":
    main()
