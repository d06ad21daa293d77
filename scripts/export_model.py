"""Export a trained run's sampler as a serving artifact (StableHLO).

    python scripts/export_model.py --run_dir <run> [--ckpt best|last]
        [--batch_size 1024] [--ode_solver midpoint] [--ode_steps 100]
        [--out <dir>] [--platforms tpu cpu] [--verify]

Beyond the reference (no deployment story there): the artifact directory
(sampler.stablehlo + meta.yaml) is loadable with
`particle_fm_tpu.serving.load_exported` and runs WITHOUT the framework —
weights are graph constants, inverse normalization is baked in, outputs are
physical-space particle clouds. --verify deserializes the artifact and
checks it against the live model on one batch (exact agreement on the same
backend) and reports serving throughput.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--ode_solver", default=None, help="default: the run's eval solver or midpoint")
    ap.add_argument("--ode_steps", type=int, default=None)
    ap.add_argument("--out", default=None, help="default: <run_dir>/exported")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms (default: local backend)")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--guidance_scale", type=float, default=None,
                    help="bake classifier-free guidance at this scale into "
                         "the exported program (conditional models; train "
                         "with model.cond_dropout > 0 for a meaningful "
                         "null token)")
    args = ap.parse_args()

    from particle_fm_tpu import serving
    from particle_fm_tpu.utils.run_io import load_run

    cfg, dm, model, variables = load_run(args.run_dir, args.ckpt, ema=not args.no_ema)

    cb = (cfg.get("callbacks") or {}).get("jetnet_eval") or {}
    solver = args.ode_solver or cb.get("ode_solver", "midpoint")
    steps = args.ode_steps or int(cb.get("ode_steps", 100))

    mask = getattr(dm, "mask_test", None)
    cond = getattr(dm, "tensor_conditioning_test", None)
    use_mask = mask is not None
    num_points = int(mask.shape[1]) if use_mask else int(model.num_particles)
    cond_dim = int(cond.shape[-1]) if cond is not None and cond.ndim == 2 else None

    blob, meta = serving.export_sampler(
        model,
        variables,
        batch_size=args.batch_size,
        num_points=num_points,
        features=int(model.features),
        cond_dim=cond_dim,
        use_mask=use_mask,
        ode_solver=solver,
        ode_steps=steps,
        means=dm.means,
        stds=dm.stds,
        normalize_sigma=getattr(dm, "normalize_sigma", 5),
        platforms=args.platforms,
        guidance_scale=args.guidance_scale,
    )
    meta["provenance"] = {
        "run_dir": os.path.abspath(args.run_dir),
        "ckpt": args.ckpt,
        "ema": not args.no_ema,
        "task_name": cfg.get("task_name"),
    }
    out = args.out or os.path.join(args.run_dir, "exported")
    serving.save_exported(out, blob, meta)
    print(f"[export_model] wrote {out} ({len(blob) / 1e6:.2f} MB, "
          f"platforms={meta['platforms']}, solver={solver} steps={steps})")

    if args.verify:
        fn, meta2 = serving.load_exported(out)
        n = args.batch_size
        rs = np.random.RandomState(0)
        call_args = [np.uint32(7)]
        live_args = []
        if cond_dim:
            sel = rs.randint(0, len(cond), size=n)
            cb_ = np.asarray(cond)[sel].astype(np.float32)
            call_args.append(cb_)
            live_args.append(cb_)
        else:
            live_args.append(None)
        if use_mask:
            sel = rs.randint(0, len(mask), size=n)
            mb = np.asarray(mask)[sel].astype(np.float32)
            call_args.append(mb)
            live_args.append(mb)
        else:
            live_args.append(None)

        live = serving.make_serve_fn(
            model, variables, batch_size=n, ode_solver=solver, ode_steps=steps,
            num_points=num_points, has_cond=bool(cond_dim), has_mask=use_mask,
            means=dm.means, stds=dm.stds,
            normalize_sigma=getattr(dm, "normalize_sigma", 5),
        )
        import jax.numpy as jnp

        ref = np.asarray(live(jnp.uint32(7), *[a for a in live_args if a is not None]))
        got = np.asarray(fn(*call_args))
        err = float(np.max(np.abs(got - ref)))
        print(f"[export_model] verify: max|exported - live| = {err:.3e}")
        assert err < 1e-4, "exported sampler disagrees with the live model"

        # serving throughput, warm-up excluded (reference timing convention)
        got = np.asarray(fn(*call_args))
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            call_args[0] = np.uint32(100 + i)
            got = np.asarray(fn(*call_args))
        dt = time.perf_counter() - t0
        print(f"[export_model] serving throughput: {reps * n / dt:,.0f} samples/s "
              f"({1e3 * dt / reps:.1f} ms/batch of {n})")


if __name__ == "__main__":
    main()
