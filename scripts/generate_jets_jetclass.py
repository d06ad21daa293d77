"""Generate JetClass jets from a trained run and write them in the JetClass
h5 layout (for the classifier-test / paper workflow).

    python scripts/generate_jets_jetclass.py --run_dir <run> [--n_samples N]
        [--use_gen_conditioning] [--out generated_jetclass.h5]

Parity: reference scripts/generate_jets_jetclass.py (250 LoC): sample with
either the truth conditioning (test split) or the generated-conditioning
file the datamodule was configured with (mask_gen / tensor_conditioning_gen),
un-standardize, and write part_features/part_mask/jet-features-like
conditioning with names attrs.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--ckpt", default="best", choices=["best", "last"])
    ap.add_argument("--n_samples", type=int, default=None)
    ap.add_argument("--ode_steps", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=1024)
    ap.add_argument("--use_gen_conditioning", action="store_true",
                    help="condition on the datamodule's generated-conditioning file")
    ap.add_argument("--out", default="generated_jetclass.h5")
    args = ap.parse_args()

    import h5py
    import jax

    from particle_fm_tpu.eval.generation import generate_data
    from scripts.generate_data_lhco import load_run

    cfg, dm, model, variables = load_run(args.run_dir, args.ckpt)

    if args.use_gen_conditioning:
        if getattr(dm, "tensor_conditioning_gen", None) is None:
            raise ValueError("datamodule has no generated-conditioning file configured")
        cond = dm.tensor_conditioning_gen
        mask = dm.mask_gen
    else:
        cond = dm.tensor_conditioning_test
        mask = dm.mask_test
    n = args.n_samples or len(mask)
    n = min(n, len(mask))

    gen, gen_time = generate_data(
        model, variables, num_jet_samples=n,
        rng=jax.random.PRNGKey(0),
        batch_size=args.batch_size,
        cond=cond[:n] if cond is not None else None,
        variable_set_sizes=True,
        mask=mask[:n],
        normalized_data=dm.means is not None,
        normalize_sigma=getattr(dm, "normalize_sigma", 5),
        means=dm.means,
        stds=dm.stds,
        ode_steps=args.ode_steps,
    )
    print(f"[generate_jetclass] generated {gen.shape} in {gen_time:.1f}s")

    names_part = getattr(dm, "names_particle_features", None)
    names_cond = getattr(dm, "names_conditioning", None)
    with h5py.File(args.out, "w") as f:
        d = f.create_dataset("part_features", data=gen.astype(np.float32))
        if names_part is not None:
            d.attrs["names_part_features"] = np.asarray(
                [n_.encode() if isinstance(n_, str) else n_ for n_ in names_part]
            )
        f.create_dataset("part_mask", data=mask[:n][..., 0].astype(np.float32))
        if cond is not None:
            d = f.create_dataset("conditioning", data=cond[:n].astype(np.float32))
            if names_cond is not None:
                d.attrs["names_conditioning"] = np.asarray(
                    [n_.encode() if isinstance(n_, str) else n_ for n_ in names_cond]
                )
    print(f"[generate_jetclass] wrote {args.out}")


if __name__ == "__main__":
    main()
