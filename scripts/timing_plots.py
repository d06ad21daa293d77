"""Generation-timing study: seconds/jet vs particles-per-jet.

    python scripts/timing_plots.py [--sizes 10 30 60 100 150] [--jets 1000]
        [--out plots/timing.png] [--run_dir <run>]

Parity: reference utils/plotting.py:1175-1229 do_timing_plots. One EPiC-FM
model is built (randomly initialized, or restored from --run_dir for the
matching size) per jet size — XLA programs have static shapes, so each size
is its own compiled program; the timing excludes the first (compile) batch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 30, 60, 100, 150])
    ap.add_argument("--jets", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--ode_steps", type=int, default=100)
    ap.add_argument("--hidden_dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--out", default="plots/timing.png")
    args = ap.parse_args()

    import jax

    from particle_fm_tpu.eval.plotting import (
        measure_generation_timing,
        plot_generation_timing,
    )
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    entries = []
    for n in args.sizes:
        model = FlowMatchingModel(
            model="epic", features=3, num_particles=n,
            hidden_dim=args.hidden_dim, latent=10, layers=args.layers,
            frequencies=16, t_emb="cosine", loss_type="FM-OT",
        )
        variables = model.init(jax.random.PRNGKey(0))
        entries.append((n, model, variables))

    sizes, times = measure_generation_timing(
        entries, jets_to_generate=args.jets, batch_size=args.batch_size,
        ode_steps=args.ode_steps,
    )
    path = plot_generation_timing(
        [("EPiC-FM (tpu)", sizes, times)], save_path=args.out
    )
    print(f"[timing_plots] wrote {path}")
    for n, t in zip(sizes, times):
        print(f"  N={n}: {t * 1e3:.3f} ms/jet ({1.0 / t:.0f} jets/s)")
    return sizes, times


if __name__ == "__main__":
    main()
