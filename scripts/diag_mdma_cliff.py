"""Diagnose the MDMA B=256 throughput cliff (VERDICT r3 item 3).

Round-3 measured sampling throughput (v5e, NFE=100): B=256 hits 2154 jets/s
while every neighbor (192/224/288/384) lands at 1150-1670 — an +83% cliff at
exactly one batch size. This script isolates the effect at the vector-field
eval level, dumps the optimized HLO per batch size, and diffs the
fusion/layout structure to pin the cause.

Usage: python scripts/diag_mdma_cliff.py [--batches 192,224,256,288,320]
Writes /tmp/mdma_hlo_B{B}.txt and prints a per-batch timing + HLO-stat table.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp


def make_mdma():
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    return FlowMatchingModel(
        model="mdma", features=3, num_particles=150, frequencies=16,
        t_emb="cosine", add_time_to_input=False, loss_type="CFM",
        dtype=jnp.bfloat16,
        net_config=dict(latent=16, hidden_dim=256, layers=8, num_heads=8,
                        t_local_cat=True, t_global_cat=True),
    )


def hlo_stats(text: str) -> dict:
    """Aggregate op-kind counts + layout oddities from optimized HLO."""
    stats = collections.Counter()
    for line in text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.-]+ = (\w+)", line)
        if not m:
            continue
        kind = m.group(1)
        if kind.startswith("fusion"):
            fkind = re.search(r'kind=(\w+)', line)
            stats[f"fusion:{fkind.group(1) if fkind else '?'}"] += 1
        elif kind in ("copy", "transpose", "bitcast", "reshape", "convert",
                      "dot", "convolution", "all-reduce", "custom-call"):
            stats[kind] += 1
    return dict(stats)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="192,224,256,288,320")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inner", type=int, default=60,
                    help="vf evals per dispatch (scan, amortizes relay latency)")
    args = ap.parse_args()

    model = make_mdma()
    variables = model.init(jax.random.PRNGKey(0))
    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        mask = jnp.ones((b, 150, 1))
        x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 150, 3))
        t0c = jnp.full((b,), 0.5)

        def vf(t, x):
            return model.vector_field(variables, t, x, mask=mask)

        @jax.jit
        def loop(x):
            def body(c, i):
                return vf(t0c + 0.0 * i, c).astype(c.dtype), None

            out, _ = jax.lax.scan(body, x, jnp.arange(args.inner))
            return out

        compiled = jax.jit(vf).lower(t0c, x0).compile()
        text = compiled.as_text()
        path = f"/tmp/mdma_hlo_B{b}.txt"
        with open(path, "w") as f:
            f.write(text)

        float(jnp.sum(loop(x0)))  # warm-up (compile + first exec)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(loop(x0)))  # host fence (axon: only reliable sync)
            best = min(best, time.perf_counter() - t0)
        us_per_jet_eval = best / args.inner / b * 1e6
        jets_100 = 1.0 / (us_per_jet_eval * 1e-6 * 100)
        stats = hlo_stats(text)
        rows.append((b, us_per_jet_eval, jets_100, stats, path))
        print(f"B={b:4d}: {us_per_jet_eval:7.3f} us/jet/eval "
              f"(~{jets_100:7.1f} jets/s @NFE100)  {path}")

    print("\nHLO op-kind stats per batch:")
    keys = sorted({k for _, _, _, s, _ in rows for k in s})
    header = "batch " + " ".join(f"{k:>16}" for k in keys)
    print(header)
    for b, _, _, s, _ in rows:
        print(f"{b:5d} " + " ".join(f"{s.get(k, 0):16d}" for k in keys))


if __name__ == "__main__":
    main()
