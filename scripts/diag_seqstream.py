"""Microbenchmark the seq-stream building blocks of the transformer family.

Round-4 finding: droid cross-attention's vf eval at B=640 is ~11.4 ms and
stays ~9-14 ms no matter which component (attention / dense / LN) is
removed — the droid full transformer shows the same ~12 ms floor with its
attention removed (r3). The cost is in the shared scaffolding, not the
labeled compute. This script times isolated stacks of increasing realism on
the same (640, 150, C) stream to find the floor's origin.

Usage: python scripts/diag_seqstream.py [--batch 640] [--inner 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from flax import linen as nn


def timeit(fn, x0, inner, reps=3):
    @jax.jit
    def loop(x):
        def body(c, _):
            return fn(c).astype(c.dtype), None

        out, _ = jax.lax.scan(body, x, jnp.arange(inner))
        return out

    float(jnp.sum(loop(x0)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x0)))
        best = min(best, time.perf_counter() - t0)
    return best / inner * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=640)
    ap.add_argument("--inner", type=int, default=40)
    args = ap.parse_args()
    B, L, C, H = args.batch, 150, 128, 256
    dt = jnp.bfloat16
    x0 = jax.random.normal(jax.random.PRNGKey(0), (B, L, C), dt)

    results = {}

    # 1. plain flax: 8 x [LN -> Dense(256) -> lrelu -> Dense(128) -> +res]
    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(8):
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"ln{i}")(x)
                h = nn.Dense(H, dtype=dt, name=f"up{i}")(h)
                h = jax.nn.leaky_relu(h, 0.01)
                x = x + nn.Dense(C, dtype=dt, name=f"dn{i}")(h)
            return x

    m = Plain()
    v = m.init(jax.random.PRNGKey(1), x0)
    results["plain_8x_ln_mlp"] = timeit(lambda x: m.apply(v, x), x0, args.inner)

    # 2. repo DenseNetwork (hddn 256, lrelu, layernorm) x8 with residual
    from particle_fm_tpu.nets.transformer import DenseNetwork

    class RepoDense(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(8):
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"ln{i}")(x)
                x = x + DenseNetwork(
                    outp_dim=C, dtype=dt, name=f"dense{i}",
                    hddn_dim=H, act_h="lrlu", nrm="layer",
                )(h, None, True)
            return x

    m2 = RepoDense()
    v2 = m2.init(jax.random.PRNGKey(1), x0)
    results["repo_8x_densenetwork"] = timeit(lambda x: m2.apply(v2, x), x0, args.inner)

    # 3. repo DenseNetwork with a per-set ctxt (WNDenseSplit routing)
    ctxt = jax.random.normal(jax.random.PRNGKey(2), (B, 64), dt)

    class RepoDenseCtxt(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(8):
                h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"ln{i}")(x)
                x = x + DenseNetwork(
                    outp_dim=C, ctxt_dim=64, dtype=dt, name=f"dense{i}",
                    hddn_dim=H, act_h="lrlu", nrm="layer",
                )(h, ctxt, True)
            return x

    m3 = RepoDenseCtxt()
    v3 = m3.init(jax.random.PRNGKey(1), x0)
    results["repo_8x_dense_ctxt"] = timeit(lambda x: m3.apply(v3, x), x0, args.inner)

    # 4. pure LN x 32 (the LN count of the 8-pair CA encoder)
    class LNOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(32):
                x = nn.LayerNorm(epsilon=1e-5, dtype=dt, name=f"ln{i}")(x)
            return x

    m4 = LNOnly()
    v4 = m4.init(jax.random.PRNGKey(1), x0)
    results["ln_x32"] = timeit(lambda x: m4.apply(v4, x), x0, args.inner)

    # 5. pure matmul chain: 16 x Dense(256)->Dense(128), no LN/residual
    class MatmulOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(8):
                x = nn.Dense(C, dtype=dt, name=f"dn{i}")(
                    nn.Dense(H, dtype=dt, name=f"up{i}")(x)
                )
            return x

    m5 = MatmulOnly()
    v5 = m5.init(jax.random.PRNGKey(1), x0)
    results["matmul_16"] = timeit(lambda x: m5.apply(v5, x), x0, args.inner)

    print(f"\nB={B}, stream (B,{L},{C}) bf16, ms per stack eval (best of 3):")
    for k, val in results.items():
        print(f"  {k:>22}: {val:7.3f} ms")


if __name__ == "__main__":
    main()
