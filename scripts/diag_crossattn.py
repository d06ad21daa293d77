"""Ablation bisection of the droid cross-attention vector-field eval.

Round-3 accounting (docs/RESULTS.md): the family is HBM-bound on per-layer
seq-stream passes — per-layer floor ~0.43 ms matmul-traffic-only vs ~1.25 ms
measured at B=640 — with the 3x gap undiagnosed. This script times the vf
eval with components knocked out (attention core, dense blocks, LayerNorms,
depth) to attribute the gap, then prints a table.

Monkeypatch-based: each variant patches a module __call__, re-inits params
(throughput is weight-independent), measures, and restores.

Usage: python scripts/diag_crossattn.py [--batch 640] [--inner 40]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from flax import linen as nn


def make_ca():
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    return FlowMatchingModel(
        model="droid_fullcrossattention", features=3, num_particles=150,
        frequencies=16, t_emb="cosine", add_time_to_input=True,
        loss_type="FM-OT", dtype=jnp.bfloat16,
        net_config=dict(
            cae_config=dict(
                model_dim=128, num_layers=8,
                mha_config=dict(num_heads=16, do_layer_norm=True,
                                scores_dtype="bfloat16"),
                dense_config=dict(hddn_dim=256, act_h="lrlu", nrm="layer"),
            ),
            node_embd_config=dict(act_h="lrlu", nrm="layer"),
            ctxt_embd_config=dict(outp_dim=64, act_h="lrlu", nrm="layer"),
            outp_embd_config=dict(act_h="lrlu", nrm="layer"),
        ),
    )


@contextlib.contextmanager
def patched(cls, attr, fn):
    orig = getattr(cls, attr)
    setattr(cls, attr, fn)
    try:
        yield
    finally:
        setattr(cls, attr, orig)


def measure(batch: int, inner: int, reps: int = 3) -> float:
    model = make_ca()
    variables = model.init(jax.random.PRNGKey(0))
    mask = jnp.ones((batch, 150, 1))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 150, 3))
    tc = jnp.full((batch,), 0.5)

    @jax.jit
    def loop(x):
        def body(c, i):
            out = model.vector_field(variables, tc + 0.0 * i, c, mask=mask)
            return out.astype(c.dtype), None

        out, _ = jax.lax.scan(body, x, jnp.arange(inner))
        return out

    float(jnp.sum(loop(x0)))  # warm-up
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(loop(x0)))
        best = min(best, time.perf_counter() - t0)
    return best / inner * 1e3  # ms per vf eval


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=640)
    ap.add_argument("--inner", type=int, default=40)
    args = ap.parse_args()

    from particle_fm_tpu.nets import transformer as tr

    results = {}

    def record(name, val):
        results[name] = val
        print(f"  {name}: {val:.3f} ms/eval", flush=True)

    record("full", measure(args.batch, args.inner))

    # 1. attention core -> identity on the query stream (keeps dense blocks)
    def attn_skip(self, q, k=None, v=None, kv_mask=None, attn_bias=None,
                  deterministic=True):
        return q

    with patched(tr.MultiHeadedAttentionBlock, "__call__", attn_skip):
        record("no_attn_block", measure(args.batch, args.inner))

    # 2. square dense blocks -> identity (only the in-layer DenseNetworks are
    # square 128->128; embedders change width and are untouched). A plain
    # (non-compact) patch that creates no submodules sidesteps flax's
    # compact-method binding, which cannot be monkeypatched post-class.
    def dense_skip_square(self, x, ctxt=None, deterministic=True):
        if self.out_dim(x.shape[-1]) == x.shape[-1]:
            return x
        return tr.DenseNetwork.__wrapped_call__(self, x, ctxt, deterministic)

    tr.DenseNetwork.__wrapped_call__ = tr.DenseNetwork.__call__
    with patched(tr.DenseNetwork, "__call__", dense_skip_square):
        record("no_layer_dense", measure(args.batch, args.inner))

    # 3. LayerNorms -> identity everywhere
    def ln_skip(self, x, *a, **k):
        return x

    with patched(nn.LayerNorm, "__call__", ln_skip):
        record("no_layernorm", measure(args.batch, args.inner))

    # 4. both attention and dense skipped (embedders + norms only)
    with patched(tr.MultiHeadedAttentionBlock, "__call__", attn_skip):
        with patched(tr.DenseNetwork, "__call__", dense_skip_square):
            record("norms_embd_only", measure(args.batch, args.inner))
    base = results["full"]
    print(f"\nB={args.batch}, ms per vector-field eval (best of 3):")
    for k, v in results.items():
        print(f"  {k:>18}: {v:7.3f} ms  ({v / base * 100:5.1f}% of full)")
    print(f"  attention share ~ {base - results['no_attn_block']:.3f} ms; "
          f"dense share ~ {base - results['no_layer_dense']:.3f} ms; "
          f"LN share ~ {base - results['no_layernorm']:.3f} ms")


if __name__ == "__main__":
    main()
