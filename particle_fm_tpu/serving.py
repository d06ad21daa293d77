"""AOT model export for serving: `jax.export` (StableHLO) artifacts.

Beyond the reference (which has no deployment story — its fastest path is
re-instantiating the Lightning module and checkpoint in Python): a trained
run exports its full sampling program — noise draw, ODE/SDE integration,
in-model de-normalization, datamodule-level inverse z-score, masking — as
ONE serialized StableHLO function with zero framework dependencies at load
time (no flax module construction, no config tree, no checkpoint restore;
the weights are baked into the graph as constants, exactly like the
jit-constant binding that won the round-1 throughput ablation, bench.py).

Artifact layout (a directory):

    sampler.stablehlo   jax.export.Exported bytes (versioned serialization,
                        portable across processes/hosts; lowered for the
                        platforms requested at export time)
    meta.yaml           calling convention (arity, shapes, dtypes), sampling
                        protocol (solver, ode_steps, NFE), output semantics
                        (physical units — inverse normalization is baked in),
                        and provenance (run dir, checkpoint, EMA)

Serving:

    fn, meta = serving.load_exported("runs/<run>/exported")
    x = fn(seed, cond_batch, mask_batch)   # physical-space particle clouds

CLI: scripts/export_model.py (export + verify against the live model).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import numpy as np

ARTIFACT_NAME = "sampler.stablehlo"
META_NAME = "meta.yaml"


def make_serve_fn(
    model,
    variables: dict,
    *,
    batch_size: int,
    ode_solver: str = "midpoint",
    ode_steps: int = 100,
    num_points: Optional[int] = None,
    has_cond: bool = False,
    has_mask: bool = False,
    means=None,
    stds=None,
    normalize_sigma: float = 5.0,
    guidance_scale: Optional[float] = None,
) -> Callable:
    """Build the self-contained sampling function to export.

    Signature of the returned fn: (seed, [cond], [mask]) -> samples, where
    seed is a uint32 scalar, cond is (B, C) float32, mask is (B, N, 1)
    float32, and samples are (B, N, F) float32 in PHYSICAL units (the
    datamodule-level inverse z-score — reference utils.py:164-199 semantics,
    x * std/sigma + mean — is part of the graph). The mask re-application
    after de-normalization matches eval/generation.py.

    `guidance_scale` bakes classifier-free guidance (see
    FlowMatchingModel.sample) into the exported program — the doubled-batch
    cond/null forward is part of the compiled graph, so a CFG-tuned sampler
    serves at its chosen w with no client-side involvement. Requires a
    conditional model (trained with model.cond_dropout > 0 for meaningful
    null-token behavior).
    """
    import jax
    import jax.numpy as jnp

    means_a = None if means is None else jnp.asarray(np.asarray(means), jnp.float32)
    stds_a = None if stds is None else jnp.asarray(np.asarray(stds), jnp.float32)

    def serve(seed, *args):
        idx = 0
        cond = mask = None
        if has_cond:
            cond, idx = args[idx], idx + 1
        if has_mask:
            mask = args[idx]
        rng = jax.random.PRNGKey(seed)
        x = model.sample(
            variables,
            rng,
            n_samples=batch_size,
            cond=cond,
            mask=mask,
            ode_solver=ode_solver,
            ode_steps=ode_steps,
            num_points=num_points,
            guidance_scale=guidance_scale,
        )
        if means_a is not None:
            x = x * (stds_a / normalize_sigma) + means_a
        if mask is not None:
            x = x * mask
        return x

    return serve


def export_sampler(
    model,
    variables: dict,
    *,
    batch_size: int,
    num_points: int,
    features: int,
    cond_dim: Optional[int] = None,
    use_mask: bool = True,
    ode_solver: str = "midpoint",
    ode_steps: int = 100,
    means=None,
    stds=None,
    normalize_sigma: float = 5.0,
    platforms: Optional[list[str]] = None,
    guidance_scale: Optional[float] = None,
) -> tuple[bytes, dict]:
    """Trace + lower + serialize the sampling program. Returns (blob, meta)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    has_cond = cond_dim is not None and cond_dim > 0
    if guidance_scale is not None and not has_cond:
        raise ValueError(
            "guidance_scale requires a conditional artifact (cond_dim > 0)"
        )
    serve = make_serve_fn(
        model,
        variables,
        batch_size=batch_size,
        ode_solver=ode_solver,
        ode_steps=ode_steps,
        num_points=num_points,
        has_cond=has_cond,
        has_mask=use_mask,
        means=means,
        stds=stds,
        normalize_sigma=normalize_sigma,
        guidance_scale=guidance_scale,
    )
    specs = [jax.ShapeDtypeStruct((), jnp.uint32)]
    if has_cond:
        specs.append(jax.ShapeDtypeStruct((batch_size, cond_dim), jnp.float32))
    if use_mask:
        specs.append(jax.ShapeDtypeStruct((batch_size, num_points, 1), jnp.float32))
    exported = jexport.export(jax.jit(serve), platforms=platforms)(*specs)
    meta = {
        "batch_size": int(batch_size),
        "num_points": int(num_points),
        "features": int(features),
        "cond_dim": int(cond_dim) if has_cond else 0,
        "use_mask": bool(use_mask),
        "ode_solver": str(ode_solver),
        "ode_steps": int(ode_steps),
        "normalize_sigma": float(normalize_sigma),
        "guidance_scale": (
            float(guidance_scale) if guidance_scale is not None else None
        ),
        "output_units": "physical" if means is not None else "model",
        # per-chunk seed derivation used by serve_batches for this artifact
        # (ADVICE r4: recorded so clients/evals can tell which streams an
        # artifact serves): hash_v1 = SeedSequence([seed, chunk]); the
        # pre-2026-08 scheme add_v0 (seed + chunk) is still honored when an
        # older meta.yaml names it.
        "seed_scheme": "hash_v1",
        "platforms": list(exported.platforms),
        "args": ["seed:uint32[]"]
        + (["cond:float32[%d,%d]" % (batch_size, cond_dim)] if has_cond else [])
        + (["mask:float32[%d,%d,1]" % (batch_size, num_points)] if use_mask else []),
    }
    return exported.serialize(), meta


def save_exported(out_dir: str, blob: bytes, meta: dict) -> str:
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT_NAME), "wb") as f:
        f.write(blob)
    with open(os.path.join(out_dir, META_NAME), "w") as f:
        yaml.safe_dump(meta, f, sort_keys=False)
    return out_dir


def load_exported(path: str) -> tuple[Callable, dict]:
    """Load an artifact directory (or a bare .stablehlo file) for serving.

    Returns (fn, meta); fn(seed, [cond], [mask]) executes the compiled
    program on the local backend — no model code or checkpoint needed.
    """
    from jax import export as jexport

    if os.path.isdir(path):
        blob_path = os.path.join(path, ARTIFACT_NAME)
        meta_path = os.path.join(path, META_NAME)
    else:
        blob_path, meta_path = path, None
    with open(blob_path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    meta: dict[str, Any] = {}
    if meta_path and os.path.exists(meta_path):
        import yaml

        with open(meta_path) as f:
            meta = yaml.safe_load(f)

    def fn(seed, *args):
        import jax.numpy as jnp

        return exported.call(jnp.asarray(seed, jnp.uint32), *args)

    fn.exported = exported  # expose for introspection (platforms, mlir)
    return fn, meta


def serve_batches(
    fn: Callable,
    meta: dict,
    n_samples: int,
    cond: Optional[np.ndarray] = None,
    mask: Optional[np.ndarray] = None,
    seed: int = 0,
) -> np.ndarray:
    """Padded-batch driver mirroring eval/generation.py for exported fns."""
    bs = int(meta["batch_size"])
    chunks = []
    for i, lo in enumerate(range(0, n_samples, bs)):
        hi = min(lo + bs, n_samples)
        n_real = hi - lo

        def pad(a):
            if a is None:
                return None
            sl = a[lo:hi]
            if n_real == bs:
                return sl
            return np.concatenate([sl] + [sl[:1]] * (bs - n_real), axis=0)

        # Per-chunk seeds are derived by hashing (seed, chunk index) rather
        # than `seed + i`: with a raw additive stride, request seed=s chunk 1
        # would collide with seed=s+1 chunk 0 (identical RNG stream for equal
        # cond), weakening seed independence across adjacent API calls. The
        # scheme is recorded in the artifact meta (seed_scheme); artifacts
        # exported before the scheme key default to hash_v1, while an
        # explicit add_v0 reproduces the legacy additive streams.
        scheme = meta.get("seed_scheme", "hash_v1")
        if scheme == "add_v0":
            chunk_seed = (int(seed) + i) % (2**32)
        elif scheme == "hash_v1":
            chunk_seed = np.random.SeedSequence(
                [int(seed) % (2**64), i]
            ).generate_state(1)[0]
        else:
            raise ValueError(f"unknown seed_scheme {scheme!r} in artifact meta")
        args = [np.uint32(chunk_seed)]
        if meta.get("cond_dim", 0):
            args.append(pad(cond).astype(np.float32))
        if meta.get("use_mask", False):
            args.append(pad(mask).astype(np.float32))
        chunks.append(np.asarray(fn(*args))[:n_real])
    return np.concatenate(chunks, axis=0)
