"""Batched generation driver.

Parity: particle_fm/utils/data_generation.py:17-174. Batches through the
jitted sampler, inverse-normalizes on the host, re-applies the mask, and
measures wall-clock excluding the first batch (which pays XLA compilation —
same convention as the reference's warm-up exclusion).

TPU adaptation: the remainder batch is PADDED up to `batch_size` (and the
extra samples discarded) rather than run at its ragged size — a ragged last
batch would trigger a full recompilation of the sampler.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.data.utils import inverse_normalize_tensor


def generate_data(
    model,
    variables: dict,
    num_jet_samples: int,
    rng: jax.Array | None = None,
    batch_size: int = 256,
    cond: np.ndarray | None = None,
    variable_set_sizes: bool = False,
    mask: np.ndarray | None = None,
    normalized_data: bool = False,
    normalize_sigma: float = 5,
    means=None,
    stds=None,
    log_pt: bool = False,
    pt_standardization: bool = False,
    shuffle_mask: bool = False,
    verbose: bool = False,
    ode_solver: str = "midpoint",
    ode_steps: int = 100,
    seed: int = 0,
    scaler=None,
    num_points: int | None = None,
    guidance_scale: float | None = None,
) -> tuple[np.ndarray, float]:
    """Sample num_jet_samples sets; returns (data (S, N, F), generation_time).

    generation_time excludes the first batch (compile/warm-up). `num_points`
    pins the generated set size when no mask is used (fixed-size datasets);
    without it the model's own num_particles applies, which silently
    mismatches the data when an experiment config leaves the model at its
    default (observed: 150-particle jets against 30-particle data -> W1M
    off by two orders of magnitude). When a mask is supplied but
    variable_set_sizes is False (fixed-size data with padding masks), the
    mask's particle axis is used as the set size automatically — every call
    site is guarded, not just the ones that pass num_points."""
    if variable_set_sizes and mask is None:
        raise ValueError("Please use mask when using variable_set_sizes=True")
    if num_points is None and mask is not None:
        num_points = int(mask.shape[1])
    if mask is not None and len(mask) != num_jet_samples:
        raise ValueError(
            f"Mask should have the same length as num_jet_samples "
            f"({len(mask)} != {num_jet_samples})"
        )
    if rng is None:
        rng = jax.random.PRNGKey(seed)
    mask_rs = np.random.default_rng(seed)

    # bind the weights once: re-passing the param pytree per batch costs
    # measurable per-leaf dispatch overhead (see bench.py)
    @jax.jit
    def _sample(key, cond_batch, mask_batch):
        return model.sample(
            variables,
            key,
            n_samples=batch_size,
            cond=cond_batch,
            mask=mask_batch,
            ode_solver=ode_solver,
            ode_steps=ode_steps,
            num_points=num_points,
            guidance_scale=guidance_scale,
        )

    n_batches = int(np.ceil(num_jet_samples / batch_size))
    chunks = []
    start_time = None
    elapsed_before_start = 0.0

    for i in range(n_batches):
        lo = i * batch_size
        hi = min(lo + batch_size, num_jet_samples)
        n_real = hi - lo

        def pad(sliced):
            if n_real == batch_size:
                return sliced
            return np.concatenate(
                [sliced] + [sliced[:1]] * (batch_size - n_real), axis=0
            )

        cond_batch = pad(cond[lo:hi]) if cond is not None else None
        if variable_set_sizes:
            if shuffle_mask:
                perm = mask_rs.permutation(len(mask))
                mask_sel = mask[perm][:n_real]
            else:
                mask_sel = mask[lo:hi]
            mask_batch = pad(mask_sel)
        else:
            mask_batch = None
            mask_sel = None

        if i == 1:
            start_time = time.perf_counter()

        rng, sub = jax.random.split(rng)
        out = _sample(
            sub,
            jnp.asarray(cond_batch) if cond_batch is not None else None,
            jnp.asarray(mask_batch) if mask_batch is not None else None,
        )
        batch = np.asarray(out)[:n_real]  # host transfer = sync point

        if normalized_data:
            if pt_standardization:
                # LHCO convention: (eta, phi) standardized with sigma=10,
                # pt with sigma=5 (data_generation.py:105-114)
                batch[..., :2] = inverse_normalize_tensor(
                    batch[..., :2], means[:2], stds[:2], sigma=10
                )
                batch[..., 2] = inverse_normalize_tensor(
                    batch[..., 2:3], means[2:3], stds[2:3], sigma=5
                )[..., 0]
            else:
                batch = inverse_normalize_tensor(batch, means, stds, sigma=normalize_sigma)
            if log_pt:
                batch[..., 2] = 1.0 - np.exp(batch[..., 2])
        if scaler is not None:
            # generate_data_v2 path: sklearn-style pipeline inverse-transform
            # (reference data_generation.py:177-308); applied to real hits only
            if mask_sel is not None:
                keep = mask_sel[..., 0] > 0
                batch[keep] = scaler.inverse_transform(batch[keep])
            else:
                batch = scaler.inverse_transform(batch)
        if variable_set_sizes:
            batch = batch * mask_sel
        chunks.append(batch)

    end_time = time.perf_counter()
    data = np.concatenate(chunks, axis=0)
    generation_time = (end_time - start_time) if start_time is not None else 0.0
    return data, generation_time
