"""Jet substructure observables: N-subjettiness, energy correlators, D2.

Parity: particle_fm/utils/jet_substructure.py:220-700 (pyjet/fastjet-based
Substructure / JetSubstructure classes and dump_hlvs). The clustering runs in
the in-repo fastjet_lite C++ library (native/binding.py): exclusive-kt WTA
axes for tau_N, anti-kt/kt re-clustering where needed. The O(N^2)/O(N^3)
energy-correlator sums run as batched einsums on the accelerator.

Conventions (matching the reference's fastjet config):
  tau_N = sum_i pt_i * min_k(dR(i, axis_k)) / (R0 * sum_i pt_i),
  axes from exclusive kt (WTA scheme), R0 = 0.8 default;
  e2 = sum_{i<j} z_i z_j theta_ij^beta, e3 analogous (beta = 1),
  D2 = e3 / e2^3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.data.utils import get_jet_data
from particle_fm_tpu.native.binding import exclusive_kt_axes, kt_split_scales


@functools.partial(jax.jit, static_argnames=("beta",))
def _ecfs_device(pt, eta, phi, mask, beta: float = 1.0):
    """e2, e3 for padded clouds — triple sum via einsum on the MXU."""
    z = pt * mask
    z = z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-30)
    deta = eta[:, :, None] - eta[:, None, :]
    dphi = phi[:, :, None] - phi[:, None, :]
    dphi = jnp.mod(dphi + jnp.pi, 2 * jnp.pi) - jnp.pi
    theta = jnp.sqrt(deta**2 + dphi**2)
    if beta != 1.0:
        theta = theta**beta
    e2 = 0.5 * jnp.einsum("bij,bi,bj->b", theta, z, z)
    # e3 via an explicit pairwise path: D_jk = sum_i z_i theta_ij theta_ik
    # is a batched matmul (O(N^2) memory); a naive 6-operand einsum lets
    # opt_einsum pick an outer-product path with an O(N^3) intermediate
    # (56 GB at B=4096, N=150 — exceeds HBM)
    d_jk = jnp.einsum("bij,bik,bi->bjk", theta, theta, z)
    e3 = (1.0 / 6.0) * jnp.einsum("bjk,bjk,bj,bk->b", d_jk, theta, z, z)
    return e2, e3


def _tau(pt, eta, phi, mask, axes, n_found, n_axes, R0):
    """tau_N from WTA axes (host numpy; O(B*N*n_axes))."""
    d_eta = eta[:, :, None] - axes[:, None, :, 0]
    d_phi = phi[:, :, None] - axes[:, None, :, 1]
    d_phi = np.mod(d_phi + np.pi, 2 * np.pi) - np.pi
    dr = np.sqrt(d_eta**2 + d_phi**2)
    # mask out axes beyond n_found
    ax_ok = np.arange(axes.shape[1])[None, :] < n_found[:, None]
    dr = np.where(ax_ok[:, None, :], dr, np.inf)
    min_dr = dr[:, :, :n_axes].min(axis=-1)
    w = pt * mask
    denom = R0 * np.maximum(w.sum(axis=1), 1e-30)
    tau = (w * np.where(np.isfinite(min_dr), min_dr, 0.0)).sum(axis=1) / denom
    return tau


def compute_substructure(
    particles: np.ndarray,
    mask: np.ndarray | None = None,
    R0: float = 0.8,
    beta: float = 1.0,
) -> dict:
    """Substructure for (B, N, [eta, phi, pt]) clouds (relative coords fine).

    Returns dict with jet kinematics (pt, mass), tau1/2/3, tau21, tau32,
    d2. Padded entries must have pt == 0 (or pass mask)."""
    particles = np.asarray(particles, np.float64)
    eta, phi, pt = particles[..., 0], particles[..., 1], particles[..., 2]
    if mask is None:
        mask = (pt > 0).astype(np.float64)
    else:
        mask = np.asarray(mask, np.float64)
        if mask.ndim == 3:
            mask = mask[..., 0]
    pt = pt * mask

    # jet kinematics from the p4 sum — consts as (pt, y, phi)
    jets = get_jet_data(np.stack([pt, eta, phi], axis=-1))

    # WTA exclusive-kt axes from the native clusterer. Each tau_N uses its
    # OWN exclusive-kt-to-N clustering (reference rclst.exclusive_jets(N),
    # jet_substructure.py:248-258): the exclusive-2 axes are generally not a
    # subset of the exclusive-3 axes.
    axes1, found1 = exclusive_kt_axes(pt, eta, phi, R=R0, n_axes=1)
    axes2, found2 = exclusive_kt_axes(pt, eta, phi, R=R0, n_axes=2)
    axes3, found3 = exclusive_kt_axes(pt, eta, phi, R=R0, n_axes=3)
    tau1 = _tau(pt, eta, phi, mask, axes1, found1, 1, R0)
    tau2 = _tau(pt, eta, phi, mask, axes2, found2, 2, R0)
    tau3 = _tau(pt, eta, phi, mask, axes3, found3, 3, R0)

    e2, e3 = _ecfs_device(
        jnp.asarray(pt, jnp.float32),
        jnp.asarray(eta, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(mask, jnp.float32),
        beta=beta,
    )
    e2 = np.asarray(e2, np.float64)
    e3 = np.asarray(e3, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        d2 = np.where(e2 > 0, e3 / np.maximum(e2, 1e-30) ** 3, 0.0)
        tau21 = np.where(tau1 > 0, tau2 / np.maximum(tau1, 1e-30), 0.0)
        tau32 = np.where(tau2 > 0, tau3 / np.maximum(tau2, 1e-30), 0.0)

    # kt splitting scales d12/d23 (reference jet_substructure.py:86-181)
    splits = kt_split_scales(pt, eta, phi, R=R0, n_scales=2)

    return {
        "jet_pt": jets[:, 0],
        "jet_mass": jets[:, 3],
        "tau1": tau1,
        "tau2": tau2,
        "tau3": tau3,
        "tau21": tau21,
        "tau32": tau32,
        "e2": e2,
        "e3": e3,
        "d2": d2,
        "d12": splits[:, 0],
        "d23": splits[:, 1],
    }


def dump_hlvs(particles: np.ndarray, path: str, mask: np.ndarray | None = None,
              R0: float = 0.8) -> dict:
    """Compute high-level variables and write them to an h5 file.

    Parity: utils/jet_substructure.py:400-557 (dump_hlvs -> h5)."""
    import h5py

    hlvs = compute_substructure(particles, mask=mask, R0=R0)
    with h5py.File(path, "w") as f:
        for k, v in hlvs.items():
            f.create_dataset(k, data=v)
    return hlvs
