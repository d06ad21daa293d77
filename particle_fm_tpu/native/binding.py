"""ctypes binding to the fastjet_lite C++ clustering library.

Builds the shared library on first use (g++, ~1 s) and caches it next to the
source. API mirrors what the reference obtains from fastjet/pyjet
(utils/jet_substructure.py, utils/lhco_utils.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fastjet_lite")
_LIB_PATH = os.path.join(_DIR, "libfastjet_lite.so")
_lib = None


def _build() -> None:
    subprocess.run(["make", "-s", "-C", _DIR], check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_DIR, "cluster.cpp")
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.cluster_events.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        dp, ip, ip, ctypes.c_int,
    ]
    lib.cluster_events.restype = None
    lib.exclusive_kt_axes_events.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, dp, ip,
    ]
    lib.exclusive_kt_axes_events.restype = None
    lib.kt_split_scales_events.argtypes = [
        dp, dp, dp, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, dp,
    ]
    lib.kt_split_scales_events.restype = None
    _lib = lib
    return lib


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cluster_events(
    pt: np.ndarray,
    eta: np.ndarray,
    phi: np.ndarray,
    R: float = 1.0,
    p: float = -1.0,
    min_pt: float = 0.0,
    max_jets: int = 10,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cluster padded events (B, N) with the generalized-kt algorithm.

    p = -1 anti-kt, 0 C/A, 1 kt. Zero-pt entries are padding.
    Returns (jets (B, max_jets, [pt, y, phi, m]), n_jets (B,),
             const_jet (B, N) jet index per particle or -1).
    """
    lib = get_lib()
    pt = np.ascontiguousarray(pt, np.float64)
    eta = np.ascontiguousarray(eta, np.float64)
    phi = np.ascontiguousarray(phi, np.float64)
    b, n = pt.shape
    jets = np.zeros((b, max_jets, 4), np.float64)
    njets = np.zeros(b, np.int32)
    const_jet = np.zeros((b, n), np.int32)
    lib.cluster_events(
        _as_c(pt), _as_c(eta), _as_c(phi), b, n,
        R, p, min_pt,
        _as_c(jets),
        njets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        const_jet.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_jets,
    )
    return jets, njets, const_jet


def kt_split_scales(
    pt: np.ndarray, eta: np.ndarray, phi: np.ndarray, R: float = 1.0, n_scales: int = 2
) -> np.ndarray:
    """kt splitting scales per event: out[:, 0] = d12 (2->1 merge),
    out[:, 1] = d23, ... (sqrt of the exclusive-kt merge distance)."""
    lib = get_lib()
    pt = np.ascontiguousarray(pt, np.float64)
    eta = np.ascontiguousarray(eta, np.float64)
    phi = np.ascontiguousarray(phi, np.float64)
    b, n = pt.shape
    out = np.zeros((b, n_scales), np.float64)
    lib.kt_split_scales_events(
        _as_c(pt), _as_c(eta), _as_c(phi), b, n, R, n_scales, _as_c(out)
    )
    return out


def exclusive_kt_axes(
    pt: np.ndarray, eta: np.ndarray, phi: np.ndarray, R: float = 1.0, n_axes: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """WTA exclusive-kt axes per event for N-subjettiness.

    Returns (axes (B, n_axes, [y, phi]), n_axes_found (B,))."""
    lib = get_lib()
    pt = np.ascontiguousarray(pt, np.float64)
    eta = np.ascontiguousarray(eta, np.float64)
    phi = np.ascontiguousarray(phi, np.float64)
    b, n = pt.shape
    axes = np.zeros((b, n_axes, 2), np.float64)
    found = np.zeros(b, np.int32)
    lib.exclusive_kt_axes_events(
        _as_c(pt), _as_c(eta), _as_c(phi), b, n, R, n_axes,
        _as_c(axes), found.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return axes, found
