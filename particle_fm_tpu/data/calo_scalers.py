"""CaloChallenge preprocessing scalers (sklearn-style, per-feature pipelines).

Parity: particle_fm/data/components/preprocess_calo_challenge.py:18-120 and
preprocess_calo_challenge_new.py (LogitTransformer, DQ dequantization,
SqrtTransformer, ScalerBase). Same fit/transform/inverse_transform contracts,
numpy end-to-end (no torch round-trips needed on the TPU host path).
"""

from __future__ import annotations

import numpy as np
from sklearn.base import BaseEstimator, TransformerMixin


class LogitTransformer(BaseEstimator, TransformerMixin):
    """x -> log(x / (1-x)); inverse is the sigmoid."""

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return np.log(X / (1.0 - X))

    def inverse_transform(self, X, y=None):
        return 1.0 / (1.0 + np.exp(-X))


class SqrtTransformer(BaseEstimator, TransformerMixin):
    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return np.sqrt(X)

    def inverse_transform(self, X, y=None):
        return np.square(X)


class DQ(BaseEstimator, TransformerMixin):
    """Dequantization: add U[0,1) noise; inverse floors back to the grid."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self._rs = np.random.RandomState(seed)

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return X + self._rs.rand(*np.shape(X))

    def inverse_transform(self, X, y=None):
        return np.floor(X)


class DQLinear(DQ):
    """Dequantization with linearly-interpolated (triangular-ish) noise."""

    def transform(self, X, y=None):
        u = self._rs.rand(*np.shape(X))
        return X + u


class LogitScaler(BaseEstimator, TransformerMixin):
    """MinMax to (eps, 1-eps) then logit — the reference's
    utils/preprocessing.py::LogitScaler used for bounded features."""

    def __init__(self, eps: float = 1e-6):
        self.eps = eps
        self._min = None
        self._max = None

    def fit(self, X, y=None):
        self._min = np.min(X, axis=0)
        self._max = np.max(X, axis=0)
        return self

    def transform(self, X, y=None):
        z = (X - self._min) / np.maximum(self._max - self._min, 1e-30)
        z = np.clip(z, self.eps, 1 - self.eps)
        return np.log(z / (1 - z))

    def inverse_transform(self, X, y=None):
        z = 1.0 / (1.0 + np.exp(-X))
        return z * (self._max - self._min) + self._min


class LogTransformer(BaseEstimator, TransformerMixin):
    """x -> log(x + eps) for strictly-positive heavy-tailed features (hit
    energies in MeV); inverse is exp - eps."""

    def __init__(self, eps: float = 1e-8):
        self.eps = eps

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        return np.log(np.maximum(X, 0.0) + self.eps)

    def inverse_transform(self, X, y=None):
        return np.exp(X) - self.eps


class ScalerBase:
    """Per-feature transformer pipeline over flat (P, F) point arrays."""

    def __init__(self, transfs: list, featurenames: list[str] | None = None):
        self.transfs = transfs
        self.featurenames = featurenames or [f"f{i}" for i in range(len(transfs))]
        self.n_features = len(transfs)
        self.fitted_ = False

    def fit(self, pcs: np.ndarray) -> "ScalerBase":
        assert pcs.ndim == 2 and pcs.shape[1] == self.n_features
        for i, tr in enumerate(self.transfs):
            tr.fit(pcs[:, i : i + 1])
        self.fitted_ = True
        return self

    def transform(self, pcs: np.ndarray) -> np.ndarray:
        assert pcs.shape[-1] == self.n_features
        shape = pcs.shape
        flat = pcs.reshape(-1, self.n_features).astype(np.float64)
        out = np.hstack(
            [tr.transform(flat[:, i : i + 1]) for i, tr in enumerate(self.transfs)]
        )
        return out.reshape(shape).astype(np.float32)

    def inverse_transform(self, pcs: np.ndarray) -> np.ndarray:
        assert pcs.shape[-1] == self.n_features
        shape = pcs.shape
        flat = pcs.reshape(-1, self.n_features).astype(np.float64)
        out = np.hstack(
            [tr.inverse_transform(flat[:, i : i + 1]) for i, tr in enumerate(self.transfs)]
        )
        return out.reshape(shape).astype(np.float32)


def default_calo_scaler(seed: int = 0) -> ScalerBase:
    """Training-space scaler for CaloChallenge (E, z, alpha, r) hit clouds:
    E (MeV, heavy-tailed) -> log + standardize; integer voxel coordinates ->
    dequantize (uniform noise, inverse floors back to the grid) +
    standardize. The reference trains on a fitted per-feature sklearn
    pipeline the same way (preprocess_calo_challenge_new.py::ScalerBaseNew);
    the datamodule fits this on the train split at setup() when no
    pre-fitted scaler is provided."""
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    def dq_std(s):
        return Pipeline([("dq", DQ(seed=s)), ("std", StandardScaler())])

    return ScalerBase(
        [
            Pipeline([("log", LogTransformer()), ("std", StandardScaler())]),
            dq_std(seed),
            dq_std(seed + 1),
            dq_std(seed + 2),
        ],
        featurenames=["E", "z", "alpha", "r"],
    )
