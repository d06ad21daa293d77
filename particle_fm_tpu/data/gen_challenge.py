"""GenChallenge (anomaly-detection generative challenge 2023) datamodule.

Parity: particle_fm/data/gen_challenge_datamodule.py:20-474. K-fold .npy
files (`outerdata_kfold_{0..4}.npy` sidebands, `innerdata_kfold_{0..4}.npy`
signal region), column 0 = mjj conditioning, remaining columns = flat
features; fold-indexed train/val/test assignment, optional logit transform,
sigma-scaled z-score, SR twins for downstream anomaly evaluation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from particle_fm_tpu.data.base import ArrayDataModule, Split
from particle_fm_tpu.data.utils import normalize_tensor


# logit preprocessing = the reference's LogitScaler pipeline stage
# (utils/preprocessing.py:67-100): MinMax to (eps, 1-eps) FIT ON THE TRAIN
# SIDEBAND SPLIT, then logit. A bare clip-logit (the pre-round-5
# implementation) degenerates on real-unit features — anything >= 1 maps to
# the constant logit(1-eps), which silently deleted two of the four
# synthetic features from training and made their W1s meaningless.
from particle_fm_tpu.data.calo_scalers import LogitScaler


@dataclass
class GenChallengeDataModule(ArrayDataModule):
    data_dir: str = "data/"
    val_sets: tuple = (3,)
    test_sets: tuple = (4,)
    normalize: bool = True
    normalize_sigma: float = 5
    logit_transform: bool = False
    synthetic: bool = False
    synthetic_num_events: int = 4000
    seed: int = 0

    tensor_train_sr: Optional[np.ndarray] = None
    tensor_val_sr: Optional[np.ndarray] = None
    tensor_test_sr: Optional[np.ndarray] = None
    tensor_conditioning_train_sr: Optional[np.ndarray] = None
    tensor_conditioning_val_sr: Optional[np.ndarray] = None
    tensor_conditioning_test_sr: Optional[np.ndarray] = None

    def _load_fold(self, prefix: str, k: int) -> np.ndarray:
        if self.synthetic:
            rs = np.random.RandomState(self.seed + k + (100 if prefix == "innerdata" else 0))
            n = self.synthetic_num_events // 5
            mjj = (
                rs.uniform(3300, 3700, (n, 1))
                if prefix == "innerdata"
                else rs.uniform(2300, 3300, (n, 1))
            )
            feats = rs.randn(n, 4) * [50, 0.5, 50, 0.5] + [150, 0.3, 200, 0.4]
            return np.concatenate([mjj, feats], axis=-1).astype(np.float32)
        return np.load(os.path.join(self.data_dir, f"{prefix}_kfold_{k}.npy"))

    def setup(self) -> None:
        if self.train is not None:
            return
        outer = [self._load_fold("outerdata", k) for k in range(5)]
        inner = [self._load_fold("innerdata", k) for k in range(5)]
        held = set(self.val_sets) | set(self.test_sets)

        def fold_concat(folds, idxs):
            return np.concatenate([folds[i] for i in idxs], axis=0)

        train_idx = [i for i in range(5) if i not in held]
        splits = {
            "train": (fold_concat(outer, train_idx), fold_concat(inner, train_idx)),
            "val": (fold_concat(outer, self.val_sets), fold_concat(inner, self.val_sets)),
            "test": (fold_concat(outer, self.test_sets), fold_concat(inner, self.test_sets)),
        }

        self.scaler = None
        if self.logit_transform:
            # fit on the train sideband features only (reference
            # gen_challenge_datamodule.py:247 `pipeline.fit(dataset_train)`),
            # with the scaler's epsilon=0.01 feature range
            self.scaler = LogitScaler(eps=0.01)
            self.scaler.fit(splits["train"][0][:, 1:].astype(np.float32))

        data = {}
        for name, (sb, sr) in splits.items():
            x, c = sb[:, 1:].astype(np.float32), sb[:, :1].astype(np.float32)
            xs, cs = sr[:, 1:].astype(np.float32), sr[:, :1].astype(np.float32)
            if self.scaler is not None:
                x = self.scaler.transform(x).astype(np.float32)
                xs = self.scaler.transform(xs).astype(np.float32)
            data[name] = (x, c, xs, cs)
            setattr(self, f"tensor_{name}", x.copy())
            setattr(self, f"tensor_{name}_sr", xs.copy())

        if self.normalize:
            x_tr = data["train"][0]
            self.means = x_tr.mean(axis=0)
            stds = x_tr.std(axis=0)
            self.stds = np.where(stds == 0, 1.0, stds)
            c_tr = data["train"][1]
            self.cond_means = c_tr.mean(axis=0)
            stds_c = c_tr.std(axis=0, ddof=1)
            self.cond_stds = np.where(stds_c == 0, 1.0, stds_c)

            def norm(x):
                return normalize_tensor(x, self.means, self.stds, self.normalize_sigma).astype(np.float32)

            def cnorm(c):
                return normalize_tensor(
                    c, self.cond_means, self.cond_stds, self.normalize_sigma
                ).astype(np.float32)

            for name in data:
                x, c, xs, cs = data[name]
                if name != "test":
                    x, xs = norm(x), norm(xs)
                data[name] = (x, cnorm(c), xs, cnorm(cs))

        for name, (x, c, xs, cs) in data.items():
            setattr(self, f"tensor_conditioning_{name}", c)
            setattr(self, f"tensor_conditioning_{name}_sr", cs)
        self.train = Split(data["train"][0], None, data["train"][1])
        self.val = Split(data["val"][0], None, data["val"][1])
        self.test = Split(data["test"][0], None, data["test"][1])
        self.variable_jet_sizes = False
