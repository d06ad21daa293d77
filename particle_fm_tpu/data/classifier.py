"""Classifier datamodules: mix real vs generated samples with labels.

Parity: particle_fm/data/classifier_datamodule.py:20 (LHCO point clouds),
hl_classifier_datamodule.py:12 (high-level features),
jetclass_classifier_datamodule.py (JetClass). One parametrized module covers
the pattern: label 1 = real, label 0 = generated, shuffled, split, with
labels delivered through the `cond` slot of the uniform (x, mask, cond)
batch contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from particle_fm_tpu.data.base import ArrayDataModule, Split


@dataclass
class GenVsRealDataModule(ArrayDataModule):
    """Binary classifier data from in-memory real/generated arrays.

    Arrays can be set data (B, N, F) with masks, or flat (B, F) with
    mask=None. Sources may also be h5 files with datasets x[, mask]."""

    real: Optional[np.ndarray] = None
    real_mask: Optional[np.ndarray] = None
    gen: Optional[np.ndarray] = None
    gen_mask: Optional[np.ndarray] = None
    real_file: Optional[str] = None
    gen_file: Optional[str] = None
    val_fraction: float = 0.15
    test_fraction: float = 0.15
    normalize: bool = True
    # super-set grouping: rows [i*S, (i+1)*S) belong to one event (e.g. the
    # two jets of an LHCO dijet); shuffling/splitting keeps groups contiguous
    # so EPiCDiscriminator(num_sup_sets=S) sees intact events. batch_size
    # must be a multiple of S.
    num_sup_sets: int = 1
    seed: int = 0

    @staticmethod
    def _from_file(path):
        import h5py

        with h5py.File(path, "r") as f:
            x = np.asarray(f["x"])
            mask = np.asarray(f["mask"]) if "mask" in f else None
        return x, mask

    def setup(self) -> None:
        if self.train is not None:
            return
        real, real_mask = self.real, self.real_mask
        gen, gen_mask = self.gen, self.gen_mask
        if real is None and self.real_file:
            real, real_mask = self._from_file(self.real_file)
        if gen is None and self.gen_file:
            gen, gen_mask = self._from_file(self.gen_file)
        if real is None or gen is None:
            raise ValueError("need real+gen arrays or files")

        s = max(self.num_sup_sets, 1)
        if self.batch_size % s:
            raise ValueError(f"batch_size must be a multiple of num_sup_sets={s}")
        n = min(len(real), len(gen))
        n -= n % s  # keep whole events
        x = np.concatenate([real[:n], gen[:n]], axis=0).astype(np.float32)
        labels = np.concatenate([np.ones(n), np.zeros(n)]).astype(np.float32)[:, None]
        if real_mask is not None and gen_mask is not None:
            mask = np.concatenate([real_mask[:n], gen_mask[:n]], axis=0).astype(np.float32)
        else:
            mask = None

        rs = np.random.RandomState(self.seed)
        # permute whole super-set groups so event jets stay adjacent
        n_groups = len(x) // s
        perm = (rs.permutation(n_groups)[:, None] * s + np.arange(s)[None, :]).reshape(-1)
        x, labels = x[perm], labels[perm]
        if mask is not None:
            mask = mask[perm]

        if self.normalize:
            if mask is not None:
                from particle_fm_tpu.data.utils import masked_mean_std

                self.means, self.stds = masked_mean_std(x, mask)
                stds = np.where(self.stds == 0, 1.0, self.stds)
                x = ((x - self.means) / stds * mask).astype(np.float32)
            else:
                self.means = x.mean(axis=0)
                self.stds = np.where(x.std(axis=0) == 0, 1.0, x.std(axis=0))
                x = ((x - self.means) / self.stds).astype(np.float32)

        n_total = len(x)
        n_val = int(self.val_fraction * n_total)
        n_test = int(self.test_fraction * n_total)
        lo, hi = n_total - n_val - n_test, n_total - n_test
        lo -= lo % s  # split on event boundaries
        hi -= hi % s

        def sl(a, start, end):
            return a[start:end] if a is not None else None

        self.train = Split(x[:lo], sl(mask, 0, lo), labels[:lo])
        self.val = Split(x[lo:hi], sl(mask, lo, hi), labels[lo:hi])
        self.test = Split(x[hi:], sl(mask, hi, n_total), labels[hi:])
        self.tensor_test = self.test.x
        self.mask_test = self.test.mask
        self.tensor_conditioning_test = self.test.cond
        self.variable_jet_sizes = mask is not None

    def _batches(self, split, rng, drop_last):
        """Group-preserving batching: shuffle events (groups of num_sup_sets
        rows), not individual rows."""
        s = max(self.num_sup_sets, 1)
        if s == 1:
            yield from super()._batches(split, rng, drop_last)
            return
        n_groups = len(split) // s
        order = np.arange(n_groups)
        if rng is not None:
            rng.shuffle(order)
        idx = (order[:, None] * s + np.arange(s)[None, :]).reshape(-1)
        stop = len(idx) - (len(idx) % self.batch_size) if drop_last else len(idx)
        for start in range(0, stop, self.batch_size):
            sel = idx[start : start + self.batch_size]
            mask = split.mask[sel] if split.mask is not None else None
            cond = split.cond[sel] if split.cond is not None else None
            yield split.x[sel], mask, cond
