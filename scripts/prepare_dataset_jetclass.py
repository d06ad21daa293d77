"""Prepare JetClass training files from raw per-type arrays.

    python scripts/prepare_dataset_jetclass.py --raw_dir <dir> --out_dir data/jetclass
        [--splits 0.7 0.15 0.15] [--features part_etarel part_dphi part_ptrel ...]

Parity: reference scripts/prepare_dataset_jetclass.py + preprocessing_jetclass.py
(which imports a module that no longer exists in the reference — functionality
reconstructed): merge per-jet-type files, compute masked per-feature means/stds
on the train split, standardize, and write the pre-split h5 files the
JetClassDataModule consumes (part_features/part_mask/jet_features/labels +
part_means/part_stds with `names_*` attrs).

Raw input format per jet type: `<raw_dir>/<type>.h5` with datasets
part_features (N, P, F) unstandardized, part_mask (N, P), jet_features (N, J)
and matching names_* attrs (use --synthetic to generate a demo input).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw_dir", default=None)
    ap.add_argument("--out_dir", default="data/jetclass")
    ap.add_argument("--splits", type=float, nargs=3, default=[0.7, 0.15, 0.15])
    ap.add_argument("--synthetic", action="store_true", help="generate demo raw inputs first")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import h5py

    from particle_fm_tpu.data.jetclass import JETCLASS_TYPES, synthetic_jetclass_file
    from particle_fm_tpu.data.utils import masked_mean_std

    raw_dir = args.raw_dir or os.path.join(args.out_dir, "raw")
    if args.synthetic:
        os.makedirs(raw_dir, exist_ok=True)
        for i, jt in enumerate(JETCLASS_TYPES[:3]):
            synthetic_jetclass_file(
                os.path.join(raw_dir, f"{jt}.h5"), num_jets=2000, num_particles=32,
                num_types=3, seed=args.seed + i,
            )
        print(f"[prepare_jetclass] wrote synthetic raw inputs to {raw_dir}")

    files = sorted(
        f for f in os.listdir(raw_dir) if f.endswith(".h5")
    )
    if not files:
        raise FileNotFoundError(f"no raw .h5 files in {raw_dir}")

    parts, masks, jets, labels = [], [], [], []
    names = {}
    for f in files:
        with h5py.File(os.path.join(raw_dir, f), "r") as h:
            parts.append(np.asarray(h["part_features"]))
            masks.append(np.asarray(h["part_mask"]))
            jets.append(np.asarray(h["jet_features"]))
            labels.append(np.asarray(h["labels"]))
            for k in ("part_features", "jet_features", "labels"):
                names[k] = np.asarray(h[k].attrs[f"names_{k}"])

    x = np.concatenate(parts)
    mask = np.concatenate(masks)
    jf = np.concatenate(jets)
    lb = np.concatenate(labels)
    rs = np.random.RandomState(args.seed)
    perm = rs.permutation(len(x))
    x, mask, jf, lb = x[perm], mask[perm], jf[perm], lb[perm]

    n = len(x)
    n_train = int(args.splits[0] * n)
    n_val = int(args.splits[1] * n)
    bounds = {"train": (0, n_train), "val": (n_train, n_train + n_val),
              "test": (n_train + n_val, n)}

    # masked standardization constants from the TRAIN split only
    means, stds = masked_mean_std(x[: n_train], mask[: n_train, :, None])
    stds = np.where(stds == 0, 1.0, stds)

    os.makedirs(args.out_dir, exist_ok=True)
    for split, (lo, hi) in bounds.items():
        path = os.path.join(args.out_dir, f"{split}.h5")
        with h5py.File(path, "w") as h:
            std_x = ((x[lo:hi] - means) / stds) * mask[lo:hi][..., None]
            d = h.create_dataset("part_features", data=std_x.astype(np.float32))
            d.attrs["names_part_features"] = names["part_features"]
            h.create_dataset("part_mask", data=mask[lo:hi].astype(np.float32))
            d = h.create_dataset("jet_features", data=jf[lo:hi].astype(np.float32))
            d.attrs["names_jet_features"] = names["jet_features"]
            d = h.create_dataset("labels", data=lb[lo:hi].astype(np.float32))
            d.attrs["names_labels"] = names["labels"]
            d = h.create_dataset("part_means", data=means.astype(np.float32))
            d.attrs["names_part_means"] = names["part_features"]
            d = h.create_dataset("part_stds", data=stds.astype(np.float32))
            d.attrs["names_part_stds"] = names["part_features"]
        print(f"[prepare_jetclass] wrote {path} ({hi - lo} jets)")


if __name__ == "__main__":
    main()
