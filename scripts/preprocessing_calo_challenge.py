"""CaloChallenge preprocessing: voxelized showers -> point clouds + scalers.

    python scripts/preprocessing_calo_challenge.py \
        --input dataset_2_1.hdf5 [--num_z 45 --num_alpha 16 --num_r 9] \
        --out data/calo/dataset2.npz --scaler_out data/calo/scaler.gz

    # no raw files around? smoke-test the pipeline:
    python scripts/preprocessing_calo_challenge.py --synthetic --out /tmp/calo.npz

Parity: reference scripts/preprocessing_calo_challenge.py (shower_to_pc +
sklearn pipeline fitting). Each voxel grid (num_z x num_alpha x num_r) is
sparsified into hits (E, z, alpha, r); a per-feature ScalerBase
(E: log -> standardize; z/alpha/r: dequantize -> logit-ish squash) is fitted
on the training hits and saved for the datamodule / eval inverse transform.
The output npz ('showers' object array + 'energies') is exactly what
CaloChallengeDataModule(dataset_file=...) consumes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def showers_to_pointclouds(showers: np.ndarray, num_z: int, num_alpha: int, num_r: int):
    """Sparsify (B, num_z*num_alpha*num_r) voxel energies into per-shower
    (n_hits, [E, z, alpha, r]) arrays (reference shower_to_pc)."""
    grids = showers.reshape(len(showers), num_z, num_alpha, num_r)
    out = []
    for grid in grids:
        z, a, r = np.nonzero(grid)
        e = grid[z, a, r]
        pc = np.stack([e, z.astype(np.float64), a.astype(np.float64), r.astype(np.float64)],
                      axis=-1)
        out.append(pc.astype(np.float32))
    return out


def fit_scaler(pointclouds: list[np.ndarray]):
    """Per-feature pipeline on the pooled hits: log-E standardization and
    dequantized integer coordinates."""
    from sklearn.preprocessing import FunctionTransformer, StandardScaler
    from sklearn.pipeline import make_pipeline

    from particle_fm_tpu.data.calo_scalers import DQ, ScalerBase

    log_e = make_pipeline(
        FunctionTransformer(np.log1p, np.expm1, validate=True, check_inverse=False),
        StandardScaler(),
    )
    sb = ScalerBase(
        [log_e, DQ(seed=0), DQ(seed=1), DQ(seed=2)],
        ["energy", "z", "alpha", "r"],
    )
    pooled = np.concatenate([pc for pc in pointclouds if len(pc)], axis=0)
    sb.fit(pooled.astype(np.float64))
    return sb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="raw CaloChallenge hdf5 (showers + incident_energies)")
    ap.add_argument("--num_z", type=int, default=45)
    ap.add_argument("--num_alpha", type=int, default=16)
    ap.add_argument("--num_r", type=int, default=9)
    ap.add_argument("--max_showers", type=int, default=0, help="0 = all")
    ap.add_argument("--synthetic", action="store_true",
                    help="generate a synthetic voxel file instead of reading --input")
    ap.add_argument("--out", required=True, help="output npz for CaloChallengeDataModule")
    ap.add_argument("--scaler_out", default=None, help="where to save the fitted ScalerBase")
    args = ap.parse_args()

    if args.synthetic:
        rs = np.random.RandomState(0)
        n = args.max_showers or 500
        grid = args.num_z * args.num_alpha * args.num_r
        showers = rs.exponential(0.01, size=(n, grid))
        showers[showers < 0.05] = 0.0  # sparsify
        energies = rs.uniform(1.0, 1000.0, size=(n, 1))
    else:
        if not args.input:
            raise SystemExit("--input required (or --synthetic)")
        import h5py

        with h5py.File(args.input, "r") as f:
            showers = np.asarray(f["showers"])
            energies = np.asarray(f["incident_energies"]).reshape(-1, 1)
        if args.max_showers:
            showers, energies = showers[: args.max_showers], energies[: args.max_showers]

    pcs = showers_to_pointclouds(showers, args.num_z, args.num_alpha, args.num_r)
    n_hits = np.array([len(pc) for pc in pcs])
    print(f"[calo] {len(pcs)} showers, hits/shower: "
          f"median {int(np.median(n_hits))}, max {int(n_hits.max())}")

    scaler = fit_scaler(pcs)
    if args.scaler_out:
        os.makedirs(os.path.dirname(args.scaler_out) or ".", exist_ok=True)
        try:
            import joblib

            joblib.dump(scaler, args.scaler_out)
        except ImportError:  # joblib not in the image: plain pickle
            import pickle

            with open(args.scaler_out, "wb") as f:
                pickle.dump(scaler, f)
        print(f"[calo] scaler saved to {args.scaler_out}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(
        args.out,
        showers=np.array(pcs, dtype=object),
        energies=energies.astype(np.float32),
    )
    print(f"[calo] wrote {args.out}")


if __name__ == "__main__":
    main()
