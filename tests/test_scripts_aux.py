"""Auxiliary scripts: calo preprocessing + notebook generator sync."""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_preprocessing_calo_challenge(tmp_path):
    out = tmp_path / "calo.npz"
    scaler_out = tmp_path / "scaler.gz"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "preprocessing_calo_challenge.py"),
         "--synthetic", "--max_showers", "120",
         "--out", str(out), "--scaler_out", str(scaler_out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    data = np.load(out, allow_pickle=True)
    assert len(data["showers"]) == 120
    assert data["energies"].shape == (120, 1)

    from particle_fm_tpu.data.calo import CaloChallengeDataModule

    import pickle
    try:
        import joblib
        scaler = joblib.load(scaler_out)
    except ImportError:
        scaler = pickle.load(open(scaler_out, "rb"))
    # the npz + scaler plug straight into the datamodule
    dm = CaloChallengeDataModule(dataset_file=str(out), batch_size=16,
                                 scaler=scaler, max_hits=128)
    dm.setup()
    x, m, c = next(iter(dm.train_batches(seed=0)))
    assert np.isfinite(x).all()
    # scaler roundtrip on raw hits
    raw = data["showers"][0].astype(np.float64)
    rt = scaler.inverse_transform(scaler.transform(raw))
    np.testing.assert_allclose(rt, raw, atol=1e-6)


def test_notebooks_valid_and_in_sync():
    """notebooks/*.ipynb are valid nbformat-4 JSON and match the generator
    (edit scripts/make_notebooks.py, not the .ipynb files)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_notebooks

    paths = sorted(glob.glob(os.path.join(REPO, "notebooks", "*.ipynb")))
    assert len(paths) == len(make_notebooks.NOTEBOOKS) == 5
    for path in paths:
        with open(path) as f:
            on_disk = json.load(f)
        assert on_disk["nbformat"] == 4 and on_disk["cells"]
        generated = make_notebooks.NOTEBOOKS[os.path.basename(path)]
        assert json.loads(json.dumps(generated)) == on_disk, (
            f"{path} out of sync — rerun scripts/make_notebooks.py"
        )


@pytest.mark.slow
def test_guidance_sweep_e2e(tmp_path):
    """Tiny CFG run -> scripts/guidance_sweep.py writes a sane sweep yaml."""
    from particle_fm_tpu.train import main

    main([
        "experiment=jetnet/fm_cfg_tops30",
        "data.synthetic=true",
        "data.synthetic_num_jets=256",
        "data.batch_size=64",
        # keep all 30 slots: truncating the cloud changes its realized mass,
        # which would break the floor_real_mae ~ 0 check below
        "data.num_particles=30",
        "model.num_particles=30",
        "model.hidden_dim=16",
        "model.latent=4",
        "model.layers=1",
        "trainer=smoke",
        "trainer.max_epochs=2",
        "trainer.save_last_every_n_epoch=1",
        "callbacks=none",
        f"output_dir={tmp_path}/run",
    ])
    run_dir = sorted(glob.glob(f"{tmp_path}/run/*"))[-1]
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "guidance_sweep.py"),
         "--run_dir", run_dir, "--ckpt", "last", "--ws", "1", "2",
         "--n", "64", "--ode_steps", "4", "--batch_size", "64"],
        # two jit variants compile (guidance_scale is static); cold-cache CPU
        # compiles under full-suite load have been observed at ~8 min
        capture_output=True, text=True, timeout=1500,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr

    import yaml

    out = yaml.safe_load(open(os.path.join(run_dir, "guidance_sweep.yaml")))
    # the synthetic labels ARE the realized constituent mass -> floor ~ 0
    assert abs(out["floor_real_mae"]) < 1e-4
    assert set(out["ws"]) == {1.0, 2.0}
    for row in out["ws"].values():
        for v in row.values():
            assert np.isfinite(v)


@pytest.mark.slow
def test_lhco_sr_classifier_e2e(tmp_path):
    """The LHCO anomaly chain's endpoint (round-4 VERDICT missing #1): tiny
    two-stage training -> generate_data_lhco.py xy mode -> classifier_test.py
    --gen_h5 trains the dijet EPiC classifier (num_sup_sets=2) on generated
    vs real SR events AND the real-vs-real control. Reference:
    models/epic_classifier.py + data/classifier_datamodule.py (SURVEY 3.4)."""
    import yaml

    from particle_fm_tpu.train import main

    common = [
        "data.synthetic=true", "data.synthetic_num_events=600",
        "trainer=smoke", "trainer.max_epochs=2",
        "trainer.save_last_every_n_epoch=1", "callbacks=none",
    ]
    main(["experiment=lhco/jet_features", *common, "data.batch_size=64",
          f"output_dir={tmp_path}/s1"])
    main(["experiment=lhco/both_jets", *common, "data.batch_size=64",
          "data.num_particles=16", "model.num_particles=16",
          "model.hidden_dim=16", "model.latent=4", "model.layers=1",
          f"output_dir={tmp_path}/s2"])
    s1 = sorted(glob.glob(f"{tmp_path}/s1/*"))[-1]
    s2 = sorted(glob.glob(f"{tmp_path}/s2/*"))[-1]

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    h5 = f"{tmp_path}/gen.h5"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "generate_data_lhco.py"),
         "--stage1_run", s1, "--stage2_run", s2, "--stage2_run_y", s2,
         "--n_samples", "48", "--ode_steps", "6", "--batch_size", "48",
         "--out", h5],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    for extra, out_name in (
        ([], "classifier_test_sr_sr.yaml"),
        (["--control"], "classifier_test_sr_control.yaml"),
    ):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "classifier_test.py"),
             "--run_dir", s2, "--ckpt", "last", "--gen_h5", h5,
             "--epochs", "2", "--n_samples", "64", "--batch_size", "16",
             *extra],
            capture_output=True, text=True, timeout=1500, env=env,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        out = yaml.safe_load(open(os.path.join(s2, out_name)))
        assert 0.0 <= out["classifier_auc"] <= 1.0
