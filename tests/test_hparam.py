"""TPE hyperparameter sampler (training/hparam.py).

Parity: the reference's adaptive search is Optuna's TPESampler via the hydra
sweeper (configs/hparams_search/mnist_optuna.yaml); optuna is unavailable
here, so the sampler is implemented natively. These tests check the
mechanics (startup phase, bounds, categorical handling, NaN robustness) and
the defining property: on a benign synthetic objective TPE finds better
optima than random search at a matched trial count.
"""

import numpy as np
import pytest

from particle_fm_tpu.training.hparam import (
    RandomSampler,
    TPESampler,
    TrialRecord,
    make_sampler,
)

CAT = {"model.layers": ["2", "4", "8"]}
LOG = {"lr": (1e-5, 1e-1)}


def _run_search(sampler, objective, n_trials):
    history = []
    for _ in range(n_trials):
        picks = sampler.suggest(history)
        history.append(TrialRecord(params=picks, value=objective(picks)))
    return history


def quadratic(picks):
    """Minimum at lr=1e-3, layers='4'."""
    lr_term = (np.log10(float(picks["lr"])) + 3.0) ** 2
    cat_term = {"2": 1.0, "4": 0.0, "8": 2.0}[str(picks["model.layers"])]
    return lr_term + cat_term


def test_startup_phase_is_random_and_in_bounds():
    s = TPESampler(CAT, LOG, seed=0, n_startup_trials=5)
    history = []
    for _ in range(5):
        p = s.suggest(history)
        assert p["model.layers"] in CAT["model.layers"]
        assert LOG["lr"][0] <= p["lr"] <= LOG["lr"][1]
        history.append(TrialRecord(params=p, value=quadratic(p)))
    # post-startup proposals stay in bounds too
    for _ in range(10):
        p = s.suggest(history)
        assert p["model.layers"] in CAT["model.layers"]
        assert LOG["lr"][0] <= p["lr"] <= LOG["lr"][1]
        history.append(TrialRecord(params=p, value=quadratic(p)))


def test_nan_trials_are_ignored():
    s = TPESampler(CAT, LOG, seed=1, n_startup_trials=2)
    history = [TrialRecord(params={"model.layers": "4", "lr": 1e-3}, value=float("nan"))
               for _ in range(10)]
    # all-NaN history -> still in the startup regime, must not crash
    p = s.suggest(history)
    assert p["model.layers"] in CAT["model.layers"]
    history += [
        TrialRecord(params={"model.layers": "4", "lr": 1e-3}, value=0.1),
        TrialRecord(params={"model.layers": "8", "lr": 1e-2}, value=3.0),
        TrialRecord(params={"model.layers": "2", "lr": 1e-4}, value=2.0),
    ]
    p = s.suggest(history)
    assert p["model.layers"] in CAT["model.layers"]
    assert np.isfinite(p["lr"])


def test_tpe_concentrates_near_good_region():
    """After seeing a clear optimum, most TPE proposals should land near it
    (within one decade of lr=1e-3 for a minimum at exactly 1e-3)."""
    s = TPESampler(CAT, LOG, seed=2, n_startup_trials=4)
    history = _run_search(s, quadratic, 30)
    late = history[15:]
    frac_near = np.mean([abs(np.log10(t.params["lr"]) + 3.0) < 1.0 for t in late])
    assert frac_near >= 0.6, f"only {frac_near:.0%} of late proposals near optimum"
    # the best category should dominate late proposals as well
    frac_cat = np.mean([t.params["model.layers"] == "4" for t in late])
    assert frac_cat >= 0.5


@pytest.mark.parametrize("n_trials", [20])
def test_tpe_beats_random_at_matched_trials(n_trials):
    """Median best-found objective over seeds: TPE <= random (strictly better
    in aggregate) on the synthetic quadratic at a matched trial count."""
    tpe_best, rnd_best = [], []
    for seed in range(8):
        tpe_hist = _run_search(
            TPESampler(CAT, LOG, seed=seed, n_startup_trials=4), quadratic, n_trials
        )
        rnd_hist = _run_search(RandomSampler(CAT, LOG, seed=seed), quadratic, n_trials)
        tpe_best.append(min(t.value for t in tpe_hist))
        rnd_best.append(min(t.value for t in rnd_hist))
    assert np.median(tpe_best) < np.median(rnd_best), (tpe_best, rnd_best)


def test_make_sampler_dispatch():
    assert isinstance(make_sampler("random", CAT, LOG), RandomSampler)
    assert isinstance(make_sampler("tpe", CAT, LOG), TPESampler)
    with pytest.raises(ValueError, match="unknown sampler"):
        make_sampler("grid", CAT, LOG)


def test_continuous_only_and_categorical_only_spaces():
    s1 = TPESampler({}, LOG, seed=3, n_startup_trials=2)
    h1 = _run_search(s1, lambda p: (np.log10(p["lr"]) + 3) ** 2, 12)
    assert all(LOG["lr"][0] <= t.params["lr"] <= LOG["lr"][1] for t in h1)
    s2 = TPESampler(CAT, {}, seed=3, n_startup_trials=2)
    h2 = _run_search(s2, lambda p: {"2": 1.0, "4": 0.0, "8": 2.0}[p["model.layers"]], 12)
    assert all(t.params["model.layers"] in CAT["model.layers"] for t in h2)


@pytest.mark.slow
def test_hparam_search_cli_tpe_e2e(tmp_path, monkeypatch):
    """scripts/hparam_search.py --sampler tpe end to end: 3 tiny synthetic
    trials through the real train() entry point, ranked results written."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import hparam_search

    out = tmp_path / "results.json"
    monkeypatch.setattr(sys, "argv", [
        "hparam_search.py",
        "--experiment", "jetnet/fm_tops30_cond",
        "--metric", "val_loss", "--n_trials", "3",
        "--sampler", "tpe", "--tpe-startup-trials", "2",
        "--space", "model.layers=1,2",
        "--space-log", "model.optimizer.lr=1e-4:1e-2",
        "--out", str(out),
        "--overrides",
        "data.synthetic=true", "data.synthetic_num_jets=128",
        "data.batch_size=64", "data.num_particles=8", "model.num_particles=8",
        "model.hidden_dim=16", "model.latent=4",
        "trainer=smoke", "trainer.max_epochs=1", "callbacks=none",
        f"output_dir={tmp_path}/run",
    ])
    ranked = hparam_search.main()
    assert len(ranked) == 3
    assert all(np.isfinite(r["val_loss"]) for r in ranked)
    saved = json.loads(out.read_text())
    assert saved[0]["val_loss"] == ranked[0]["val_loss"]
