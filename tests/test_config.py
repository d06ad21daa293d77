"""Config composition + instantiation tests; every experiment must compose
and instantiate (the reference's test_configs.py analogue — except ours pass)."""

import glob
import os

import numpy as np
import pytest

from particle_fm_tpu.config.core import compose, deep_merge, instantiate

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_deep_merge():
    a = {"x": {"y": 1, "z": 2}, "k": [1, 2]}
    b = {"x": {"z": 3}, "k": [9]}
    out = deep_merge(a, b)
    assert out == {"x": {"y": 1, "z": 3}, "k": [9]}


def test_compose_defaults():
    cfg = compose(CONFIG_DIR, "train")
    assert cfg["model"]["_target_"].endswith("FlowMatchingModel")
    assert cfg["data"]["num_particles"] == 30
    assert cfg["trainer"]["max_epochs"] == 10000


def test_compose_experiment_overrides_groups_and_values():
    cfg = compose(CONFIG_DIR, "train", ["experiment=jetnet/fm_tops150_cond"])
    assert cfg["data"]["num_particles"] == 150  # interpolated from model
    assert cfg["model"]["num_particles"] == 150
    assert cfg["model"]["global_cond_dim"] == 2
    assert cfg["task_name"] == "fm_tops-150"
    assert cfg["output_dir"] == "runs/fm_tops-150"  # interpolation


def test_compose_dotlist_overrides():
    cfg = compose(
        CONFIG_DIR,
        "train",
        ["experiment=jetnet/fm_tops30_cond", "model.hidden_dim=64", "data.synthetic=true"],
    )
    assert cfg["model"]["hidden_dim"] == 64
    assert cfg["data"]["synthetic"] is True


def test_group_override_via_cli():
    cfg = compose(CONFIG_DIR, "train", ["trainer=smoke"])
    assert cfg["trainer"]["max_epochs"] == 2


@pytest.mark.parametrize(
    "exp",
    [
        os.path.relpath(p, os.path.join(CONFIG_DIR, "experiment"))[:-5]
        for p in glob.glob(os.path.join(CONFIG_DIR, "experiment", "**", "*.yaml"), recursive=True)
    ],
)
def test_every_experiment_composes_and_instantiates(exp):
    # instantiation only (no setup): no data files needed
    cfg = compose(CONFIG_DIR, "train", [f"experiment={exp}"])
    dm = instantiate(cfg["data"])
    assert dm is not None
    model_cfg = dict(cfg["model"])
    model_cfg.pop("optimizer", None)
    model_cfg.pop("scheduler", None)
    model = instantiate(model_cfg)
    assert model is not None
    cbs = instantiate(cfg.get("callbacks", {}) or {})
    assert isinstance(cbs, dict)


@pytest.mark.parametrize(
    "exp,extra",
    [
        # one representative per newly-added family (test_sweeps.py analogue:
        # a real fit on tiny synthetic shapes, not just instantiation)
        ("jetnet/diffusion_alljets150_cond", ["model.global_cond_dim=7", "model.local_cond_dim=7"]),
        ("jetnet/fm_mdma", ["model.net_config.latent=4", "model.net_config.hidden_dim=16",
                            "model.net_config.layers=1", "model.net_config.num_heads=2"]),
        # variable_jet_sizes=true here: the experiment's fixed-size mode keeps
        # only full-multiplicity jets (covered by test_data.py::mask_data),
        # which a 256-jet synthetic set at num_particles=8/30 can't supply
        ("jetnet/fm_transformer", ["model.net_config.te_config.model_dim=16",
                                   "model.net_config.te_config.num_layers=1",
                                   "data.variable_jet_sizes=true"]),
        ("jetnet/fm_tops30", []),
    ],
)
@pytest.mark.slow
def test_experiment_sweep_train_smoke(exp, extra, tmp_path):
    """Fit one tiny epoch for each new experiment family end-to-end."""
    from particle_fm_tpu.train import main

    metrics = main(
        [
            f"experiment={exp}",
            "data.synthetic=true",
            "data.synthetic_num_jets=256",
            "data.batch_size=64",
            "data.num_particles=8",
            "model.num_particles=8",
            "model.hidden_dim=16",
            "model.latent=4",
            "model.layers=1",
            "trainer=smoke",
            "trainer.max_epochs=1",
            "callbacks=none",
            "test=false",
            f"output_dir={tmp_path}/run",
        ]
        + extra
    )
    assert np.isfinite(metrics["val_loss"])


def test_instantiate_partial():
    cfg = {"_target_": "operator.add", "_partial_": True}
    fn = instantiate(cfg)
    assert fn(2, 3) == 5


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """The full CLI path: compose -> run dir -> fit -> test -> metrics."""
    from particle_fm_tpu.train import main

    metrics = main(
        [
            "experiment=jetnet/fm_tops30_cond",
            "data.synthetic=true",
            "data.synthetic_num_jets=600",
            "data.batch_size=64",
            "data.num_particles=8",
            "model.num_particles=8",
            "model.hidden_dim=16",
            "model.latent=4",
            "model.layers=1",
            "trainer=smoke",
            "trainer.max_epochs=2",  # the experiment body pins 10000; dotted overrides win
            "trainer.save_last_every_n_epoch=1",
            "callbacks.jetnet_eval.every_n_epochs=1",
            "callbacks.jetnet_eval.num_jet_samples=64",
            "callbacks.jetnet_eval.generation_batch_size=64",
            "callbacks.jetnet_eval.ode_steps=4",
            "callbacks.jetnet_eval.w1_kwargs.num_batches=2",
            "callbacks.jetnet_eval.w1_kwargs.num_eval_samples=50",
            f"output_dir={tmp_path}/run",
        ]
    )
    assert "val_loss" in metrics and "w1m_mean" in metrics
    # the run snapshot exists and eval.py can reload it
    import glob as g

    run_dirs = g.glob(f"{tmp_path}/run/*")
    assert run_dirs
    assert os.path.exists(os.path.join(run_dirs[0], "config.yaml"))
    from particle_fm_tpu.evaluate import evaluate

    # CLI-style STRING overrides must be yaml-coerced (evaluate's main()
    # passes raw "key=value" strings; "64" < 0 raised TypeError before)
    results = evaluate(
        run_dirs[0],
        ckpt="last",
        overrides={
            "callbacks.jetnet_eval.num_jet_samples": "64",
            "callbacks.jetnet_eval.ode_steps": "4",
        },
    )
    assert "w1m_mean" in results
    assert os.path.exists(os.path.join(run_dirs[0], "final_eval_metrics.yaml"))


@pytest.mark.slow
def test_train_cli_lhco_jet_features(tmp_path):
    """CLI smoke for the flat-model path (LHCO stage 1)."""
    from particle_fm_tpu.train import main

    metrics = main(
        [
            "experiment=lhco/jet_features",
            "data.synthetic=true",
            "data.synthetic_num_events=1200",
            "data.batch_size=64",
            "trainer=smoke",
            "trainer.max_epochs=2",
            "trainer.save_last_every_n_epoch=1",
            "callbacks.flat_eval.every_n_epochs=1",
            "callbacks.flat_eval.log_epoch_zero=true",
            "callbacks.flat_eval.num_samples=128",
            "callbacks.flat_eval.generation_batch_size=64",
            "callbacks.flat_eval.ode_steps=4",
            "test=false",
            f"output_dir={tmp_path}/run",
        ]
    )
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    assert "w1_features_mean" in metrics and np.isfinite(metrics["w1_features_mean"])


@pytest.mark.parametrize(
    "exp,extra",
    [
        ("jetclass_classifier", ["model.num_particles=8",
                                 "model.net_config.embed_dims=[16,16]",
                                 "model.net_config.num_heads=2",
                                 "model.net_config.num_layers=1",
                                 "model.net_config.num_cls_layers=1",
                                 "model.net_config.pair_embed_dims=[8,8]"]),
        ("jetclass_classifier_particlenet",
         ["model.num_particles=8",
          "model.net_config.conv_params=[[3,[8,8]]]",
          "model.net_config.fc_params=[[8,0.0]]"]),
        ("jetclass_classifier_hl", []),  # HL model is flat: no num_particles
    ],
)
@pytest.mark.slow
def test_train_cli_jetclass_classifier(exp, extra, tmp_path):
    """CLI e2e for the JetClass classifier-test family (ParT with pairwise
    interaction attention / ParticleNet / HL-MLP) on synthetic gen-vs-sim
    data."""
    from particle_fm_tpu.train import main

    metrics = main(
        [
            f"experiment={exp}",
            "data.synthetic=true",
            "data.synthetic_num_jets=400",
            "data.synthetic_num_particles=8",
            "data.used_flavor=QCD",  # synthetic mode fabricates 3 types
            "data.batch_size=32",
            "trainer=smoke",
            "trainer.max_epochs=2",
            "trainer.save_last_every_n_epoch=1",
            f"output_dir={tmp_path}/run",
        ]
        + extra
    )
    assert np.isfinite(metrics["val_loss"])
    assert "accuracy" in metrics and 0.0 <= metrics["accuracy"] <= 1.0
    assert "auroc" in metrics


@pytest.mark.slow
def test_train_cli_gen_challenge(tmp_path):
    """CLI e2e for GenChallenge: sideband + SR-twin eval callbacks both log
    per-feature W1 (parity: gen_challenge_eval.py + gen_challenge_eval_sr.py)."""
    from particle_fm_tpu.train import main

    metrics = main(
        [
            "experiment=gen_challenge/gen_challenge",
            "data.synthetic=true",
            "data.synthetic_num_events=1500",
            "data.batch_size=64",
            "trainer=smoke",
            "trainer.max_epochs=2",
            "trainer.save_last_every_n_epoch=1",
            "callbacks.gen_challenge_eval.every_n_epochs=1",
            "callbacks.gen_challenge_eval.num_samples=128",
            "callbacks.gen_challenge_eval.generation_batch_size=64",
            "callbacks.gen_challenge_eval.ode_steps=4",
            "callbacks.gen_challenge_eval.w1_num_batches=2",
            "callbacks.gen_challenge_eval_sr.every_n_epochs=1",
            "callbacks.gen_challenge_eval_sr.num_samples=128",
            "callbacks.gen_challenge_eval_sr.generation_batch_size=64",
            "callbacks.gen_challenge_eval_sr.ode_steps=4",
            "callbacks.gen_challenge_eval_sr.w1_num_batches=2",
            "test=false",
            f"output_dir={tmp_path}/run",
        ]
    )
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    # sideband per-feature W1s + the SR twin (metric_prefix="sr_")
    assert np.isfinite(metrics["w1_mj1_mean"])
    assert np.isfinite(metrics["w1_features_mean"])
    assert np.isfinite(metrics["sr_w1_mj1_mean"])
    # the 5-panel cond+features ratio plot was written
    import glob as g

    run_dirs = g.glob(f"{tmp_path}/run/*")
    assert g.glob(os.path.join(run_dirs[0], "callback_images", "*features_epoch*.png"))


@pytest.mark.parametrize(
    "exp",
    [
        os.path.relpath(p, os.path.join(CONFIG_DIR, "experiment"))[:-5]
        for p in glob.glob(os.path.join(CONFIG_DIR, "experiment", "**", "*.yaml"), recursive=True)
    ],
)
def test_model_and_data_set_sizes_agree(exp):
    """A model left at its default num_particles against differently-sized
    data silently generates the wrong set size during unmasked sampling
    (observed: 150-particle jets vs 30-particle data -> W1M off by 100x)."""
    cfg = compose(CONFIG_DIR, "train", [f"experiment={exp}"])
    m = cfg.get("model") or {}
    d = cfg.get("data") or {}
    if "FlowMatchingModel" not in str(m.get("_target_", "")):
        return
    dn = d.get("num_particles")
    if dn is None:
        return
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel

    default_n = FlowMatchingModel.__dataclass_fields__["num_particles"].default
    effective = m.get("num_particles", default_n)
    assert effective == dn, (exp, effective, dn)
