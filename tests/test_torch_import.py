"""Reference checkpoint import (utils/torch_import.py + the CLI script).

Builds a real reference EPiC_encoder (executed torch code), packages its
state_dict the way a SetFlowMatchingLitModule Lightning checkpoint stores it
(`flows.0.net.*`, plus the `loss.flows.*` aliases that must be ignored), and
checks that the state_dict-driven converter produces (a) the exact tensors
the live-module transplant maps produce, (b) a forward that matches the
executed reference encoder, and (c) a run dir every downstream tool loads.
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = Path("/root/reference/particle_fm")
pytestmark = pytest.mark.skipif(
    not REF_ROOT.exists(), reason="reference checkout not available"
)

from tests.test_torch_parity import (  # noqa: E402
    _cloud,
    _install_reference_stubs,
    assert_close,
    epic_encoder,
    full_crossattention,
    full_transformer,
    mdma_net,
)

from particle_fm_tpu.models.flow_matching import FlowMatchingModel  # noqa: E402
from particle_fm_tpu.utils.torch_import import (  # noqa: E402
    epic_encoder_params_from_sd,
    full_crossattention_params_from_sd,
    full_transformer_params_from_sd,
    mdma_params_from_sd,
    variables_from_reference_state_dict,
)

DIMS = dict(latent=8, hid_d=16, feats=3, equiv_layers=2, frequencies=4)


@pytest.fixture(scope="module")
def tnet():
    _install_reference_stubs()
    epic = importlib.import_module("particle_fm.models.components.epic")
    torch.manual_seed(11)
    return epic.EPiC_encoder(
        input_dim=3,
        num_points=10,
        global_cond_dim=2,
        local_cond_dim=2,
        t_local_cat=True,
        t_global_cat=True,
        latent=DIMS["latent"],
        hid_d=DIMS["hid_d"],
        feats=DIMS["feats"],
        equiv_layers=DIMS["equiv_layers"],
        frequencies=DIMS["frequencies"],
    ).eval()


def _model():
    return FlowMatchingModel(
        features=3,
        num_particles=10,
        hidden_dim=DIMS["hid_d"],
        layers=DIMS["equiv_layers"],
        latent=DIMS["latent"],
        frequencies=DIMS["frequencies"],
        global_cond_dim=2,
        local_cond_dim=2,
        t_emb="sincos",
        t_local_cat=True,
        t_global_cat=True,
        add_time_to_input=False,
    )


def _lightning_sd(tnet) -> dict:
    sd = {f"flows.0.net.{k}": v for k, v in tnet.state_dict().items()}
    # the reference loss modules alias the flows ModuleList: those duplicate
    # keys appear in real checkpoints and must be ignored by the importer
    sd.update({f"loss.flows.0.net.{k}": v for k, v in tnet.state_dict().items()})
    return sd


def _assert_trees_equal(from_sd: dict, from_live: dict) -> None:
    flat_sd = jax.tree_util.tree_flatten_with_path(from_sd)
    flat_live = jax.tree_util.tree_flatten_with_path(from_live)
    assert [p for p, _ in flat_sd[0]] == [p for p, _ in flat_live[0]]
    for (p, a), (_, b) in zip(flat_sd[0], flat_live[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))


def test_sd_converter_matches_live_module_transplant(tnet):
    """state_dict-driven conversion == the live-module transplant maps."""
    _assert_trees_equal(epic_encoder_params_from_sd(tnet.state_dict(), ""), epic_encoder(tnet))


TE_CFG = {
    "model_dim": 16,
    "num_layers": 2,
    "mha_config": {"num_heads": 2, "do_layer_norm": True},
    "dense_config": {"act_h": "lrlu", "nrm": "layer"},
}


@pytest.fixture(scope="module")
def droid_tnet():
    _install_reference_stubs()
    droid = importlib.import_module(
        "particle_fm.models.components.droid_transformer"
    )
    torch.manual_seed(21)
    return droid.FullTransformerEncoder(
        inpt_dim=3 + 2 * 2,
        outp_dim=3,
        ctxt_dim=2 * 2 + 2,
        te_config=TE_CFG,
        node_embd_config={},
        outp_embd_config={},
        ctxt_embd_config={},
    ).eval()


def test_sd_converter_droid_fulltransformer(droid_tnet):
    _assert_trees_equal(
        full_transformer_params_from_sd(droid_tnet.state_dict(), ""),
        full_transformer(droid_tnet),
    )


def test_sd_converter_droid_fullcrossattention():
    _install_reference_stubs()
    droid = importlib.import_module(
        "particle_fm.models.components.droid_transformer"
    )
    torch.manual_seed(22)
    tnet = droid.FullCrossAttentionEncoder(
        inpt_dim=3 + 2 * 2,
        outp_dim=3,
        ctxt_dim=2 * 2 + 2,
        cae_config={
            "model_dim": 16,
            "num_tokens": 3,
            "num_layers": 2,
            "mha_config": {"num_heads": 2},
            "dense_config": {},
        },
        node_embd_config={},
        outp_embd_config={},
        ctxt_embd_config={},
    ).eval()
    _assert_trees_equal(
        full_crossattention_params_from_sd(tnet.state_dict(), ""),
        full_crossattention(tnet),
    )


def test_sd_converter_mdma():
    _install_reference_stubs()
    mdma = importlib.import_module("particle_fm.models.components.mdma")
    torch.manual_seed(23)
    tnet = mdma.MDMA(
        latent=8,
        input_dim=3,
        hidden_dim=16,
        layers=2,
        num_heads=4,
        frequencies=3,
        global_cond_dim=1,
        t_local_cat=True,
        t_global_cat=True,
        avg_n=30,
        local_cat_cond=True,
        global_cat_cond=True,
    ).eval()
    _assert_trees_equal(mdma_params_from_sd(tnet.state_dict(), ""), mdma_net(tnet))


def test_imported_variables_forward_parity_droid(droid_tnet):
    """Full-model droid import: vector_field == the executed reference
    FullTransformerEncoder fed the flax CNF's input convention (sincos t
    embedding concatenated in front of the features, flow_matching_module.py
    droid branch)."""
    f = 2
    model = FlowMatchingModel(
        model="droid_fulltransformer",
        features=3,
        num_particles=10,
        frequencies=f,
        global_cond_dim=2,
        t_emb="sincos",
        add_time_to_input=True,
        net_config={"te_config": TE_CFG},
    )
    sd = {f"flows.0.net.{k}": v for k, v in droid_tnet.state_dict().items()}
    variables = variables_from_reference_state_dict(sd, model)

    x, mask = _cloud(batch=4, n=10, feats=3, seed=8)
    rs = np.random.RandomState(9)
    cond = rs.randn(4, 2).astype(np.float32)
    t = 0.41

    out = model.vector_field(
        variables, jnp.asarray(t), jnp.asarray(x), cond=jnp.asarray(cond),
        mask=jnp.asarray(mask),
    )

    freqs = (2.0 ** np.arange(f)) * np.pi
    arg = np.asarray(t) * freqs
    t_emb = np.concatenate([np.cos(arg), np.sin(arg)])[None, None, :]
    t_emb = np.repeat(np.repeat(t_emb, 10, axis=1), 4, axis=0).astype(np.float32)
    with torch.no_grad():
        out_ref = droid_tnet(
            torch.from_numpy(t_emb),
            torch.from_numpy(np.concatenate([t_emb, x], axis=-1)),
            torch.from_numpy(cond),
            torch.from_numpy(mask),
        )
    assert_close(out, out_ref, what="imported droid vector field")


@pytest.mark.slow
def test_imported_variables_forward_parity(tnet):
    """Full-model import: vector_field == the executed reference encoder fed
    the same (sincos) time embedding."""
    model = _model()
    variables = variables_from_reference_state_dict(_lightning_sd(tnet), model)

    x, mask = _cloud(batch=4, n=10, feats=3, seed=3)
    rs = np.random.RandomState(4)
    cond = rs.randn(4, 2).astype(np.float32)
    t = 0.37

    out = model.vector_field(
        variables, jnp.asarray(t), jnp.asarray(x), cond=jnp.asarray(cond),
        mask=jnp.asarray(mask),
    )

    # the reference CNF broadcasts cat(cos, sin) of t * 2^k*pi per particle
    # (flow_matching_module.py:206-233 sincos branch)
    freqs = (2.0 ** np.arange(DIMS["frequencies"])) * np.pi
    arg = np.asarray(t) * freqs
    t_emb = np.concatenate([np.cos(arg), np.sin(arg)])[None, None, :]
    t_emb = np.repeat(np.repeat(t_emb, 10, axis=1), 4, axis=0).astype(np.float32)
    with torch.no_grad():
        out_ref = tnet(
            torch.from_numpy(t_emb),
            torch.from_numpy(x),
            torch.from_numpy(cond),
            torch.from_numpy(mask),
        )
    assert_close(out, out_ref, what="imported EPiC vector field")


def test_import_rejects_mismatched_model(tnet):
    with pytest.raises(ValueError, match="mismatch"):
        wrong = FlowMatchingModel(
            features=3, num_particles=10, hidden_dim=32, layers=2, latent=8,
            frequencies=4, global_cond_dim=2, local_cond_dim=2,
            t_local_cat=True, t_global_cat=True,
        )
        variables_from_reference_state_dict(_lightning_sd(tnet), wrong)


@pytest.mark.slow
def test_import_cli_end_to_end(tnet, tmp_path):
    """Fake reference .ckpt -> import CLI -> load_run -> sample."""
    ckpt = tmp_path / "epoch=99-EMA.ckpt"
    torch.save({"state_dict": _lightning_sd(tnet), "epoch": 99}, ckpt)
    out = tmp_path / "imported_run"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    overrides = [
        "experiment=jetnet/fm_tops30_cond",
        "data.synthetic=true",
        "data.synthetic_num_jets=64",
        f"model.num_particles=10",
        f"model.hidden_dim={DIMS['hid_d']}",
        f"model.layers={DIMS['equiv_layers']}",
        f"model.latent={DIMS['latent']}",
        f"model.frequencies={DIMS['frequencies']}",
        "model.t_emb=sincos",
        "data.num_particles=10",
    ]
    res = subprocess.run(
        [sys.executable, "scripts/import_reference_ckpt.py",
         "--ckpt", str(ckpt), "--out", str(out), *overrides],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert (out / "config.yaml").exists()

    from particle_fm_tpu.utils.run_io import load_run

    cfg, dm, model, variables = load_run(str(out), ckpt="last", ema=True)
    sample = model.sample(
        variables, jax.random.PRNGKey(0), n_samples=8,
        cond=jnp.zeros((8, 2)), mask=jnp.ones((8, 10, 1)), ode_steps=4,
    )
    assert sample.shape == (8, 10, 3)
    assert np.all(np.isfinite(np.asarray(sample)))

    # and the imported weights ARE the reference's tensors
    leaf = variables["params"]["flows_0"]["net"]["fc_l1"]["bias"]
    np.testing.assert_array_equal(
        np.asarray(leaf), tnet.fc_l1.bias.detach().numpy()
    )
