"""Generate the notebooks/ directory (the .ipynb counterparts of the
reference's notebooks/01-05).

    python scripts/make_notebooks.py

The notebooks are self-contained and runnable on any machine (synthetic
data sources; CPU forced up front). They are regenerated — don't edit the
.ipynb files by hand, edit this script.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "notebooks")


def md(text):
    return {"cell_type": "markdown", "metadata": {}, "source": text.strip("\n").splitlines(keepends=True)}


def code(src):
    return {
        "cell_type": "code",
        "metadata": {},
        "execution_count": None,
        "outputs": [],
        "source": src.strip("\n").splitlines(keepends=True),
    }


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.11"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


SETUP = code('''
import os, sys
sys.path.insert(0, os.path.abspath(".."))   # run from notebooks/
import jax
jax.config.update("jax_platforms", "cpu")   # comment out to use the TPU
import jax.numpy as jnp
import numpy as np
''')


# --------------------------------------------------------------- 01 training
NB01 = notebook([
    md("""
# 01 — Training walkthrough

The full `particle_fm_tpu` API, end to end: datamodule → model → trainer →
sampling. Mirrors the reference's `notebooks/01_training.ipynb`
(upstream: ewencedr/particle_fm). Synthetic JetNet-like data keeps it
runnable anywhere; drop `synthetic=True` to train on the real files.
"""),
    SETUP,
    md("## Data\n\nEvery datamodule exposes the same contract: `train/val/test` splits of `(x, mask, cond)`, raw eval tensors in physical units, and the normalization stats."),
    code('''
from particle_fm_tpu.data.jetnet import JetNetDataModule

dm = JetNetDataModule(
    jet_type=("t",), num_particles=30, batch_size=256,
    synthetic=True, synthetic_num_jets=5000,
)
dm.setup()
print(f"train jets: {len(dm.train)}, conditioning dims: {dm.num_cond_features}")
'''),
    md("## Model\n\n`FlowMatchingModel` is the one generative module: pick the vector-field architecture (`epic`, `droid_fulltransformer`, `droid_fullcrossattention`, `mdma`) and the loss family (`FM-OT`, `CFM`, `CFM-OT`, `diffusion`, `droid`)."),
    code('''
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.utils.helpers import count_parameters

model = FlowMatchingModel(
    model="epic", features=3, num_particles=30,
    hidden_dim=128, latent=10, layers=6, frequencies=16,
    t_emb="cosine", t_local_cat=True, t_global_cat=True,
    loss_type="FM-OT",
    global_cond_dim=dm.num_cond_features, local_cond_dim=dm.num_cond_features,
)
n_params = count_parameters(model.init(jax.random.PRNGKey(0))["params"])
print(f"model parameters: {n_params:,}")
'''),
    md("## Trainer\n\nEMA weights, metric-keyed checkpoints, and the in-training eval callback (generation + W1 distances) — same skeleton as the reference's Lightning setup, SPMD-jitted over the device mesh."),
    code('''
import tempfile
from particle_fm_tpu.eval.callbacks import JetNetEvalCallback
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.lr_schedules import cosine_warmup_schedule
from particle_fm_tpu.training.trainer import Trainer

out_dir = tempfile.mkdtemp(prefix="pfm_demo_")
schedule = cosine_warmup_schedule(1e-3, warmup=2, max_iters=20,
                                  steps_per_epoch=dm.steps_per_epoch)
trainer = Trainer(
    model=model, datamodule=dm,
    optimizer=make_optimizer(lr=schedule, weight_decay=5e-5, grad_clip=0.5),
    max_epochs=5, ema_decay=0.999,
    callbacks=[JetNetEvalCallback(
        every_n_epochs=5, num_jet_samples=1000, generation_batch_size=512,
        ode_steps=50, use_ema=False,
        w1_kwargs=dict(num_batches=5, num_eval_samples=1000))],
    ckpt_dir=os.path.join(out_dir, "checkpoints"),
    ckpt_monitors={"val_loss": "min", "w1m_mean": "min"},
    log_dir=out_dir,
)
trainer.fit()
trainer.metrics_history[-1]
'''),
    md("## Sampling\n\nGeneration integrates the probability-flow ODE t=1→0 (midpoint, 100 steps by default — the reference's convention)."),
    code('''
variables = jax.device_get(trainer.state.variables(ema=False))
samples = model.sample(
    variables, jax.random.PRNGKey(0), n_samples=256,
    cond=jnp.asarray(dm.tensor_conditioning_test[:256]),
    mask=jnp.asarray(dm.mask_test[:256]),
    ode_solver="midpoint", ode_steps=100,
)
print(samples.shape)
'''),
    md("The equivalent config-driven run is one command:\n\n```bash\npython -m particle_fm_tpu.train experiment=jetnet/fm_tops30_cond\n```"),
])


# ------------------------------------------------------------ 02 eight moons
NB02 = notebook([
    md("""
# 02 — Flow matching on the eight-moons toy problem

Transport 8 Gaussians to two moons with conditional flow matching and an
EPiC vector field over 2-D point sets — including the **self-conditioning**
CFM variant that only exists in the reference's
`notebooks/02_flow_matching_on_eight_moons.ipynb`.
Script version: `examples/eight_moons.py`.
"""),
    SETUP,
    code('''
def make_moons(n, noise=0.05, rs=None):
    rs = rs or np.random.RandomState(0)
    n_out = n // 2; n_in = n - n_out
    t_out = rs.rand(n_out) * np.pi
    t_in = rs.rand(n_in) * np.pi
    outer = np.stack([np.cos(t_out), np.sin(t_out)], axis=-1)
    inner = np.stack([1 - np.cos(t_in), 0.5 - np.sin(t_in)], axis=-1)
    return (np.concatenate([outer, inner]) + rs.randn(n, 2) * noise).astype(np.float32)

def make_eight_gaussians(n, rs=None):
    rs = rs or np.random.RandomState(1)
    angles = 2 * np.pi * rs.randint(0, 8, n) / 8
    centers = np.stack([np.cos(angles), np.sin(angles)], axis=-1) * 2.5
    return (centers + rs.randn(n, 2) * 0.15).astype(np.float32)
'''),
    md("## The vector field\n\nAn EPiC encoder over sets of 8 two-dimensional points. With self-conditioning the net consumes `cat(y, x1_hat_prev)` (4 input channels)."),
    code('''
import optax
from particle_fm_tpu.models.flow_matching import FlowMatchingModel

SELF_COND = True      # flip to False for plain CFM
N_SET, BATCH = 8, 512

model = FlowMatchingModel(model="epic", features=2, num_particles=N_SET,
                          hidden_dim=64, latent=8, layers=4, frequencies=6,
                          loss_type="CFM")
dummy_x = jnp.zeros((2, N_SET, 4 if SELF_COND else 2))
params = dict(model.module.init(jax.random.PRNGKey(0), jnp.zeros((2,)), dummy_x))["params"]
opt = optax.adam(1e-3)
opt_state = opt.init(params)

def vf(p, t, y, x1_hat=None):
    inp = jnp.concatenate([y, x1_hat], axis=-1) if SELF_COND else y
    return model.module.apply({"params": p}, t, inp)
'''),
    md("## Training\n\nCFM: `y = (1-t)·x1 + t·x0`, target `u = x0 - x1`. Self-conditioning feeds the model its own stop-gradient x1 estimate half the time."),
    code('''
pool = jnp.asarray(make_moons(200_000).reshape(-1, N_SET, 2))

@jax.jit
def train_step(p, o, rng):
    rng_d, rng_t, rng_0, rng_b = jax.random.split(rng, 4)
    x1 = pool[jax.random.randint(rng_d, (BATCH,), 0, pool.shape[0])]
    t = jax.random.uniform(rng_t, (BATCH,))
    x0 = jax.random.normal(rng_0, x1.shape)
    tb = t[:, None, None]
    y = (1 - tb) * x1 + tb * x0
    target = x0 - x1

    def loss_fn(p):
        if SELF_COND:
            v0 = vf(p, t, y, jnp.zeros_like(y))
            x1_hat = jax.lax.stop_gradient(y - tb * v0)
            use = jax.random.bernoulli(rng_b, 0.5, (BATCH, 1, 1))
            v = vf(p, t, y, jnp.where(use, x1_hat, 0.0))
        else:
            v = vf(p, t, y)
        return jnp.mean(jnp.square(v - target))

    loss, grads = jax.value_and_grad(loss_fn)(p)
    upd, o = opt.update(grads, o)
    return optax.apply_updates(p, upd), o, loss

rng = jax.random.PRNGKey(42)
for step in range(2000):
    rng, sub = jax.random.split(rng)
    params, opt_state, loss = train_step(params, opt_state, sub)
    if step % 500 == 0:
        print(f"step {step}: loss {float(loss):.4f}")
'''),
    md("## Sampling (hand-rolled Euler, t: 1 → 0)\n\nWith self-conditioning, the x1 estimate persists across integration steps."),
    code('''
from particle_fm_tpu.samplers.ode import odeint_fixed

z = jax.random.normal(jax.random.PRNGKey(7), (4000 // N_SET, N_SET, 2))
if SELF_COND:
    @jax.jit
    def gen_fn(z):
        steps = 100
        dt = -1.0 / (steps - 1)
        def body(carry, k):
            y, x1_hat = carry
            t = 1.0 + k * dt
            tv = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
            v = vf(params, tv, y, x1_hat)
            return (y + dt * v, y - t * v), None
        (y, _), _ = jax.lax.scan(body, (z, jnp.zeros_like(z)), jnp.arange(steps - 1))
        return y
    gen = gen_fn(z)
else:
    drift = lambda t, y: vf(params, jnp.broadcast_to(jnp.asarray(t), (y.shape[0],)), y)
    gen = odeint_fixed(drift, z, 1.0, 0.0, ode_steps=100, method="euler")
gen = np.asarray(gen).reshape(-1, 2)
'''),
    code('''
import matplotlib.pyplot as plt

target = make_moons(4000, rs=np.random.RandomState(9))
fig, axes = plt.subplots(1, 3, figsize=(13, 4))
for ax, pts, title in [(axes[0], make_eight_gaussians(4000), "8 gaussians (classic source)"),
                       (axes[1], target, "two moons (target)"),
                       (axes[2], gen, "generated (CFM + EPiC)")]:
    ax.scatter(pts[:, 0], pts[:, 1], s=2, alpha=0.4)
    ax.set_title(title); ax.set_xlim(-3, 3); ax.set_ylim(-3, 3)
fig.tight_layout()
'''),
    code('''
from scipy.stats import wasserstein_distance
print("W1(x) =", wasserstein_distance(gen[:, 0], target[:, 0]))
print("W1(y) =", wasserstein_distance(gen[:, 1], target[:, 1]))
'''),
])


# --------------------------------------------------- 03 eval single jet type
NB03 = notebook([
    md("""
# 03 — Evaluating a JetNet model (one jet type)

Train a small EPiC-FM model on top jets, then run the full evaluation
stack: batched generation → W1 distances (mass / particle features) →
reverse KLD → comparison plots. Mirrors the reference's
`notebooks/03_eval_jetnet_one_jettype.ipynb`. For a trained checkpoint,
use `scripts/eval_ckpt.py` or `python -m particle_fm_tpu.evaluate` instead
of the quick training below.
"""),
    SETUP,
    code('''
from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer

dm = JetNetDataModule(jet_type=("t",), num_particles=30, batch_size=256,
                      synthetic=True, synthetic_num_jets=6000)
dm.setup()
model = FlowMatchingModel(model="epic", features=3, num_particles=30,
                          hidden_dim=64, latent=8, layers=4, frequencies=16,
                          loss_type="FM-OT",
                          global_cond_dim=dm.num_cond_features,
                          local_cond_dim=dm.num_cond_features)
trainer = Trainer(model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
                  max_epochs=8, verbose=False)
trainer.fit()
'''),
    md("## Generation\n\n`generate_data` batches the sampling, inverse-normalizes back to physical units, re-masks, and times everything except the first (compile) batch — exactly like the reference's `utils/data_generation.py`."),
    code('''
from particle_fm_tpu.eval.generation import generate_data

n_gen = min(2000, len(dm.tensor_test))
variables = jax.device_get(trainer.state.variables(ema=True))
gen, gen_time = generate_data(
    model, variables, num_jet_samples=n_gen, batch_size=512,
    cond=dm.tensor_conditioning_test[:n_gen],
    variable_set_sizes=True, mask=dm.mask_test[:n_gen],
    normalized_data=True, means=dm.means, stds=dm.stds,
    ode_solver="midpoint", ode_steps=100,
)
real = dm.tensor_test[:n_gen]
print(f"generated {gen.shape} in {gen_time:.2f}s")
'''),
    md("## W1 distances\n\nThe headline metrics: W1M (jet mass), W1P (particle features), optionally W1EFP — bootstrap mean ± std over random subsets."),
    code('''
from particle_fm_tpu.eval.metrics import calculate_all_wasserstein_metrics

w_dists = calculate_all_wasserstein_metrics(
    real, gen, num_eval_samples=1000, num_batches=5, calculate_efps=True,
)
w_dists
'''),
    md("## Reverse KLD (per particle feature)"),
    code('''
from particle_fm_tpu.eval.metrics import reversed_kl_divergence_batched_bootstrapping

m_real = dm.mask_test[:n_gen, :, 0] > 0
m_gen = np.abs(gen).sum(-1) > 0
for i, name in enumerate(["eta_rel", "phi_rel", "pt_rel"]):
    mean, std = reversed_kl_divergence_batched_bootstrapping(
        real[..., i][m_real], gen[..., i][m_gen],
        num_eval_samples=1000, num_batches=4, nbins=40,
    )
    print(f"KLD({name}) = {mean:.4f} +- {std:.4f}")
'''),
    md("## Plots"),
    code('''
from particle_fm_tpu.eval.plotting import plot_data

fig = plot_data(real, gen, save_path=None)
'''),
])


# ------------------------------------------------ 04 eval multiple jet types
NB04 = notebook([
    md("""
# 04 — Evaluating a multi-jet-type JetNet model

One conditional model for several jet types (t / q / g one-hot
conditioning), evaluated per type. Mirrors the reference's
`notebooks/04_eval_jetnet_multiple_jettype.ipynb`.
"""),
    SETUP,
    code('''
from particle_fm_tpu.data.jetnet import JetNetDataModule
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer

dm = JetNetDataModule(jet_type=("t", "q", "g"), num_particles=30, batch_size=256,
                      synthetic=True, synthetic_num_jets=9000)
dm.setup()
print("conditioning dims:", dm.num_cond_features)  # 3 one-hot + pt/eta/mass/mult
model = FlowMatchingModel(model="epic", features=3, num_particles=30,
                          hidden_dim=64, latent=8, layers=4, frequencies=16,
                          loss_type="FM-OT",
                          global_cond_dim=dm.num_cond_features,
                          local_cond_dim=dm.num_cond_features)
trainer = Trainer(model=model, datamodule=dm, optimizer=make_optimizer(lr=1e-3),
                  max_epochs=8, loss_per_jettype=True, verbose=False)
trainer.fit()
{k: v for k, v in trainer.metrics_history[-1].items() if "val_loss" in k}
'''),
    md("## Per-type generation + W1\n\nThe conditioning vector carries the one-hot jet type, so generating per type is just slicing the test conditioning by its type columns."),
    code('''
from particle_fm_tpu.eval.generation import generate_data
from particle_fm_tpu.eval.metrics import calculate_all_wasserstein_metrics

from particle_fm_tpu.data.utils import inverse_normalize_tensor

variables = jax.device_get(trainer.state.variables(ema=True))
# the first len(jet_type) conditioning columns are the one-hot type;
# undo the per-column normalization before argmax
cond_phys = inverse_normalize_tensor(dm.tensor_conditioning_test,
                                     dm.cond_means, dm.cond_stds,
                                     sigma=dm.normalize_sigma)
labels = np.argmax(cond_phys[:, :3], axis=1)
results = {}
for i, jt in enumerate(("t", "q", "g")):
    sel = np.where(labels == i)[0][:1000]
    gen, _ = generate_data(
        model, variables, num_jet_samples=len(sel), batch_size=512,
        cond=dm.tensor_conditioning_test[sel],
        variable_set_sizes=True, mask=dm.mask_test[sel],
        normalized_data=True, means=dm.means, stds=dm.stds,
        ode_steps=50,
    )
    w = calculate_all_wasserstein_metrics(dm.tensor_test[sel], gen,
                                          num_eval_samples=500, num_batches=4)
    results[jt] = {k: v for k, v in w.items() if k.endswith("mean")}
results
'''),
    md("## Side-by-side plots per type"),
    code('''
from particle_fm_tpu.eval.plotting import plot_data

sel = np.where(labels == 0)[0][:1000]
gen_t, _ = generate_data(model, variables, num_jet_samples=len(sel), batch_size=512,
                         cond=dm.tensor_conditioning_test[sel],
                         variable_set_sizes=True, mask=dm.mask_test[sel],
                         normalized_data=True, means=dm.means, stds=dm.stds,
                         ode_steps=50)
fig = plot_data(dm.tensor_test[sel], gen_t, save_path=None)
'''),
])


# --------------------------------------------------------- 05 lhco full eval
NB05 = notebook([
    md("""
# 05 — LHCO full evaluation (two-stage pipeline)

The complete LHCO anomaly-detection workflow, mirroring the reference's
`notebooks/05_lhco_full_eval.ipynb`:

1. **Stage 1** — flat FM model on dijet jet features, conditioned on mjj.
2. **Stage 2** — EPiC-FM on jet constituents, conditioned on stage-1 features.
3. **Generation in the signal region** — sample SR jet features, condition
   the constituent model on them, re-cluster the generated events with the
   **native anti-kt** (C++ `fastjet_lite`).

Synthetic data below; with the real LHCO files, point the datamodules at
`data/lhco/` and use `scripts/generate_data_lhco.py` for the scripted run.
"""),
    SETUP,
    md("## Stage 1: jet features | mjj"),
    code('''
from particle_fm_tpu.data.lhco import LHCODataModule, LHCOJetFeatureDataModule
from particle_fm_tpu.models.flow_matching import FlowMatchingModel
from particle_fm_tpu.models.flow_matching_flat import FlatFlowMatchingModel
from particle_fm_tpu.parallel.train import make_optimizer
from particle_fm_tpu.training.trainer import Trainer

dm1 = LHCOJetFeatureDataModule(batch_size=128, synthetic=True, synthetic_num_events=4000)
dm1.setup()
model1 = FlatFlowMatchingModel(features=10, cond_dim=1)
t1 = Trainer(model=model1, datamodule=dm1, optimizer=make_optimizer(lr=1e-3),
             max_epochs=10, verbose=False)
t1.fit()
t1.metrics_history[-1]
'''),
    md("## Stage 2: constituents | jet features"),
    code('''
dm2 = LHCODataModule(jet_type="x", num_particles=32, batch_size=128,
                     synthetic=True, synthetic_num_events=4000)
dm2.setup()
cond_dim = dm2.tensor_conditioning_train.shape[-1]
model2 = FlowMatchingModel(model="epic", features=3, num_particles=32,
                           hidden_dim=64, latent=8, layers=4, frequencies=16,
                           loss_type="FM-OT",
                           global_cond_dim=cond_dim, local_cond_dim=cond_dim)
t2 = Trainer(model=model2, datamodule=dm2, optimizer=make_optimizer(lr=1e-3),
             max_epochs=10, verbose=False)
t2.fit()
t2.metrics_history[-1]
'''),
    md("## Chained generation in the signal region\n\nStage-1 output (normalized dijet features) splits per jet; the leading jet's features condition the constituent model."),
    code('''
import jax.numpy as jnp

n = min(512, len(dm1.tensor_conditioning_test_sr), len(dm2.mask_test_sr))
cond_sr = jnp.asarray(dm1.tensor_conditioning_test_sr[:n])   # normalized mjj
stage1_features = model1.sample(t1.state.variables(ema=True),
                                jax.random.PRNGKey(4), n_samples=n,
                                cond=cond_sr, ode_steps=50)
jet_x = np.asarray(stage1_features).reshape(n, 2, 5)[:, 0, :cond_dim]
samples = model2.sample(t2.state.variables(ema=True), jax.random.PRNGKey(5),
                        n_samples=n, cond=jnp.asarray(jet_x),
                        mask=jnp.asarray(dm2.mask_test_sr[:n]), ode_steps=50)
samples.shape
'''),
    md("## Re-clustering with the native anti-kt\n\nUndo the normalization back to physical (eta, phi, pt), flatten to event clouds, and cluster (R = 1.0, top-2 jets) with the C++ `fastjet_lite` backend."),
    code('''
from particle_fm_tpu.data.utils import inverse_normalize_tensor
from particle_fm_tpu.eval.lhco_utils import cluster_data

phys = inverse_normalize_tensor(np.asarray(samples), dm2.means, dm2.stds,
                                sigma=dm2.normalize_sigma)
phys = phys * np.asarray(dm2.mask_test_sr[:n])
events = phys[..., [2, 0, 1]]                       # (eta,phi,pt) -> (pt,eta,phi)
jet_data, consts, mask = cluster_data(events, num_particles=32)
print("clustered jets:", jet_data.shape)
'''),
    md("## mjj of the generated events"),
    code('''
import matplotlib.pyplot as plt
from particle_fm_tpu.data.utils import get_mjj

mjj_gen = get_mjj(jet_data[:, 0], jet_data[:, 1])
plt.hist(mjj_gen[np.isfinite(mjj_gen)], bins=40, histtype="step", label="generated")
plt.xlabel("mjj [GeV]"); plt.legend();
'''),
    md("For classifier-based evaluation of generated vs real events (the CWoLa-style test), see `scripts/classifier_test.py` and `configs/experiment/lhco/epic_classifier.yaml`."),
])


NOTEBOOKS = {
    "01_training.ipynb": NB01,
    "02_flow_matching_on_eight_moons.ipynb": NB02,
    "03_eval_jetnet_one_jettype.ipynb": NB03,
    "04_eval_jetnet_multiple_jettype.ipynb": NB04,
    "05_lhco_full_eval.ipynb": NB05,
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, nb in NOTEBOOKS.items():
        path = os.path.join(OUT, name)
        with open(path, "w") as f:
            json.dump(nb, f, indent=1)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
