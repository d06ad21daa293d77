"""particle_fm_tpu — a TPU-native JAX framework for generative models on particle clouds.

A from-scratch rebuild of the capabilities of `ewencedr/particle_fm` (PyTorch/Lightning)
designed TPU-first: flax.linen networks compiled by XLA, `lax.scan` ODE/SDE samplers,
data-parallel training over a `jax.sharding.Mesh`, Pallas kernels for the hot set-ops,
and a host-side (numpy) physics evaluation suite.

Layout
------
ops/        masked-set primitives + Pallas kernels
nets/       vector-field architectures (EPiC, transformers, MDMA, MLPs)
losses/     FM / CFM / OT-CFM / VP-diffusion (PC-JeDi) / Droid objectives
samplers/   jitted ODE (euler/midpoint/heun/rk4/dopri5) and SDE (EM) / DDIM loops
models/     CNF wrapper + FlowMatchingModel / flat-vector variant / classifiers
parallel/   mesh + sharded train/eval steps
data/       datamodules (JetNet, LHCO, JetClass, CaloChallenge) + preprocessing
eval/       W1 metrics, EFPs, substructure, generation driver, plotting
training/   trainer loop, EMA, LR schedules, orbax checkpoints
config/     YAML compose system (groups + experiment overlays)
"""

__version__ = "0.1.0"
