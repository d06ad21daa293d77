"""Headline benchmark: sampled jets/sec/chip, JetNet-150 EPiC-FM, midpoint ODE.

Protocol (mirrors the reference's measurement conventions):
  - model: EPiC encoder, hidden 128, latent 10, 6 EPiC layers, cosine t-emb
    (reference configs/model/flow_matching.yaml defaults)
  - sampling: midpoint solver, ode_steps=100 (reference
    configs/callbacks/jetnet_eval.yaml:16-20), i.e. 99 steps x 2 NFE
  - batch 1024; the first batch is excluded from timing as compile/warm-up
    (reference utils/data_generation.py:82-83,125)

vs_baseline is measured against an *estimated* A100 eager-PyTorch throughput
for the same model/protocol, derived from a FLOPs model (~13.5 GFLOP/jet at
198 NFE, ~10% effective utilization on eager fp32/TF32): ~740 jets/s. The
reference repo publishes no benchmark numbers (BASELINE.md), so this anchor
is explicit and conservative; the target from BASELINE.json is >=10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from particle_fm_tpu.models.flow_matching import FlowMatchingModel

BASELINE_JETS_PER_SEC = 740.0  # estimated A100 eager-torch reference (see docstring)

BATCH = 1024
N_TIMED_BATCHES = 5
ODE_STEPS = 100
SOLVER = "midpoint"


def main():
    model = FlowMatchingModel(
        model="epic",
        features=3,
        num_particles=150,
        hidden_dim=128,
        latent=10,
        layers=6,
        frequencies=16,
        t_emb="cosine",
        t_local_cat=True,
        t_global_cat=True,
        add_time_to_input=False,
        loss_type="FM-OT",
        sigma=1e-4,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng)
    mask = jnp.ones((BATCH, 150, 1))

    # close over the weights: a deployed sampler holds its parameters (like
    # the torch reference's module) — re-passing the param pytree per call
    # costs ~25% in per-leaf dispatch overhead on this host
    @jax.jit
    def run(key):
        return model.sample(
            variables,
            key,
            n_samples=BATCH,
            mask=mask,
            ode_solver=SOLVER,
            ode_steps=ODE_STEPS,
        )

    def materialize(out):
        # On some PJRT plugins (axon relay) block_until_ready returns before
        # compilation/execution completes; a host transfer is the only
        # reliable fence, so sync on a scalar reduction.
        return float(jnp.sum(out))

    # warm-up batch (compile) — excluded from timing like the reference
    materialize(run(jax.random.PRNGKey(1)))

    t0 = time.perf_counter()
    for i in range(N_TIMED_BATCHES):
        materialize(run(jax.random.PRNGKey(2 + i)))
    dt = time.perf_counter() - t0

    jets_per_sec = BATCH * N_TIMED_BATCHES / dt
    print(
        json.dumps(
            {
                "metric": "sampled_jets_per_sec_per_chip_jetnet150_epicfm_nfe198",
                "value": round(jets_per_sec, 2),
                "unit": "jets/s/chip",
                "vs_baseline": round(jets_per_sec / BASELINE_JETS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
