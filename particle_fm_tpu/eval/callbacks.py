"""Evaluation callbacks: mid-training generation + physics metrics.

One parametrized harness replaces the reference's per-dataset copy-pasted
callbacks (callbacks/jetnet_eval.py:35-315 and clones). Skeleton preserved:
on a logging schedule -> fixed seed -> EMA weights -> generate_data (batched,
timed excluding warm-up) -> inverse-normalize -> W1 metrics -> log (metrics
feed the metric-keyed checkpoints) -> optional plots.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np

from particle_fm_tpu.eval.generation import generate_data
from particle_fm_tpu.eval.metrics import calculate_all_wasserstein_metrics
from particle_fm_tpu.training.logging_scheduler import should_log


@dataclass
class JetNetEvalCallback:
    """In-training eval: W1M/W1P(/W1EFP) on generated vs held-out jets."""

    every_n_epochs: int | str = 10
    num_jet_samples: int = 10000
    generation_batch_size: int = 1024
    w1_kwargs: dict = field(default_factory=lambda: dict(num_batches=5, num_eval_samples=10000))
    calculate_efps: bool = False
    use_ema: bool = True
    ode_solver: str = "midpoint"
    ode_steps: int = 100
    split: str = "test"
    on_test: bool = False  # also run inside trainer.test()
    seed: int = 9999  # fixed eval seed, parity with the reference

    def _arrays(self, dm):
        real = getattr(dm, f"tensor_{self.split}")
        mask = getattr(dm, f"mask_{self.split}")
        cond = getattr(dm, f"tensor_conditioning_{self.split}")
        return real, mask, cond

    def __call__(self, trainer) -> Optional[dict]:
        if not should_log(self.every_n_epochs, trainer.epoch):
            return None
        dm = trainer.datamodule
        real, mask, cond = self._arrays(dm)
        n = min(self.num_jet_samples, len(real))
        variables = jax.device_get(trainer.state.variables(ema=self.use_ema))

        gen, gen_time = generate_data(
            trainer.model,
            variables,
            num_jet_samples=n,
            rng=jax.random.PRNGKey(self.seed),
            batch_size=self.generation_batch_size,
            cond=cond[:n] if cond is not None else None,
            variable_set_sizes=dm.variable_jet_sizes,
            mask=mask[:n] if mask is not None else None,
            normalized_data=dm.means is not None,
            normalize_sigma=getattr(dm, "normalize_sigma", 5),
            means=dm.means,
            stds=dm.stds,
            ode_solver=self.ode_solver,
            ode_steps=self.ode_steps,
        )
        w1 = calculate_all_wasserstein_metrics(
            real[:n],
            gen,
            calculate_efps=self.calculate_efps,
            **self.w1_kwargs,
        )
        w1["generation_time"] = gen_time
        return w1
