"""API walkthrough: train an EPiC-FM model programmatically.

The runnable counterpart of the reference's notebooks/01_training.ipynb —
every layer of the framework touched once, end to end, on synthetic JetNet
data (works on any machine, no downloads):

    python examples/01_training.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from particle_fm_tpu.data.jetnet import JetNetDataModule
    from particle_fm_tpu.eval.callbacks import JetNetEvalCallback
    from particle_fm_tpu.models.flow_matching import FlowMatchingModel
    from particle_fm_tpu.parallel.train import make_optimizer
    from particle_fm_tpu.training.lr_schedules import cosine_warmup_schedule
    from particle_fm_tpu.training.trainer import Trainer
    from particle_fm_tpu.utils.helpers import count_parameters

    # ---------------------------------------------------------------- data
    dm = JetNetDataModule(
        jet_type=("t",),
        num_particles=30,
        batch_size=256,
        synthetic=True,          # drop this line to use the real JetNet files
        synthetic_num_jets=5000,
    )
    dm.setup()
    print(f"train jets: {len(dm.train)}, conditioning dims: {dm.num_cond_features}")

    # --------------------------------------------------------------- model
    model = FlowMatchingModel(
        model="epic",            # or droid_fulltransformer / droid_fullcrossattention / mdma
        features=3,
        num_particles=30,
        hidden_dim=128,
        latent=10,
        layers=6,
        frequencies=16,
        t_emb="cosine",
        t_local_cat=True,
        t_global_cat=True,
        add_time_to_input=False,
        loss_type="FM-OT",       # or CFM / CFM-OT / diffusion / droid
        global_cond_dim=dm.num_cond_features,
        local_cond_dim=dm.num_cond_features,
    )
    n_params = count_parameters(model.init(jax.random.PRNGKey(0))["params"])
    print(f"model parameters: {n_params:,}")

    # ------------------------------------------------------------- trainer
    out_dir = tempfile.mkdtemp(prefix="particle_fm_tpu_demo_")
    schedule = cosine_warmup_schedule(1e-3, warmup=2, max_iters=20,
                                      steps_per_epoch=dm.steps_per_epoch)
    trainer = Trainer(
        model=model,
        datamodule=dm,
        optimizer=make_optimizer(lr=schedule, weight_decay=5e-5, grad_clip=0.5),
        max_epochs=5,
        ema_decay=0.999,
        callbacks=[
            JetNetEvalCallback(
                every_n_epochs=5, num_jet_samples=1000, generation_batch_size=512,
                ode_steps=50, use_ema=False,
                w1_kwargs=dict(num_batches=5, num_eval_samples=1000),
            )
        ],
        ckpt_dir=os.path.join(out_dir, "checkpoints"),
        ckpt_monitors={"val_loss": "min", "w1m_mean": "min"},
        log_dir=out_dir,
    )
    trainer.fit()

    # ------------------------------------------------------------ sampling
    variables = jax.device_get(trainer.state.variables(ema=False))
    samples = model.sample(
        variables,
        jax.random.PRNGKey(0),
        n_samples=256,
        cond=jax.numpy.asarray(dm.tensor_conditioning_test[:256]),
        mask=jax.numpy.asarray(dm.mask_test[:256]),
        ode_solver="midpoint",
        ode_steps=100,
    )
    print(f"sampled {samples.shape} jets; outputs in {out_dir}")


if __name__ == "__main__":
    main()
