from particle_fm_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from particle_fm_tpu.parallel.train import TrainState, make_train_step, make_eval_step

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
