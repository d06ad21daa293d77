from particle_fm_tpu.data.base import ArrayDataModule
from particle_fm_tpu.data.jetnet import JetNetDataModule

__all__ = ["ArrayDataModule", "JetNetDataModule"]
