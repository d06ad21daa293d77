from particle_fm_tpu.nets.common import WNDense, get_act, torch_linear_init
from particle_fm_tpu.nets.epic import EPiCLayer, EPiCEncoder
from particle_fm_tpu.nets.time_emb import (
    sincos_embedding,
    cosine_encoding,
    GaussianFourierProjection,
)

__all__ = [
    "WNDense",
    "get_act",
    "torch_linear_init",
    "EPiCLayer",
    "EPiCEncoder",
    "sincos_embedding",
    "cosine_encoding",
    "GaussianFourierProjection",
]
