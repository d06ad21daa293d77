from particle_fm_tpu.ops.masked import (
    masked_mean,
    masked_sum,
    meansum_pool,
    masked_mse,
    masked_huber,
    apply_mask,
)

__all__ = [
    "masked_mean",
    "masked_sum",
    "meansum_pool",
    "masked_mse",
    "masked_huber",
    "apply_mask",
]
