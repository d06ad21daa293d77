from particle_fm_tpu.training.ema import ema_update
from particle_fm_tpu.training.lr_schedules import (
    cosine_warmup_schedule,
    warmup_to_constant_schedule,
    onecycle_cooldown_schedule,
)

__all__ = [
    "ema_update",
    "cosine_warmup_schedule",
    "warmup_to_constant_schedule",
    "onecycle_cooldown_schedule",
]
