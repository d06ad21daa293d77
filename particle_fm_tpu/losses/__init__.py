from particle_fm_tpu.losses.diffusion import (
    VPDiffusionSchedule,
    cosine_diffusion_schedule,
    cosine_beta_schedule,
)
from particle_fm_tpu.losses.flow_matching import (
    fm_ot_loss,
    cfm_loss,
    cfm_ot_loss,
    diffusion_loss,
    droid_loss,
    get_loss_fn,
)

__all__ = [
    "VPDiffusionSchedule",
    "cosine_diffusion_schedule",
    "cosine_beta_schedule",
    "fm_ot_loss",
    "cfm_loss",
    "cfm_ot_loss",
    "diffusion_loss",
    "droid_loss",
    "get_loss_fn",
]
