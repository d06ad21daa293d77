from particle_fm_tpu.eval.metrics import (
    wasserstein_distance_batched,
    calculate_wasserstein_metrics_jets,
    calculate_all_wasserstein_metrics,
    kl_divergence,
    histedges_equalN,
    calc_reverse_kld,
    reversed_kl_divergence_batched_bootstrapping,
)
from particle_fm_tpu.eval.generation import generate_data

__all__ = [
    "wasserstein_distance_batched",
    "calculate_wasserstein_metrics_jets",
    "calculate_all_wasserstein_metrics",
    "kl_divergence",
    "histedges_equalN",
    "calc_reverse_kld",
    "reversed_kl_divergence_batched_bootstrapping",
    "generate_data",
]
