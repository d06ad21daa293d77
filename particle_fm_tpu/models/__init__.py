from particle_fm_tpu.models.cnf import CNF, CNFStack
from particle_fm_tpu.models.flow_matching import FlowMatchingModel

__all__ = ["CNF", "CNFStack", "FlowMatchingModel"]
