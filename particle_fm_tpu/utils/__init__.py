from particle_fm_tpu.utils.pylogger import get_pylogger
from particle_fm_tpu.utils.helpers import task_wrapper, print_config_tree, count_parameters

__all__ = ["get_pylogger", "task_wrapper", "print_config_tree", "count_parameters"]
