"""Task orchestration helpers.

Parity: particle_fm/utils/utils.py:16-209 — `task_wrapper` (exception
logging + cleanup), rich config printing (plain-yaml here), parameter
counting for hyperparameter logging.
"""

from __future__ import annotations

import functools
import os
import traceback
from typing import Callable

import yaml

from particle_fm_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def task_wrapper(task_func: Callable) -> Callable:
    """Run a task; on failure write the traceback next to the run outputs and
    re-raise (parity: utils/utils.py:16-55)."""

    @functools.wraps(task_func)
    def wrap(cfg: dict, *args, **kwargs):
        try:
            return task_func(cfg, *args, **kwargs)
        except Exception:
            out_dir = cfg.get("output_dir", ".")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "exec_error.log"), "a") as f:
                f.write(traceback.format_exc())
            log.error("Task failed — traceback saved to exec_error.log")
            raise
        finally:
            log.info("Task finished (loggers closed).")

    return wrap


def print_config_tree(cfg: dict) -> None:
    """Print the resolved config (the reference uses rich; plain yaml here)."""
    print(yaml.safe_dump(cfg, sort_keys=False))


def count_parameters(params) -> int:
    """Total trainable parameter count of a pytree (utils.py:133-176 analogue)."""
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))
