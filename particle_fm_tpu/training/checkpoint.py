"""Checkpointing: orbax-backed, metric-keyed top-k retention + EMA twins.

The reference keeps 3 ModelCheckpoints (val/loss, w1m_mean, w1p_mean), a
`last` checkpoint, and EMA twin files per checkpoint
(callbacks/ema.py:182-294, configs/callbacks/jetnet/jetnet.yaml). Here one
orbax checkpoint stores the full TrainState (params + EMA params + opt state
+ norm stats + step), and retention is metric-keyed per monitor: directory
names embed the metric value (like the reference's filename-parsing top-k).
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field

import jax
import numpy as np
import orbax.checkpoint as ocp


def _sanitize(v: float) -> str:
    return f"{v:.6f}".replace("-", "m")


def _parse(name: str) -> float:
    m = re.search(r"metric_(m?[\d.]+)", name)
    if not m:
        return np.inf
    return float(m.group(1).replace("m", "-"))


@dataclass
class CheckpointManager:
    """Save/restore TrainState with per-monitor top-k retention.

    directory layout:
      {dir}/last/                      always the latest state
      {dir}/{monitor}/step_{s}_metric_{v}/   top-k per monitored metric
    """

    directory: str
    monitors: dict = field(default_factory=lambda: {"val_loss": "min"})
    top_k: int = 1

    def __post_init__(self):
        self.directory = os.path.abspath(self.directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ----------------------------------------------------------------- io
    def _save(self, path: str, state) -> None:
        if os.path.exists(path):
            shutil.rmtree(path)
        # pull to host first: orbax's per-array replica-slice transfer is
        # ~35x slower than one bulk device_get for replicated states
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()

    def save_last(self, state) -> str:
        path = os.path.join(self.directory, "last")
        self._save(path, state)
        return path

    def save_metric(self, state, monitor: str, value: float, step: int) -> str | None:
        """Save iff `value` makes the monitor's top-k; prune beyond top_k."""
        mode = self.monitors.get(monitor, "min")
        mdir = os.path.join(self.directory, monitor)
        os.makedirs(mdir, exist_ok=True)
        existing = sorted(os.listdir(mdir), key=_parse, reverse=(mode == "max"))
        sign = 1.0 if mode == "min" else -1.0
        if len(existing) >= self.top_k:
            worst = existing[-1]
            if sign * value >= sign * _parse(worst):
                return None
        path = os.path.join(mdir, f"step_{step}_metric_{_sanitize(value)}")
        self._save(path, state)
        # prune
        entries = sorted(os.listdir(mdir), key=lambda n: sign * _parse(n))
        for stale in entries[self.top_k :]:
            shutil.rmtree(os.path.join(mdir, stale))
        return path

    def best_path(self, monitor: str) -> str | None:
        mdir = os.path.join(self.directory, monitor)
        if not os.path.isdir(mdir) or not os.listdir(mdir):
            return None
        mode = self.monitors.get(monitor, "min")
        sign = 1.0 if mode == "min" else -1.0
        best = sorted(os.listdir(mdir), key=lambda n: sign * _parse(n))[0]
        return os.path.join(mdir, best)

    def last_path(self) -> str | None:
        path = os.path.join(self.directory, "last")
        return path if os.path.exists(path) else None

    def restore(self, path: str, target):
        """Restore into the structure of `target` (a concrete TrainState)."""
        return self._ckptr.restore(os.path.abspath(path), target=target)  # orbax requires absolute


def restore_state(path: str, target):
    """Standalone restore (no manager needed)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def load_weights_from(path: str, state):
    """Load params + EMA params from a checkpoint into a fresh TrainState,
    keeping the new optimizer state and step counter (the reference's
    `load_weights_from` fine-tuning hook, train.py:100-102)."""
    loaded = restore_state(path, state)
    return state.replace(params=loaded.params, ema_params=loaded.ema_params)
