"""Metric logger backends.

Parity: the reference supports 6 Lightning logger backends behind configs
(configs/logger/{wandb,comet,tensorboard,mlflow,neptune,csv}.yaml). Here the
always-on backends are JSONL + CSV; TensorBoard rides the baked-in
tensorflow when available; wandb/comet/mlflow/neptune activate only if their
packages are importable (external services, not part of this image) —
MultiLogger skips unavailable ones with a warning. Select via the
configs/logger/ group (e.g. `logger=wandb`).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Optional


class JsonlLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")

    def log_metrics(self, metrics: dict, step: int) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({k: float(v) for k, v in metrics.items()}) + "\n")

    def close(self) -> None:
        pass


class CSVLogger:
    """Appends rows in O(1); the file is rewritten only when a new metric key
    widens the header (rare: typically once when eval callbacks first fire) —
    a 10k-epoch run logs in O(n), not O(n^2)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.csv")
        self._keys: list[str] = []
        self._rows: list[dict] = []

    def log_metrics(self, metrics: dict, step: int) -> None:
        row = {k: float(v) for k, v in metrics.items()}
        self._rows.append(row)
        new_keys = [k for k in row if k not in self._keys]
        if new_keys or not os.path.exists(self.path):
            self._keys.extend(new_keys)
            with open(self.path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._keys)
                w.writeheader()
                for r in self._rows:
                    w.writerow(r)
            return
        with open(self.path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._keys).writerow(row)

    def close(self) -> None:
        pass


class TensorBoardLogger:
    def __init__(self, log_dir: str):
        import tensorflow as tf  # baked into the image

        self._tf = tf
        self._writer = tf.summary.create_file_writer(os.path.join(log_dir, "tb"))

    def log_metrics(self, metrics: dict, step: int) -> None:
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, float(v), step=step)
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


class WandbLogger:  # pragma: no cover - external service
    def __init__(self, log_dir: str, **kwargs):
        import wandb

        self._run = wandb.init(dir=log_dir, **kwargs)

    def log_metrics(self, metrics: dict, step: int) -> None:
        self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        self._run.finish()


class CometLogger:  # pragma: no cover - external service
    def __init__(self, log_dir: str, **kwargs):
        import comet_ml

        self._exp = comet_ml.Experiment(**kwargs)

    def log_metrics(self, metrics: dict, step: int) -> None:
        self._exp.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        self._exp.end()


class MLFlowLogger:  # pragma: no cover - external service
    def __init__(self, log_dir: str, **kwargs):
        import mlflow

        self._mlflow = mlflow
        mlflow.set_tracking_uri(kwargs.pop("tracking_uri", f"file:{log_dir}/mlruns"))
        if "experiment_name" in kwargs:
            mlflow.set_experiment(kwargs.pop("experiment_name"))
        self._run = mlflow.start_run(**kwargs)

    def log_metrics(self, metrics: dict, step: int) -> None:
        self._mlflow.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def close(self) -> None:
        self._mlflow.end_run()


class NeptuneLogger:  # pragma: no cover - external service
    def __init__(self, log_dir: str, **kwargs):
        import neptune

        self._run = neptune.init_run(**kwargs)

    def log_metrics(self, metrics: dict, step: int) -> None:
        for k, v in metrics.items():
            self._run[k].append(float(v), step=step)

    def close(self) -> None:
        self._run.stop()


_BACKENDS = {
    "jsonl": JsonlLogger,
    "csv": CSVLogger,
    "tensorboard": TensorBoardLogger,
    "wandb": WandbLogger,
    "comet": CometLogger,
    "mlflow": MLFlowLogger,
    "neptune": NeptuneLogger,
}


class MultiLogger:
    """Fan-out to the configured backends; unavailable ones are skipped with
    a warning (e.g. tensorboard without tensorflow, wandb offline)."""

    def __init__(self, log_dir: str, backends: tuple = ("jsonl",), **kwargs):
        self.loggers = []
        for name in backends:
            try:
                self.loggers.append(_BACKENDS[name](log_dir, **kwargs.get(name, {})))
            except Exception as e:  # missing optional dep
                print(f"[loggers] backend {name!r} unavailable: {e}")

    def log_metrics(self, metrics: dict, step: int) -> None:
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def close(self) -> None:
        for lg in self.loggers:
            lg.close()
