"""Metric logging: JSONL always, TensorBoard when available.

The reference logs to TensorBoard + MLflow (utils/misc.py:75-78). MLflow is
not part of the TPU image, so the durable record is a machine-readable
``metrics.jsonl`` (one line per logged step); TensorBoard event files are
written too when torch's SummaryWriter is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "run"):
        self.log_dir = os.path.join(log_dir, name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            pass

    def log_metrics(self, metrics: Dict[str, float], step: int):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def next_version_dir(base: str, name: str) -> str:
    """logs/<name>/version_N directory allocation (Lightning-style)."""
    root = os.path.join(base, name)
    os.makedirs(root, exist_ok=True)
    versions = [
        int(d.split("_")[1])
        for d in os.listdir(root)
        if d.startswith("version_") and d.split("_")[1].isdigit()
    ]
    v = max(versions) + 1 if versions else 0
    path = os.path.join(root, f"version_{v}")
    os.makedirs(path, exist_ok=True)
    return path
