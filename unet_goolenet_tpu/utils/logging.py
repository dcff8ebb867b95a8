"""Structured metric logging.

The reference logs with bare prints (main.py:263-265). We keep the human-readable
prints and add a machine-readable JSONL stream per run (SURVEY.md §5: 'structured
metric logging + optional TB')."""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, run_name: str = "run",
                 tensorboard: bool = False):
        self.path = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.path = os.path.join(log_dir, f"{run_name}.jsonl")
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb", run_name))
                except ImportError:
                    pass  # TB is optional; JSONL is the source of truth
        self._t0 = time.time()

    def log(self, step: int, **metrics) -> None:
        scalars = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
            if not hasattr(v, "shape") or getattr(v, "ndim", 1) == 0
        }
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in scalars.items()
        )
        print(f"[step {step}] {msg}", flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(
                    {"step": step, "time": time.time() - self._t0, **scalars}) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    if isinstance(v, float):
                        tf.summary.scalar(k, v, step=step)
            self._tb.flush()
