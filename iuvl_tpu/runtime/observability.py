"""Tracing / profiling / experiment logging.

SURVEY.md §5: the reference has no profiler (only tqdm rates) and logs to
wandb (entry.py:17-33, default_trainer.py:231-237). TPU-native equivalents:

- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (device-time breakdown per module; annotate
  regions with ``jax.profiler.TraceAnnotation``).
- ``MetricsLogger``: JSONL run log (zero-egress replacement for wandb) with
  run-id persistence for resume, mirroring init_wandb's resume semantics.
- ``nan_guard``: enables jax debug_nans (the functional analog of the
  reference's TORCH_DISTRIBUTED_DEBUG + find_unused_parameters safety nets).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid
from typing import Any

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation  # usage: with annotate("backbone"): ...


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class MetricsLogger:
    """Append-only JSONL metrics log with resumable run id."""

    def __init__(self, run_dir: str, resume: bool = False):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        id_path = os.path.join(run_dir, "run_id")
        if resume and os.path.exists(id_path):
            with open(id_path) as f:
                self.run_id = f.read().strip()
        else:
            self.run_id = uuid.uuid4().hex[:12]
            with open(id_path, "w") as f:
                f.write(self.run_id)

    def log(self, step: int, metrics: dict[str, Any]):
        record = {
            "run_id": self.run_id,
            "step": int(step),
            "time": time.time(),
            **{k: (float(v) if hasattr(v, "__float__") else v)
               for k, v in metrics.items()},
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
