"""Metrics / logging / observability.

Equivalent of the reference's allogger usage (SURVEY.md §5.5): scoped
loggers, per-key step counters, tensorboard output, and a settings snapshot.
Additions over the reference: an always-on machine-readable ``metrics.jsonl``
stream, and per-phase wall-clock timers backed by ``jax.profiler`` trace
hooks for TPU tracing (the reference had no profiling support, SURVEY §5.1).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Scoped metric logger with per-key step counters.

    TensorBoard events are written when torch.utils.tensorboard is available;
    a metrics.jsonl stream is always written.
    """

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.step_per_key = {}
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(logdir, "tb"))
            except Exception:
                self._tb = None

    def log(self, value, key: str, step: Optional[int] = None, scope: str = ""):
        full_key = f"{scope}/{key}" if scope else key
        if step is None:
            step = self.step_per_key.get(full_key, 0)
            self.step_per_key[full_key] = step + 1
        value = float(value)
        self._jsonl.write(json.dumps(
            {"key": full_key, "value": value, "step": step, "t": time.time()}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(full_key, value, step)

    def info(self, msg: str):
        print(msg, flush=True)

    @contextlib.contextmanager
    def phase_timer(self, name: str, step: Optional[int] = None):
        """Wall-clock a phase and log it as ``<name>_time`` (SURVEY §5.1)."""
        t0 = time.perf_counter()
        yield
        self.log(time.perf_counter() - t0, key=f"{name}_time", step=step)

    @contextlib.contextmanager
    def device_trace(self, trace_dir: Optional[str] = None):
        """Capture a jax.profiler trace around a block (view in tensorboard)."""
        import jax
        out = trace_dir or os.path.join(self.logdir, "traces")
        jax.profiler.start_trace(out)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


_LOGGERS = {}


def get_logger(logdir: str = "results/default", scope: str = "",
               use_tensorboard: bool = True) -> MetricsLogger:
    if logdir not in _LOGGERS:
        _LOGGERS[logdir] = MetricsLogger(logdir, use_tensorboard)
    return _LOGGERS[logdir]
