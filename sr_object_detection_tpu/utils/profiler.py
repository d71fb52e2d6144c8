"""Tracing / profiling harness.

The reference has only printf wall-clocks (SURVEY §5.1: sec() around
data loading/steps, the 'speed' command, demo FPS counter). TPU-native
observability is structured:

  * :class:`StepTimer` — EMA'd phase timers for train loops (load /
    step / total), the structured version of detector.c:110-149's
    printfs;
  * :func:`trace` — context manager around jax.profiler for real XLA
    traces viewable in TensorBoard/Perfetto;
  * :func:`mfu` — model FLOPs utilization from the analytic FLOPs
    ('ops' command formula) and measured step time;
  * :class:`MetricsLog` — JSON-lines metrics sink (the structured
    replacement for stdout loss lines).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


# bf16 peak FLOPs/s per chip. NB: v5e is 197 TFLOP/s bf16 — 394 is the
# int8 number and was wrongly used here in round 1 (halving reported
# MFU).
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


class StepTimer:
    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: dict[str, float] = {}
        self._open: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            prev = self.ema.get(name)
            self.ema[name] = dt if prev is None else \
                (1 - self.alpha) * prev + self.alpha * dt

    def summary(self) -> str:
        return " ".join(f"{k}={v*1e3:.1f}ms" for k, v in self.ema.items())


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sr_trace"):
    """Capture an XLA trace: `with profiler.trace(): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def mfu(flops_per_step: float, step_seconds: float,
        generation: str = "v5e", n_chips: int = 1) -> float:
    """Model FLOPs utilization vs peak."""
    peak = TPU_PEAK_FLOPS.get(generation, TPU_PEAK_FLOPS["v5e"]) * n_chips
    return flops_per_step / step_seconds / peak


def train_flops(spec, backward_multiplier: float = 3.0) -> float:
    """Per-image training FLOPs: forward + ~2x for backward."""
    from ..infer.engine import analytic_flops
    return analytic_flops(spec) * backward_multiplier


class MetricsLog:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: list[dict] = []

    def log(self, step: int, **metrics):
        row = {"step": step, "time": time.time(), **{
            k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                else v) for k, v in metrics.items()}}
        self.rows.append(row)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")
        return row


__all__ = ["StepTimer", "trace", "mfu", "train_flops", "MetricsLog",
           "TPU_PEAK_FLOPS"]
