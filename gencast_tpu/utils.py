"""Observability utilities: profiling traces and throughput meters."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
  """jax.profiler trace context; no-op when log_dir is None.

  View with TensorBoard (installed) or xprof: the trace includes XLA HLO
  timelines per device.
  """
  if log_dir is None:
    yield
    return
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Throughput:
  """Steps/sec meter with exponential smoothing, for training loops."""

  def __init__(self, smoothing: float = 0.9):
    self._smoothing = smoothing
    self._last: Optional[float] = None
    self._rate: Optional[float] = None

  def tick(self, steps: int = 1) -> Optional[float]:
    now = time.time()
    if self._last is not None:
      inst = steps / max(now - self._last, 1e-9)
      self._rate = (inst if self._rate is None else
                    self._smoothing * self._rate
                    + (1 - self._smoothing) * inst)
    self._last = now
    return self._rate

  @property
  def rate(self) -> Optional[float]:
    return self._rate
