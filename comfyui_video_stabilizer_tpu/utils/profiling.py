"""Stage timing + device profiling observability.

The reference's only instrumentation is the ComfyUI progress bar; its
meta JSON is the observability channel (SURVEY 5).  The TPU framework
adds two optional layers:

* ``stage_timer`` — cheap host-side wall-clock accounting per pipeline
  stage, attached to the result meta as ``timing`` when enabled
  (CVST_TIMING=1 or ``enable_timing()``), so production deployments
  can watch estimation/solve/warp costs per clip.
* ``device_trace`` — a context manager around ``jax.profiler`` for
  capturing XLA/TPU traces of a pipeline run (CVST_TRACE_DIR or
  explicit path).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator

_ENABLED = os.environ.get("CVST_TIMING", "") not in ("", "0")


def enable_timing(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def timing_enabled() -> bool:
    return _ENABLED


class StageTimer:
    """Accumulates per-stage wall-clock seconds; cheap when disabled."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        if not _ENABLED:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0)

    def attach(self, meta: dict) -> dict:
        if _ENABLED and self.stages:
            meta["timing"] = {k: round(v, 6) for k, v in self.stages.items()}
        return meta


@contextlib.contextmanager
def device_trace(trace_dir: str | None = None) -> Iterator[None]:
    """Capture a jax.profiler trace around a pipeline run."""
    trace_dir = trace_dir or os.environ.get("CVST_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
