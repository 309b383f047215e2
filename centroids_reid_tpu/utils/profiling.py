"""First-class profiling hooks (the reference has none, SURVEY.md §5).

Two entry points:
* ``profile_trace(log_dir)`` — context manager writing a jax.profiler trace
  viewable in TensorBoard / Perfetto; wired to ``TPU.PROFILE`` in the fit
  loop (traces land in ``<LOG_DIR>/traces``);
* ``annotate(name)`` — named TraceAnnotation so host phases (decode,
  augment dispatch, eval) show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    if not enabled:
        yield
        return
    trace_dir = os.path.join(log_dir, "traces")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named region on the profiler timeline (host side)."""
    return jax.profiler.TraceAnnotation(name)


def step_marker(name: str, step: int):
    return jax.profiler.StepTraceAnnotation(name, step_num=step)
