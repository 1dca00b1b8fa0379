"""jax.profiler integration: capture device traces for kernel inspection.

SURVEY §5: the reference's only observability was emoji print lines; here
profiling is a first-class helper. Traces open in TensorBoard/XProf
(`tensorboard --logdir <dir>`) or Perfetto.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax


@contextmanager
def capture_trace(log_dir: str = "/tmp/mediquery_trace"):
    """Profile everything inside the context onto disk.

    Example:
        with capture_trace("/tmp/trace"):
            index.search(q, k=10)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(label: str):
    """Name a region so it shows up on the trace timeline."""
    with jax.profiler.TraceAnnotation(label):
        yield
