"""Profiling / tracing helpers.

The reference's observability is an opt-in gperftools build plus
ad-hoc ``Timer`` prints (SURVEY.md §5.1).  The TPU equivalents:

* :class:`spectavi_tpu.pipeline.io.Timer` — per-step wall clock;
* :func:`trace` — a ``jax.profiler`` trace context writing a
  TensorBoard-compatible profile (kernel timelines, HBM, roofline);
* :func:`annotate` — named trace spans around host-side stages.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/spectavi_tpu_profile"):
    """Capture a device profile for the enclosed block.

    View with TensorBoard: ``tensorboard --logdir <logdir>``.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named span that shows up on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
