"""
Profiling / tracing hooks.

The reference has zero instrumentation beyond stderr progress
(SURVEY.md section 5).  Here: `jax.profiler` trace capture (viewable in
TensorBoard / Perfetto), named trace annotations for pipeline phases, and
a `device_memory` snapshot helper.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["trace", "annotate", "device_memory"]


@contextmanager
def trace(logdir, create_perfetto_link=False):
    """Capture a jax.profiler trace of the enclosed block into `logdir`."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named annotation context (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory(device=None):
    """Per-device memory stats dict (bytes in use / limit), if supported."""
    dev = device or jax.devices()[0]
    try:
        return dev.memory_stats() or {}
    except Exception:
        return {}
