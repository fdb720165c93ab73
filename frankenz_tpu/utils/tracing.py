"""
Profiling / tracing hooks.

The reference has zero instrumentation beyond stderr progress
(SURVEY.md section 5).  Here: `jax.profiler` trace capture (viewable in
TensorBoard / Perfetto), named trace annotations for pipeline phases, a
`device_memory` snapshot helper, and the xplane-parsing measurement
utilities (`collect_device_events` / `profile_device_busy`) that
bench.py's MFU / MXU-duty numbers are computed from.
"""

from __future__ import annotations

import glob
import os
from collections import Counter
from contextlib import contextmanager

import jax

__all__ = ["trace", "annotate", "device_memory", "collect_device_events",
           "profile_device_busy"]


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


def collect_device_events(logdir, plane_filter="TPU"):
    """Per-event summed durations (seconds) from a captured trace.

    Parses the first `.xplane.pb` under `logdir` and sums event
    durations over every plane whose name contains `plane_filter`
    (device planes are named like "/device:TPU:0 ..."; pass "" to take
    every plane).  Returns {event_name: seconds}, or None when no
    trace file exists / parsing fails.
    """
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        return None
    try:
        pdta = jax.profiler.ProfileData.from_file(files[0])
    except Exception:
        return None
    out = Counter()
    for plane in pdta.planes:
        if plane_filter not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                out[ev.name] += (ev.duration_ns or 0) / 1e9
    return dict(out)


def profile_device_busy(fn, args_list, prefix="jit_", plane_filter="TPU"):
    """Measure `fn`'s on-device busy time with a jax.profiler trace.

    Runs `fn(*args)` for each tuple in `args_list` under one trace and
    sums device-plane events carrying the compiled-module `prefix`
    (each module execution appears once per launch; op-level children
    are excluded to avoid double counting).  Returns
    ``(busy_seconds_per_call, events)`` where `events` is the full
    per-event duration dict (for finer breakdowns), or (None, None)
    when the trace can't be captured or parsed.
    """
    import tempfile

    logdir = tempfile.mkdtemp(prefix="fz_trace_")
    try:
        with trace(logdir):
            outs = [fn(*args) for args in args_list]
            jax.block_until_ready(outs)
    except Exception:
        return None, None
    events = collect_device_events(logdir, plane_filter=plane_filter)
    if not events:
        return None, None
    busy = sum(v for k, v in events.items() if k.startswith(prefix))
    if busy <= 0:
        return None, events
    return busy / len(args_list), events
