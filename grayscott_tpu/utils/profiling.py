"""Profiling support.

The reference's profiling story is criterion microbenchmarks plus
`gpu-debug-utils` object naming for GPU profilers (SURVEY.md section 5;
data/Cargo.toml:14-16). The TPU-native equivalents here:

- :func:`trace` — context manager around ``jax.profiler.trace`` writing an
  xprof/TensorBoard trace (set ``GRAYSCOTT_TRACE_DIR`` or pass a path);
- :func:`annotate` — named ``TraceAnnotation`` scopes, the analog of the
  reference's named Vulkan objects: they label host-side phases in the
  trace timeline (the Pallas kernels already appear under their own names);
- the benchmark harness (grayscott_tpu/bench) for throughput numbers.

Tracing WORKS on the tunneled TPU (round-2 finding): the round-1 "trace
hangs" diagnosis was actually the per-process remote compile/load in the
warm-up step (~10 min) — start the trace AFTER a warmed dispatch and it
completes in milliseconds, device plane included. ``scripts/trace_ops.py``
parses the resulting xplane.pb without TensorFlow (per-op device time);
``scripts/device_rate.py`` measures device-time throughput per config,
which the tunnel's ~25-30 ms per-measurement dispatch+sync overhead
otherwise hides (it deflates small-domain wall-clock numbers).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """Capture a device + host profile for the enclosed block."""
    import jax

    log_dir = log_dir or os.environ.get(
        "GRAYSCOTT_TRACE_DIR", "/tmp/grayscott_trace"
    )
    with jax.profiler.trace(log_dir):
        yield log_dir


def annotate(name: str):
    """Named scope that shows up on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)
