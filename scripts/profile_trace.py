"""Capture an xprof/TensorBoard trace of the Pallas kernel on hardware.

This WORKS on the tunneled TPU (round-2 finding — the round-1 "hang"
was the ~10 min per-process remote compile in the warm-up step; the
trace itself completes in ms, device plane included). Attribute the
result with ``python scripts/trace_ops.py <outdir>`` or measure
device-time throughput per config with ``scripts/device_rate.py`` /
the bench harness's ``device`` workload.

Usage: python scripts/profile_trace.py [outdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grayscott_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from grayscott_tpu.backends.pallas import PallasSimulation  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402
from grayscott_tpu.utils import profiling  # noqa: E402


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/grayscott_trace"
    print("devices:", jax.devices(), flush=True)
    sim = PallasSimulation(
        Parameters(), boundary="zero", block_rows=256, steps_per_call=16,
    )
    species = sim.make_species((4096, 4096))
    sim.perform_steps(species, 64)  # warm up executables
    with profiling.trace(outdir):
        with profiling.annotate("measured-batch"):
            sim.perform_steps(species, 256)
            species.result_host()
    found = []
    for root, _dirs, files in os.walk(outdir):
        for f in files:
            p = os.path.join(root, f)
            found.append((p, os.path.getsize(p)))
    for p, sz in sorted(found):
        print(f"{sz:12d}  {p}", flush=True)
    if not found:
        print("no trace artifacts produced", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
