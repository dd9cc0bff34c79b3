"""Decompose the constant ~25 ms tunnel overhead in wall measurements.

Every wall benchmark through the tunneled TPU measures

    t_wall  =  t_device + t_overhead,     t_overhead ~ 24-30 ms

independent of configuration (BENCHMARKS.md "on-chip device time").
This probe separates t_overhead into its candidate parts, each timed
best-of-N on a warmed executable:

  full        prepare_steps(1000) + tiny-readback sync  (bench.py method)
  dispatch    prepare_steps(1000) only (Python returns after enqueue)
  sync_ready  the sync expression again on an already-idle device
              (result-slice dispatch + small readback = its RTT floor)
  xfer        one small host->device transfer, blocked
  const32     jnp.int32(7) creation + block (the per-run n_blocks scalar)

If dispatch + sync_ready ~ full - t_device, the overhead is pure RTT
count and the lever is fewer host round-trips per measured run (e.g.
device-cached reaction/scalar operands); if dispatch alone is large,
the lever is in host-side tracing/lowering of the run_steps call chain.

Usage (on TPU):  python scripts/rtt_probe.py [r c steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from grayscott_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from grayscott_tpu.backends import get_backend  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402


def best_of(n, fn):
    dt = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = min(dt, time.perf_counter() - t0)
    return dt


def main() -> int:
    # partial positional args apply too ("rtt_probe.py 1080 1920" must
    # not silently probe the 4096^2 default it was asked to override)
    r, c, steps = 4096, 4096, 1000
    given = list(map(int, sys.argv[1:4]))
    if given:
        r = given[0]
        c = given[1] if len(given) > 1 else c
        steps = given[2] if len(given) > 2 else steps
    sim = get_backend("pallas")(Parameters(), boundary="zero")
    species = sim.make_species((r, c))

    def sync():
        return float(np.asarray(jnp.sum(species.result()[:8, :128])))

    k = getattr(sim, "steps_per_call", 8)
    sim.prepare_steps(species, 2 * k + steps % k)
    sync()
    sim.prepare_steps(species, steps)
    sync()

    results = {}

    def t_full():
        sim.prepare_steps(species, steps)
        sync()

    results["full"] = best_of(3, t_full)

    def t_dispatch():
        sim.prepare_steps(species, steps)

    results["dispatch"] = best_of(3, t_dispatch)
    sync()

    results["sync_ready"] = best_of(5, sync)

    host = np.zeros(36, np.float32)

    def t_xfer():
        jnp.asarray(host).block_until_ready()

    results["xfer"] = best_of(5, t_xfer)

    def t_const():
        jnp.int32(7).block_until_ready()

    results["const32"] = best_of(5, t_const)

    # device-time estimate for context: full minus everything host-side
    for kk, v in results.items():
        print(f"{kk:12s} {v * 1e3:8.2f} ms")
    ov = results["full"] - (r * c * steps / 90.85e9)
    print(f"implied overhead vs 90.85 Gcell/s on-chip: {ov * 1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
