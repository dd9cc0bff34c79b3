"""Hardware equivalence check: megakernel vs windowed kernel, on-device.

Runs both engines from the same initial state at production geometries
and compares results exactly (the megakernel drives the same per-window
stepper, so hardware outputs should match bit for bit when the window
geometry matches, and within FMA-contraction ulps otherwise). Exit 0 on
max |delta| == 0 (or <= 1e-6 with --tol), 1 otherwise.

Usage: python scripts/mega_hw_check.py [--steps 64] [--shapes 1080x1920,4096x4096]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--shapes", default="1080x1920,4096x4096")
    parser.add_argument("--boundary", default="naive")
    parser.add_argument("--tol", type=float, default=0.0)
    args = parser.parse_args()

    from grayscott_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.params import Parameters
    from grayscott_tpu.species import initial_uv

    worst = 0.0
    for spec in args.shapes.split(","):
        shape = tuple(int(x) for x in spec.split("x"))
        u0, v0 = initial_uv(shape)
        uv = {}
        for engine in ("mega", "windowed"):
            sim = PallasSimulation(Parameters(), boundary=args.boundary,
                                   engine=engine)
            species = sim.make_species(shape)
            species.storage = sim.build_storage(u0, v0)
            sim.perform_steps(species, args.steps)
            uv[engine] = species.uv_host()
        du = float(np.abs(uv["mega"][0] - uv["windowed"][0]).max())
        dv = float(np.abs(uv["mega"][1] - uv["windowed"][1]).max())
        print(f"{spec} {args.boundary} {args.steps} steps: "
              f"max|dU|={du:.3e} max|dV|={dv:.3e}", flush=True)
        worst = max(worst, du, dv)
    print(f"worst delta: {worst:.3e} (tol {args.tol})")
    return 0 if worst <= args.tol else 1


if __name__ == "__main__":
    sys.exit(main())
