"""Sweep 6: tune the 1080x1920 default workload (the reference binaries'
flagship domain, ui/src/lib.rs:33-38).

At 4096^2 the kernel reaches 65.6 Gcell/s but only ~20 at 1080p: with
2.07M cells the 0.63 ms fixed per-block cost (pipeline warmup) is ~40% of
step time at K=16 and the 4-5 row tiles pipeline poorly. Levers measured
here: deeper K (fixed cost /2), taller tiles (fewer, fatter tiles up to
the whole domain), and their product.

Run detached: nohup python scripts/bench_ab6.py > .bench_ab6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grayscott_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

print("devices:", jax.devices(), flush=True)

from grayscott_tpu.backends.pallas import PallasSimulation  # noqa: E402
from grayscott_tpu.bench.harness import run_one  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402

SHAPE = (1080, 1920)

CONFIGS = [
    dict(tr=256, k=16),   # the 4096^2 winner, as the baseline here
    dict(tr=256, k=32),   # halve the fixed cost; halo redundancy 25%
    dict(tr=368, k=16),   # 3 tiles of 1104
    dict(tr=544, k=16),   # 2 tiles of 1088
    dict(tr=544, k=32),
    dict(tr=1088, k=16),  # single tile: no inter-tile pipelining at all
]


def main() -> int:
    for cfg in CONFIGS:
        sim = PallasSimulation(
            Parameters(), boundary="zero",
            block_rows=cfg["tr"], steps_per_call=cfg["k"],
        )
        steps = 64 * cfg["k"]
        print(f"config {cfg} compiling/measuring...", flush=True)
        try:
            res = run_one(sim, SHAPE, steps, "compute", reps=3)
        except Exception as e:
            print(json.dumps({"config": cfg, "error": repr(e)[:300]}),
                  flush=True)
            continue
        print(json.dumps({"config": cfg, **res.to_json()}), flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
