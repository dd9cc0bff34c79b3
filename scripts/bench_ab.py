"""A/B measurement of the fresh-output kernel redesign on the real TPU.

Measures the pallas backend at the known-good configs so the numbers are
directly comparable with BENCHMARKS.md (old aliased-double-buffer design):
  - tr=192, K=16, zero-border   (old: 51.2)
  - tr=144, K=24, zero-border   (old: 53.2)
  - tr=96,  K=16, naive         (old: 41.8)

Writes JSON lines to stdout (redirect to a log). Run detached:
  nohup python scripts/bench_ab.py > .bench_ab.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grayscott_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

print("acquiring device...", flush=True)
print("devices:", jax.devices(), flush=True)

from grayscott_tpu.backends.pallas import PallasSimulation  # noqa: E402
from grayscott_tpu.bench.harness import run_one  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402

CONFIGS = [
    dict(tr=192, k=16, boundary="zero"),
    dict(tr=144, k=24, boundary="zero"),
    dict(tr=96, k=16, boundary="naive"),
    dict(tr=256, k=16, boundary="zero"),
    dict(tr=192, k=24, boundary="zero"),
]


def main() -> int:
    for cfg in CONFIGS:
        sim = PallasSimulation(
            Parameters(),
            boundary=cfg["boundary"],
            block_rows=cfg["tr"],
            steps_per_call=cfg["k"],
        )
        steps = 64 * cfg["k"] if cfg["k"] != 24 else 40 * cfg["k"]
        print(f"config {cfg} compiling/measuring...", flush=True)
        try:
            res = run_one(sim, (4096, 4096), steps, "compute", reps=3)
        except Exception as e:  # keep going: one config OOMing is data too
            print(json.dumps({"config": cfg, "error": repr(e)}), flush=True)
            continue
        print(
            json.dumps({"config": cfg, **res.to_json()}),
            flush=True,
        )
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
