"""Follow-up sweep: dt_field kernel + large row tiles.

Context (see .bench_ab.log / BENCHMARKS.md): the fresh-output kernel made
large tiles win — (256,16) = 65.6 pre-dt_field. This sweep measures the
dt_field kernel and pushes tr further, plus re-fits fixed vs per-step cost
and refreshes the naive-semantics optimum.

Run detached: nohup python scripts/bench_ab2.py > .bench_ab2.log 2>&1 &
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
    dict(tr=256, k=16, boundary="zero"),   # champion: dt_field delta
    dict(tr=384, k=16, boundary="zero"),   # push tile size
    dict(tr=512, k=16, boundary="zero"),   # may OOM; failure is data
    dict(tr=256, k=8, boundary="zero"),    # F/s re-fit point
    dict(tr=256, k=16, boundary="naive"),  # naive optimum refresh
]


def main() -> int:
    for cfg in CONFIGS:
        sim = PallasSimulation(
            Parameters(),
            boundary=cfg["boundary"],
            block_rows=cfg["tr"],
            steps_per_call=cfg["k"],
        )
        steps = 64 * cfg["k"]
        print(f"config {cfg} compiling/measuring...", flush=True)
        try:
            res = run_one(sim, (4096, 4096), steps, "compute", reps=3)
        except Exception as e:
            print(json.dumps({"config": cfg, "error": repr(e)}), flush=True)
            continue
        print(json.dumps({"config": cfg, **res.to_json()}), flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
