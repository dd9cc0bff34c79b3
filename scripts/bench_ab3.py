"""Sweep 3: dt_field kernel with a raised scoped-VMEM limit.

The dt_field fold (commit 13285ab) grew the kernel's scoped VMEM stack by
~9.4 MB (two (W,C) f32 buffers of extra liveness), so (256,16) no longer
fits the 64 MB limit. Measure with a 100/112 MB limit; if the result is
below the pre-dt_field 65.6 Gcell/s, the fold is a net loss (shallower
pipelining) and should be reverted.

Run detached: nohup python scripts/bench_ab3.py > .bench_ab3.log 2>&1 &
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
    dict(tr=256, k=16, boundary="zero"),   # decision point vs 65.6
    dict(tr=192, k=16, boundary="zero"),   # fits 64M? cross-check vs 62.0
    dict(tr=384, k=16, boundary="zero"),
    dict(tr=256, k=16, boundary="naive"),
    dict(tr=512, k=32, boundary="zero"),   # the model's ~73 Gcell/s bet
]


def main() -> int:
    for cfg in CONFIGS:
        done = False
        for limit in (100 << 20, 112 << 20):
            sim = PallasSimulation(
                Parameters(),
                boundary=cfg["boundary"],
                block_rows=cfg["tr"],
                steps_per_call=cfg["k"],
                vmem_limit_bytes=limit,
            )
            steps = 64 * cfg["k"]
            print(f"config {cfg} limit={limit >> 20}M compiling...", flush=True)
            try:
                res = run_one(sim, (4096, 4096), steps, "compute", reps=3)
            except Exception as e:
                msg = repr(e)
                print(json.dumps({"config": cfg, "limit_mb": limit >> 20,
                                  "error": msg[:300]}), flush=True)
                if "vmem" in msg.lower() or "memory" in msg.lower():
                    continue  # retry with the higher limit
                break
            print(json.dumps({"config": cfg, "limit_mb": limit >> 20,
                              **res.to_json()}), flush=True)
            done = True
            break
        if not done:
            print(f"config {cfg}: no limit worked", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
