"""Sweep 3: tile scaling on the v1-liveness kernel (dt_field reverted).

The dt_field fold was reverted (it added ~9.4 MB of Mosaic stack liveness
and OOMed the 64 MB scoped-VMEM limit at tr=256). This sweep re-confirms
the cached champion and pushes tile size with raised limits: the (256,16)
stack was ~62.7 MB, scaling roughly with window rows (tr + 2K), so 384
needs ~91 MB and 512 ~118 MB.

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
    # (256,16) zero is compile-cached from sweep 1: quick re-confirmation
    dict(tr=256, k=16, boundary="zero", limits=(64 << 20,)),
    dict(tr=384, k=16, boundary="zero", limits=(100 << 20, 112 << 20)),
    dict(tr=256, k=16, boundary="naive", limits=(64 << 20, 100 << 20)),
    dict(tr=512, k=16, boundary="zero", limits=(120 << 20,)),
    # the cost model's ~73 Gcell/s bet; stack likely too big — data either way
    dict(tr=512, k=32, boundary="zero", limits=(120 << 20,)),
]


def main() -> int:
    for cfg in CONFIGS:
        done = False
        for limit in cfg["limits"]:
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
