"""Sweep 5: f32 tile scaling past tr=256, and the naive-semantics retune.

ROADMAP items: (1) tr=384/512 needs the footprint-scaled scoped-VMEM
limits (estimate 90.6 MB at tr=384, 118 MB at tr=512 — now chosen
automatically by ops.pallas_stencil.choose_vmem_limit); and the
reference-naive boundary headline is stale (47.7 at the old tr=96 tuning)
— measure it at the v2 kernel's large-tile optimum.

Run detached: nohup python scripts/bench_ab5.py > .bench_ab5.log 2>&1 &
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

CONFIGS = [
    # vmem limit intentionally omitted: exercises choose_vmem_limit tiers
    dict(tr=384, k=16, boundary="zero"),
    dict(tr=512, k=16, boundary="zero"),
    dict(tr=192, k=16, boundary="naive"),
    dict(tr=256, k=16, boundary="naive"),
    # bf16 STORAGE mode (f32 compute in VMEM): expect ~parity with f32 at
    # deep K (VPU-bound) and up to ~2x at K=1 (memory-bound), where the
    # halved window DMAs are the whole story
    dict(tr=256, k=16, boundary="zero", dtype="bfloat16"),
    dict(tr=384, k=16, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero"),  # f32 memory-bound comparison
]


def main() -> int:
    for cfg in CONFIGS:
        sim = PallasSimulation(
            Parameters(),
            boundary=cfg["boundary"],
            block_rows=cfg["tr"],
            steps_per_call=cfg["k"],
            dtype=cfg.get("dtype", "float32"),
        )
        steps = max(64 * cfg["k"], 256)
        print(f"config {cfg} compiling/measuring...", flush=True)
        try:
            res = run_one(sim, (4096, 4096), steps, "compute", reps=3)
        except Exception as e:
            print(json.dumps({"config": cfg, "error": repr(e)[:400]}),
                  flush=True)
            continue
        print(json.dumps({"config": cfg, **res.to_json()}), flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
