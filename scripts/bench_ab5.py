"""Sweep 5: f32 tile scaling past tr=256, bf16 storage mode, naive retune.

ROADMAP items: (1) tr=384/512 with the footprint-scaled scoped-VMEM
limits; (2) the reference-naive boundary headline is stale (47.7 at the
old tr=96 tuning) — measure at the v2 kernel's large-tile optimum;
(3) bf16 STORAGE mode (f32 compute in VMEM): expect ~parity with f32 at
deep K (VPU-bound) and up to ~2x at K=1 (memory-bound), where the halved
window DMAs are the whole story.

Each config runs in a SUBPROCESS with a hard timeout: one pathological
Mosaic compile (tr=384 blocked >40 min on the remote compiler) must not
stall the rest of the sweep.

Run detached: nohup python scripts/bench_ab5.py > .bench_ab5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # naive-boundary retune first (closest to known-good compiles)
    dict(tr=192, k=16, boundary="naive"),
    dict(tr=256, k=16, boundary="naive"),
    # bf16 storage mode vs f32, deep-K and memory-bound K=1
    dict(tr=256, k=16, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero"),
    # tile scaling (the suspected pathological compiles go last)
    dict(tr=384, k=16, boundary="zero"),
    dict(tr=512, k=16, boundary="zero"),
    dict(tr=384, k=16, boundary="zero", dtype="bfloat16"),
]

CHILD = r"""
import json, sys
sys.path.insert(0, __REPO__)
from grayscott_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.bench.harness import run_one
from grayscott_tpu.params import Parameters
cfg = json.loads(__CFG__)
sim = PallasSimulation(
    Parameters(), boundary=cfg["boundary"], block_rows=cfg["tr"],
    steps_per_call=cfg["k"], dtype=cfg.get("dtype", "float32"),
)
res = run_one(sim, (4096, 4096), max(64 * cfg["k"], 256), "compute", reps=3)
print("RESULT " + json.dumps({"config": cfg, **res.to_json()}), flush=True)
"""


def main() -> int:
    timeout = int(os.environ.get("SWEEP_TIMEOUT", "1500"))
    for cfg in CONFIGS:
        print(f"config {cfg} compiling/measuring...", flush=True)
        code = CHILD.replace("__REPO__", repr(REPO)).replace(
            "__CFG__", repr(json.dumps(cfg))
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-u", "-c", code],
                capture_output=True, text=True, timeout=timeout,
            )
            out = proc.stdout
        except subprocess.TimeoutExpired as e:
            print(json.dumps({"config": cfg,
                              "error": f"timeout after {timeout}s"}),
                  flush=True)
            continue
        hit = [l for l in out.splitlines() if l.startswith("RESULT ")]
        if hit:
            print(hit[-1][len("RESULT "):], flush=True)
        else:
            tail = (proc.stderr or out).strip().splitlines()[-12:]
            print(json.dumps({"config": cfg, "error": " | ".join(tail)[-500:]}),
                  flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
