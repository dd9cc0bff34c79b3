"""Sweep 5: f32 tile scaling past tr=256, bf16 storage mode, naive retune.

Results (2026-08-16, recorded in BENCHMARKS.md): naive (192,16) 55.0
Gcell/s; bf16 storage (256,16) 68.6; bf16 (256,1) 36.7 vs f32 (256,1)
17.7 (2.07x memory-bound); tr=256-naive / tr=384 / tr=512 at C=4096 hit
the Mosaic compile ceiling (subprocess timeouts — see
ops/pallas_stencil.py COMPILE_CEILING_CELL_STEPS).

Run detached: nohup python -u scripts/bench_ab5.py > .bench_ab5.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_util import run_configs  # noqa: E402

CONFIGS = [
    dict(tr=192, k=16, boundary="naive"),
    dict(tr=256, k=16, boundary="naive"),
    dict(tr=256, k=16, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero", dtype="bfloat16"),
    dict(tr=256, k=1, boundary="zero"),
    dict(tr=384, k=16, boundary="zero"),
    dict(tr=512, k=16, boundary="zero"),
    dict(tr=384, k=16, boundary="zero", dtype="bfloat16"),
]

if __name__ == "__main__":
    run_configs(CONFIGS)
