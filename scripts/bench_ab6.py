"""Sweep 6: tune the 1080x1920 default workload (the reference binaries'
flagship domain, ui/src/lib.rs:33-38).

At 4096^2 the kernel reaches 65.6 Gcell/s (f32) but only ~20 at 1080p:
with 2.07M cells the 0.63 ms fixed per-block cost (pipeline warmup) is
~40% of step time at K=16 and the 4-5 row tiles pipeline poorly. Levers:
deeper K (fixed cost /2), taller tiles (fewer, fatter), their product.
All windows stay under the measured Mosaic compile ceiling
(ops.pallas_stencil.window_compile_ok); a single-tile tr=1088 variant
would exceed it and is omitted.

Run detached: nohup python -u scripts/bench_ab6.py > .bench_ab6.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_util import run_configs  # noqa: E402

SHAPE = [1080, 1920]

CONFIGS = [
    dict(tr=256, k=16, shape=SHAPE, steps=1024),  # the 4096^2 winner
    dict(tr=256, k=32, shape=SHAPE, steps=1024),  # fixed cost halved
    dict(tr=368, k=16, shape=SHAPE, steps=1024),  # 3 tiles of 1104
    dict(tr=544, k=16, shape=SHAPE, steps=1024),  # 2 tiles of 1088
    dict(tr=544, k=32, shape=SHAPE, steps=1024),
    dict(tr=256, k=16, shape=SHAPE, steps=1024, dtype="bfloat16"),
]

if __name__ == "__main__":
    run_configs(CONFIGS)
