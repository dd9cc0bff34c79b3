"""Sweep 7: size sweep at the CURRENT defaults (the BENCHMARKS.md size
table predates the v2 kernel + large-tile tuning).

Configs pin exactly what the default heuristics now choose per domain
(choose_block_rows with the 20M cell-step compile ceiling): 2048^2 and
8192^2 zero-border, and the naive-boundary default at 4096^2 (tr=208
under the 1.25x ceiling derate).

Run detached: nohup python -u scripts/bench_ab7.py > .bench_ab7.log 2>&1 &
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_util import run_configs  # noqa: E402

CONFIGS = [
    dict(tr=256, k=16, shape=[2048, 2048], steps=1024),
    dict(tr=208, k=16, shape=[4096, 4096], steps=1024, boundary="naive"),
    dict(tr=120, k=16, shape=[8192, 8192], steps=512),
    dict(tr=120, k=16, shape=[8192, 8192], steps=512, dtype="bfloat16"),
]

if __name__ == "__main__":
    run_configs(CONFIGS)
