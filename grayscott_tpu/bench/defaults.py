"""Hardware-measured tuning verdicts shipped with the package.

The autotune store (``~/.cache/grayscott_tpu/autotune.json``) holds
locally-measured winners, but a fresh install has none — and some
verdicts cannot be derived heuristically at all (``pack='auto'`` and
``fold='auto'`` act ONLY on a measured record, never on a heuristic;
see backends/pallas.py). These are the round-2 sweep winners measured
on one TPU v5e (scripts/SWEEPS.md "pack"/"small" rows, BENCHMARKS.md),
in exactly the record schema ``scripts/adopt_sweep.py`` persists.

Precedence: a local autotune record always wins (``bench.autotune
.lookup`` consults this table only on a local miss), so re-tuning or
re-adopting on different hardware overrides the shipped verdicts. The
analog in the reference is the compiled-in block-size defaults
(compute/block/src/default.rs) — except these are measured, not
computed from cache sizes.

Keys carry the DEVICE KIND (``v5e``) where they were measured, never
the bare platform string: on a v3/v4/v6e part ``lookup`` misses this
table entirely and the backend falls back to VMEM-scaled heuristics
plus a ``--autotune`` recommendation (utils/device.py).
"""

from __future__ import annotations

#: key format: utils.cache.autotune_key (kernel version, platform,
#: shape, boundary, stencil[, dtype])
SHIPPED: dict[str, dict] = {
    # species-packed megakernel wins at 2048^2-zero — the round-2 wall
    # verdict RE-CONFIRMED on DEVICE time in the round-3 RTT-regime
    # re-sweep (packed mega 91.60 on-chip vs unpacked mega 91.09, a
    # within-noise edge, and windowed 75.9; sweeps/r3/hw_queue.log). tr=512
    # is the measured tile at the packed (2048, 4096) width.
    "v4:v5e:2048x2048:zero:oono-puri": {
        "engine": "mega", "block_rows": 512, "steps_per_call": 8,
        "fold": 1, "pack": True, "gcells_per_sec": 91.60,
        "device_gcells_per_sec": 91.60, "wall_gcells_per_sec": 56.88,
        "source": "shipped-v5e-r3-device",
    },
    # packed VMEM-resident wins at 512x1024-zero — round-2 wall verdict
    # re-confirmed on device time (packed resident 97.70 vs resident
    # 97.48 vs mega 84.6 on-chip): the old wall ranking at this shape
    # was RTT-noise-ranked (95+ on-chip vs 16 wall) but happened to
    # pick the same winner
    "v4:v5e:512x1024:zero:oono-puri": {
        "engine": "resident", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": True, "gcells_per_sec": 97.70,
        "device_gcells_per_sec": 97.70, "wall_gcells_per_sec": 15.06,
        "source": "shipped-v5e-r3-device",
    },
    # unpacked megakernel everywhere else it was measured. The 4096^2
    # records pin block_rows=256: the round-3 ON-CHIP sweep
    # (sweeps/r3/, BENCHMARKS.md round 3) ranked tr=256 above
    # the auto geometry (tr=344) on both boundaries — 92.31 vs 91.17
    # zero, 80.15 vs 77.5 naive device Gcell/s; tr=320 (90.44/77.94)
    # and tr=128 (74.34 naive) bracket the optimum. gcells_per_sec is
    # the DEVICE rate (the r3 autotuner ranks on device time).
    "v4:v5e:4096x4096:zero:oono-puri": {
        "engine": "mega", "block_rows": 256, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 92.31,
        "device_gcells_per_sec": 92.31, "wall_gcells_per_sec": 77.9,
        "source": "shipped-v5e-r3-device",
    },
    # round-4 device-ranked confirmation: the auto geometry (full-width
    # tr=152, the VMEM cap) measured 87.09 on-chip, bracketed by tr=128
    # (84.97) and the column-tiled 304x4096 (87.14, within noise of
    # auto) / 256x4096 (84.23) — the 4096^2 tr-re-pin anomaly does NOT
    # recur here; auto stays (sweeps/r4/devrate_r4.log)
    "v4:v5e:8192x8192:zero:oono-puri": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 87.09,
        "device_gcells_per_sec": 87.09, "wall_gcells_per_sec": 83.919,
        "source": "shipped-v5e-r4-device",
    },
    "v4:v5e:4096x4096:naive:oono-puri": {
        "engine": "mega", "block_rows": 256, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 80.15,
        "device_gcells_per_sec": 80.15, "wall_gcells_per_sec": 68.9,
        "source": "shipped-v5e-r3-device",
    },
    # bf16 storage: the megakernel beats the windowed kernel 69.2 vs
    # 61.7 (+12.1%, same-process A/B, 1024 steps) — halved window DMA
    # pays even at K=8. Per-dtype key: bf16 engine verdicts never leak
    # into f32 runs (utils/cache.autotune_key).
    "v4:v5e:4096x4096:zero:oono-puri:bfloat16": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 69.21,
        "source": "shipped-v5e-r2",
    },
    # 8192^2 bf16: mega 84.3 vs windowed 68.7 (+22.7% same-process) —
    # the windowed bf16 kernel is compile-ceiling-constrained to small
    # tiles at this width; the megakernel's K=8 window is not
    "v4:v5e:8192x8192:zero:oono-puri:bfloat16": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 84.28,
        "source": "shipped-v5e-r2",
    },
    # 16384^2 (the SURVEY weak-scaling shape): bf16 mega 86.8 vs f32
    # mega 77.5 same-process (+11.9%) — and half the HBM state.
    # block_rows=None re-derives choose_mega_geometry, which column-tiles
    # at this width (88.2 measured on the column-tiled form, sweep
    # "coltile")
    "v4:v5e:16384x16384:zero:oono-puri:bfloat16": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 88.217,
        "source": "shipped-v5e-r2",
    },
    # column-tiled megakernel verdicts (sweep "coltile"): auto-geometry
    # records (block_rows None, no block_cols) resolve through
    # choose_mega_geometry — at these widths that is tc=4096 column
    # tiles (83.0 vs 77.3 full-width at 16384^2-zero; 75.9 vs 53.8
    # windowed at 4096x32768)
    # round-4 device-ranked confirmation: auto (column-tiled 304x4096)
    # measured 87.23 on-chip vs 85.83 at tr=272 and 84.51 at tr=256 —
    # the heuristic's pick is the measured optimum at this width
    "v4:v5e:16384x16384:zero:oono-puri": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 87.23,
        "device_gcells_per_sec": 87.23, "wall_gcells_per_sec": 83.049,
        "source": "shipped-v5e-r4-device",
    },
    "v4:v5e:4096x32768:zero:oono-puri": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 75.864,
        "source": "shipped-v5e-r2",
    },
    # naive boundary at 16384^2: FULL-WIDTH windows pinned — the
    # column-joined naive masking/fix-up tax outweighs the halo saving
    # (70.5 at tr=72 full-width vs 69.4 column-tiled; pinned block_rows
    # alone = full-width, the _mega_tiles contract)
    "v4:v5e:16384x16384:naive:oono-puri": {
        "engine": "mega", "block_rows": 72, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 70.508,
        "source": "shipped-v5e-r2",
    },
    # naive boundary too: mega bf16 57.9 vs windowed bf16 52.9 (+9.5%)
    "v4:v5e:4096x4096:naive:oono-puri:bfloat16": {
        "engine": "mega", "block_rows": None, "steps_per_call": 16,
        "fold": 1, "pack": False, "gcells_per_sec": 57.91,
        "source": "shipped-v5e-r2",
    },
}
