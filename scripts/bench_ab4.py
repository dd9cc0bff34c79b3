"""Sweep 4: the opt-in bfloat16 fast mode on hardware.

bf16 halves HBM traffic and (if Mosaic uses packed (16,128) tiling for
elementwise) roughly doubles VPU throughput; with the v1 cost model
(F=0.63 ms, s_f32=0.198 ms/step) the predictions are ~110 Gcell/s at
(256,16) and more at deeper K. Stack liveness also halves, so deep-K
large-tile configs fit comfortably. NOT bit-compatible with the f32
reference semantics — reported as a separate mode, never the parity
headline.

Run detached: nohup python scripts/bench_ab4.py > .bench_ab4.log 2>&1 &
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
    dict(tr=256, k=16, boundary="zero", dtype="bfloat16", limit=64 << 20),
    dict(tr=384, k=16, boundary="zero", dtype="bfloat16", limit=64 << 20),
    dict(tr=512, k=32, boundary="zero", dtype="bfloat16", limit=100 << 20),
]


def ablate_column_ring(tr=256, k=16, steps=1024) -> None:
    """Column-halo ring mode: pad 128 zero columns per side and use raw
    lane rolls (the chalo>0 kernel path with ONE column tile) instead of
    zero-filled shifts. Saves 4 select ops of the ~34/cell/step at the
    price of 6% more window cells at C=4096."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.species import initial_uv

    params = Parameters()
    r = c = 4096
    u0, v0 = initial_uv((r, c))
    halo, chalo = 16, 128
    u, v = ps.pad_state(u0, v0, tr, halo, chalo, tc=c)
    u, v = jnp.asarray(u), jnp.asarray(v)
    common = dict(steps=k, tr=tr, params=params, boundary="zero",
                  halo=halo, chalo=chalo, tc=c,
                  vmem_limit_bytes=100 << 20)
    args = (-halo, r, -chalo, c)
    u, v = ps.run_blocks(u, v, args[0], args[1], jnp.int32(2),
                         args[2], args[3], **common)
    float(np.asarray(jnp.sum(u[:8, 128:256])))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        u, v = ps.run_blocks(u, v, args[0], args[1], jnp.int32(steps // k),
                             args[2], args[3], **common)
        float(np.asarray(jnp.sum(u[:8, 128:256])))
        best = min(best, time.time() - t0)
    print(json.dumps({
        "ablation": "column_ring", "tr": tr, "k": k,
        "seconds": best, "gcells_per_sec": r * c * steps / best / 1e9,
    }), flush=True)


def main() -> int:
    try:
        ablate_column_ring()
    except Exception as e:
        print(json.dumps({"ablation": "column_ring", "error": repr(e)[:400]}),
              flush=True)
    for cfg in CONFIGS:
        sim = PallasSimulation(
            Parameters(),
            boundary=cfg["boundary"],
            block_rows=cfg["tr"],
            steps_per_call=cfg["k"],
            dtype=cfg["dtype"],
            vmem_limit_bytes=cfg["limit"],
        )
        steps = 64 * cfg["k"]
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
