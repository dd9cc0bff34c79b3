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
    dict(tr=256, k=16, boundary="naive"),  # naive optimum refresh
    # the model (F=0.63ms, s=0.198ms/step, halo factor (tr+2K)/tr)
    # predicts ~73 Gcell/s here; long cold compile (32 unrolled steps)
    dict(tr=512, k=32, boundary="zero"),
]


def ablate_zero_padding(tr=256, k=16, steps=1024) -> None:
    """Timing-only ablation: is the per-block padding re-zero (4 dynamic-
    update-slices) free (in-place) or a hidden copy? zero_padding=False is
    numerically wrong across blocks single-chip — timing is representative
    because the kernel work is identical."""
    import time

    import jax.numpy as jnp
    import numpy as np

    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.species import initial_uv

    params = Parameters()
    r = c = 4096
    u0, v0 = initial_uv((r, c))
    halo = 16
    for zero_padding in (True, False):
        u, v = ps.pad_state(u0, v0, tr, halo)
        u, v = jnp.asarray(u), jnp.asarray(v)
        common = dict(steps=k, tr=tr, params=params, boundary="zero",
                      halo=halo, vmem_limit_bytes=64 << 20,
                      zero_padding=zero_padding)
        u, v = ps.run_blocks(u, v, -halo, r, jnp.int32(2), **common)
        float(np.asarray(jnp.sum(u[:8, :128])))  # sync
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            u, v = ps.run_blocks(u, v, -halo, r, jnp.int32(steps // k),
                                 **common)
            float(np.asarray(jnp.sum(u[:8, :128])))
            best = min(best, time.time() - t0)
        print(json.dumps({
            "ablation": "zero_padding", "zero_padding": zero_padding,
            "seconds": best, "gcells_per_sec": r * c * steps / best / 1e9,
        }), flush=True)


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
    try:
        ablate_zero_padding()
    except Exception as e:
        print(json.dumps({"ablation": "zero_padding", "error": repr(e)}),
              flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
