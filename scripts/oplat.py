"""Microbenchmark: per-op fixed latency of dependent full-array VPU ops.

Motivation: across every round-2 hardware measurement (windowed + mega,
1080p..8192^2), per-simulation-step time fits

    T_step  =  T0 + N / R,      T0 ~ 30 us,  R ~ 85 Gcell/s

with T0 independent of domain size, block count, and engine — i.e. a
fixed cost per *sequential dependent op chain* (the ~45-op step body),
not per call and not per cell. This kernel isolates that: a VMEM-resident
array, a fori_loop of `steps`, each step a chain of `n_ops` dependent
ops (mix of FMA and sublane/lane rolls like the real step body). Sweeping
(shape, n_ops) separates per-op latency from per-cell throughput.

Usage (on TPU):
    python scripts/oplat.py
"""

from __future__ import annotations

import functools
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, o_ref, *, steps: int, n_ops: int, rolls: bool):
    def body(i, x):
        # dependent chain: each op consumes the previous result
        for j in range(n_ops):
            if rolls and j % 3 == 2:
                x = pltpu.roll(x, 1, axis=(j // 3) % 2)
            else:
                x = x * 1.0000001 + 1e-7
        return x

    o_ref[...] = jax.lax.fori_loop(0, steps, body, x_ref[...], unroll=False)


@functools.partial(jax.jit, static_argnames=("steps", "n_ops", "rolls"))
def run(x, steps: int, n_ops: int, rolls: bool):
    return pl.pallas_call(
        functools.partial(_kernel, steps=steps, n_ops=n_ops, rolls=rolls),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
    )(x)


def measure(shape, steps, n_ops, rolls):
    x = jnp.ones(shape, jnp.float32)
    run(x, steps, n_ops, rolls).block_until_ready()  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(x, steps, n_ops, rolls)
        float(jnp.sum(r[:8, :128]))  # small readback sync
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    shapes = [(1088, 1920), (272, 1920), (1088, 4096), (272, 4096),
              (2176, 3840)]
    opss = [15, 45, 90]
    steps = 256
    out = []
    for shape, n_ops, rolls in itertools.product(shapes, opss, (False, True)):
        t = measure(shape, steps, n_ops, rolls)
        cells = shape[0] * shape[1]
        rec = {
            "shape": list(shape), "n_ops": n_ops, "rolls": rolls,
            "us_per_step": round(t * 1e6, 3),
            "ns_per_op": round(t / n_ops * 1e9, 2),
            "ps_per_cell_op": round(t / n_ops / cells * 1e12, 3),
        }
        out.append(rec)
        print("RESULT " + json.dumps(rec), flush=True)
    # fit per shape: t(n_ops) = a + b*n_ops -> b = per-op cost at this size
    for shape in shapes:
        for rolls in (False, True):
            pts = [(r["n_ops"], r["us_per_step"]) for r in out
                   if r["shape"] == list(shape) and r["rolls"] == rolls]
            if len(pts) >= 2:
                (x1, y1), (x2, y2) = pts[0], pts[-1]
                b = (y2 - y1) / (x2 - x1)
                a = y1 - b * x1
                print(f"FIT shape={shape} rolls={rolls}: "
                      f"t = {a:.2f} us + {b*1000:.1f} ns/op", flush=True)


if __name__ == "__main__":
    main()
