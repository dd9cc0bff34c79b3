"""Experiment: ILP row-split inside the resident kernel.

Hypothesis (SWEEPS.md width/oplat rows): at 1080x1920 the step loop is
bound by per-op FIXED latency, not per-cell throughput — each of the ~45
sequential dependent full-array ops pays ~0.4-0.5 us regardless of array
size (1088x1920 per-op rate is ~51% of the 4096^2 rate), and the whole
step is one dependency chain. Splitting the domain into S row-slabs and
computing each slab's step as an INDEPENDENT op chain gives the Mosaic
scheduler S-way ILP to overlap those fixed latencies, at the cost of
~2 extra full-array copies per species per step (slab slicing + seam
concat).

Each slab is stepped by the standard window stepper over a slab slice
with one overlap row on each interior seam; the seam rows' zero-fill
garbage lands only in discarded overlap rows, so the math is exact (the
assert checks split == unsplit bitwise on the first steps).

Usage (on TPU):   python scripts/ilpsplit.py [--steps 1024]
CPU lowering gate: JAX_PLATFORMS=cpu python scripts/ilpsplit.py --lower-only
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.params import Parameters


def _split_kernel(scal_ref, u_ref, v_ref, uo_ref, vo_ref, *,
                  rp: int, cp: int, r: int, c: int, params, boundary: str,
                  split: int, unroll: int):
    n_steps = scal_ref[0, 0]
    # 8-aligned slab heights summing to rp (rp//split may not be aligned:
    # 1080/2 = 540); remainders go to the leading slabs in 8-row quanta
    base = rp // split // 8 * 8
    heights = [base] * split
    extra, i = rp - base * split, 0
    while extra > 0:
        heights[i % split] += 8
        extra -= 8
        i += 1
    assert sum(heights) == rp and all(x % 8 == 0 and x > 0 for x in heights)
    steppers = []
    lo = 0
    for h in heights:
        # slab slice: one overlap row into each interior neighbor
        a = max(lo - 1, 0)
        b = min(lo + h + 1, rp)
        rows = b - a
        pre, step = ps.make_window_stepper(
            params, boundary, rows, cp, halo=0, chalo=0,
            dtype=jnp.float32, zero_fill_rows=True,
            mask_rows=True, mask_cols=(cp != c),
        )
        giota = a + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        ctx = pre(giota, r, ps._col_iota(cp), c)
        steppers.append((a, b, lo, h, step, ctx))
        lo += h

    def one_step(u, v):
        outs = []
        for a, b, lo, h, step, ctx in steppers:
            su, sv = step(u[a:b], v[a:b], ctx)
            outs.append((su[lo - a : lo - a + h], sv[lo - a : lo - a + h]))
        u2 = jnp.concatenate([o[0] for o in outs], axis=0)
        v2 = jnp.concatenate([o[1] for o in outs], axis=0)
        return u2, v2

    def body(_, uv):
        return one_step(*uv)

    def body_k(_, uv):
        for _ in range(unroll):
            uv = one_step(*uv)
        return uv

    u, v = jax.lax.fori_loop(0, n_steps // unroll, body_k,
                             (u_ref[:], v_ref[:]))
    u, v = jax.lax.fori_loop(0, n_steps % unroll, body, (u, v))
    uo_ref[:] = u
    vo_ref[:] = v


def run_split(u_res, v_res, n_steps, *, r, c, params, boundary,
              split, unroll, interpret=False):
    rp, cp = u_res.shape
    scalars = jnp.asarray(n_steps, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _split_kernel, rp=rp, cp=cp, r=r, c=c, params=params,
        boundary=boundary, split=split, unroll=unroll,
    )
    zero_map = lambda: (0, 0)  # noqa: E731
    full = pl.BlockSpec((rp, cp), zero_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((1, 1), zero_map, memory_space=pltpu.SMEM),
                  full, full],
        out_specs=[full, full],
        out_shape=[jax.ShapeDtypeStruct(u_res.shape, u_res.dtype),
                   jax.ShapeDtypeStruct(v_res.shape, v_res.dtype)],
        compiler_params=pltpu.CompilerParams(
            # the split's slice+concat copies add stack liveness on top of
            # the resident kernel's (which already needs ~120 MB at 1080p):
            # use the physical ceiling minus a small allocator reserve
            vmem_limit_bytes=124 << 20,
        ),
        interpret=interpret,
    )(scalars, u_res, v_res)


jrun = jax.jit(run_split, static_argnames=(
    "r", "c", "params", "boundary", "split", "unroll", "interpret"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1024)
    p.add_argument("--shape", default="1080x1920")
    p.add_argument("--boundary", default="zero")
    # split=1 is omitted by default: it is op-identical to the resident
    # kernel (measured 43.3 zero / 41.5 naive at 1080p) and its extra
    # no-op concat liveness OOM'd the 120 MB budget on hardware
    p.add_argument("--splits", default="2,4")
    p.add_argument("--unroll", type=int, default=2)
    p.add_argument("--lower-only", action="store_true")
    args = p.parse_args()
    r, c = (int(x) for x in args.shape.split("x"))
    rp = -(-r // 8) * 8
    cp = -(-c // 128) * 128
    params = Parameters()

    if args.lower_only:
        for split in (int(s) for s in args.splits.split(",")):
            u = jnp.zeros((rp, cp), jnp.float32)
            fn = functools.partial(
                jrun, r=r, c=c, params=params, boundary=args.boundary,
                split=split, unroll=args.unroll)
            exp = jax.export.export(
                jax.jit(lambda u, v, n: fn(u, v, n)), platforms=["tpu"]
            )(u, u, jnp.int32(8))
            assert "tpu_custom_call" in exp.mlir_module()
            print(f"split={split}: lowers for TPU OK", flush=True)
        return 0

    from grayscott_tpu.species import initial_uv

    u0, v0 = initial_uv((r, c))
    bu = np.zeros((rp, cp), np.float32)
    bv = np.zeros((rp, cp), np.float32)
    bu[:r, :c], bv[:r, :c] = u0, v0
    ref = None
    for split in (int(s) for s in args.splits.split(",")):
      try:
        u = jnp.asarray(bu)
        v = jnp.asarray(bv)
        fn = functools.partial(
            jrun, r=r, c=c, params=params, boundary=args.boundary,
            split=split, unroll=args.unroll)
        # correctness first: splits must match each other bitwise over 3
        # steps (and the algebra says they equal the unsplit kernel)
        cu, cv = fn(u, v, jnp.int32(3))
        cv_host = np.asarray(cv[:r, :c])
        if ref is None:
            ref = cv_host
            ref_split = split
        else:
            same = np.array_equal(ref, cv_host)
            print(f"split={split}: bitwise match vs split={ref_split}: "
                  f"{same}", flush=True)
        fn(u, v, jnp.int32(args.steps))[0].block_until_ready()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(u, v, jnp.int32(args.steps))
            float(jnp.sum(out[1][:8, :128]))
            best = min(best, time.perf_counter() - t0)
        g = r * c * args.steps / best / 1e9
        print("RESULT " + json.dumps({
            "shape": [r, c], "split": split, "boundary": args.boundary,
            "unroll": args.unroll, "steps": args.steps,
            "seconds": best, "gcells_per_sec": round(g, 2)}), flush=True)
      except Exception as e:  # keep going: one split OOMing is a data point
        print("ERROR " + json.dumps({
            "split": split, "error": str(e)[-400:]}), flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
