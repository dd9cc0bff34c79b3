"""Static per-step op attribution for the fused Pallas kernel.

The jax.profiler trace hangs over the tunneled TPU (round-1 blocker), but
the Pallas->Mosaic lowering runs client-side: this tool captures the
Mosaic vector IR via jax.export (no device, seconds) at two temporal-
blocking depths and DIFFS the op counts, yielding the EXACT per-step op
mix of the kernel — the attribution data behind "the step loop is
VPU-bound at ~N ops/cell" (BENCHMARKS.md). Ops are bucketed by MLIR op
name and by operand footprint (full-window vectors vs narrow strips,
which cost ~1/128th or less on the 8x128 VPU).

Usage::

    python scripts/kernel_ops.py --boundary naive --tr 16 --cols 256
    python scripts/kernel_ops.py --compare        # zero vs naive table
"""

from __future__ import annotations

import argparse
import collections
import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from grayscott_tpu.ops import pallas_stencil as ps  # noqa: E402
from grayscott_tpu.params import Parameters  # noqa: E402

# ops that do no vector-ALU work: memory, control, shape bookkeeping
_FREE = re.compile(
    r"^(memref|func|scf|cf|arith\.constant|arith\.index_cast|builtin|"
    r"vector\.load|vector\.store|vector\.broadcast|vector\.shape_cast|"
    r"tpu\.assume|tpu\.memref|tpu\.iota$)"
)


def mosaic_module(boundary: str, steps: int, tr: int = 16, cols: int = 256,
                  runtime: bool = True, fold: int = 1,
                  pack: bool = False, strip_store: bool = False) -> str:
    """Capture the Mosaic MLIR for one kernel specialization.

    With ``pack`` the species-packed kernel is captured instead: ``cols``
    stays the DOMAIN width, the kernel's arrays are ``2*cols`` wide, so
    a packed full-window op covers 2x the cells of an unpacked one —
    compare element-equivalent work as 2*packed_ops vs unpacked_ops."""
    params = Parameters()
    r = 4 * tr * fold
    u0 = np.zeros((r, cols), np.float32)
    v0 = np.ones((r, cols), np.float32)
    reaction = ps.reaction_operand(params) if runtime else None
    kp = params.structure_only() if runtime else params
    if pack:
        if boundary != "zero" or fold > 1:
            raise SystemExit("--pack implies the zero boundary, no fold")
        x_pad = ps.pack_state(u0, v0, tr, dtype=np.float32)

        def fn(x_pad):
            return ps.packed_multistep_impl(
                x_pad, reaction, steps=steps, tr=tr, r=r, c=cols,
                params=kp,
            )

        operands = (jnp.asarray(x_pad),)
    elif fold > 1:
        u_pad, v_pad = ps.fold_state(u0, v0, fold, tr)
        fold_arg = (fold, cols, ps.fold_geometry(r, fold, tr))
    else:
        u_pad, v_pad = ps.pad_state(u0, v0, tr)
        fold_arg = None

    if not pack:
        def fn(u_pad, v_pad):
            return ps.multistep_impl(
                u_pad, v_pad, -ps.HALO, r, 0, None, reaction,
                steps=steps, tr=tr, params=kp, boundary=boundary,
                fold=fold_arg, zero_padding=fold_arg is None,
                strip_store=strip_store,
            )

        operands = (jnp.asarray(u_pad), jnp.asarray(v_pad))

    orig = pl.pallas_call

    def debug_call(*a, **kw):
        kw["debug"] = True
        return orig(*a, **kw)

    buf = io.StringIO()
    try:
        pl.pallas_call = debug_call
        ps.pl.pallas_call = debug_call
        with contextlib.redirect_stdout(buf):
            jax.export.export(jax.jit(fn), platforms=["tpu"])(*operands)
    finally:
        pl.pallas_call = orig
        ps.pl.pallas_call = orig
    text = buf.getvalue()
    start = text.index("module @")
    return text[start:]


_OP_RE = re.compile(r"=\s+\"?([a-z_]+\.[a-z_.]+)\"?[ (<]")
_VEC_RE = re.compile(r"vector<(\d+)x(\d+)xf32>")


def count_ops(module: str) -> collections.Counter:
    """(op_name, footprint) -> count. Footprint 'full' = the (W, C)
    window vector shape (the dominant VPU cost); 'narrow' = anything
    smaller (strips, masks over one lane/sublane group)."""
    shapes = [(int(a) * int(b)) for a, b in _VEC_RE.findall(module)]
    full_cells = max(shapes) if shapes else 0
    counts: collections.Counter = collections.Counter()
    for line in module.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        op = m.group(1)
        if _FREE.match(op):
            continue
        vecs = [(int(a) * int(b)) for a, b in _VEC_RE.findall(line)]
        foot = "full" if vecs and max(vecs) == full_cells else "narrow"
        counts[(op, foot)] += 1
    return counts


def per_step(boundary: str, tr: int = 16, cols: int = 256,
             runtime: bool = True, fold: int = 1,
             pack: bool = False, strip_store: bool = False,
             ) -> collections.Counter:
    """Per-step op counts: diff of a 2-step and a 1-step unroll."""
    one = count_ops(mosaic_module(boundary, 1, tr, cols, runtime, fold,
                                  pack, strip_store))
    two = count_ops(mosaic_module(boundary, 2, tr, cols, runtime, fold,
                                  pack, strip_store))
    return collections.Counter(
        {k: two[k] - one[k] for k in two if two[k] - one[k] > 0}
    )


def table(counts: collections.Counter) -> str:
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    lines = [f"  {op:32s} {foot:7s} {n:4d}" for (op, foot), n in rows]
    full = sum(n for (_, f), n in counts.items() if f == "full")
    narrow = sum(n for (_, f), n in counts.items() if f == "narrow")
    lines.append(f"  {'TOTAL full-window ops/step':40s} {full:4d}")
    lines.append(f"  {'TOTAL narrow ops/step':40s} {narrow:4d}")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--boundary", default="zero", choices=["zero", "naive"])
    p.add_argument("--tr", type=int, default=16)
    p.add_argument("--cols", type=int, default=256)
    p.add_argument("--static-params", action="store_true")
    p.add_argument("--fold", type=int, default=1,
                   help="lane-fold factor F (panels side by side)")
    p.add_argument("--pack", action="store_true",
                   help="species-packed kernel (cols = domain width; "
                   "ops run at 2x width — element-equivalent work is "
                   "2*packed ops)")
    p.add_argument("--stripstore", action="store_true",
                   help="naive strip-store vs select per-step table")
    p.add_argument("--compare", action="store_true",
                   help="zero vs naive per-step table")
    args = p.parse_args(argv)
    rt = not args.static_params
    if args.stripstore:
        st = per_step("naive", args.tr, args.cols, rt, strip_store=True)
        se = per_step("naive", args.tr, args.cols, rt)
        fs = sum(c for (_, f), c in st.items() if f == "full")
        fe = sum(c for (_, f), c in se.items() if f == "full")
        print(f"naive strip-store (per step):\n{table(st)}\n")
        print(f"naive select (per step):\n{table(se)}\n")
        print(f"full-window op ratio store/select: {fs / max(fe, 1):.3f}")
    elif args.pack:
        pc = per_step("zero", args.tr, args.cols, rt, pack=True)
        uz = per_step("zero", args.tr, args.cols, rt)
        fp = sum(c for (_, f), c in pc.items() if f == "full")
        fu = sum(c for (_, f), c in uz.items() if f == "full")
        print(f"packed zero (per step, ops at 2x width):\n{table(pc)}\n")
        print(f"unpacked zero (per step):\n{table(uz)}\n")
        print(f"element-equivalent work ratio packed/unpacked: "
              f"{2 * fp / max(fu, 1):.3f} (packed wins outright below "
              "1.0; above it the win must come from wider-op VPU "
              "throughput on narrow domains)")
    elif args.compare:
        z = per_step("zero", args.tr, args.cols, rt)
        n = per_step("naive", args.tr, args.cols, rt)
        fz = sum(c for (_, f), c in z.items() if f == "full")
        fn_ = sum(c for (_, f), c in n.items() if f == "full")
        print(f"zero boundary (per step):\n{table(z)}\n")
        print(f"naive boundary (per step):\n{table(n)}\n")
        print(f"full-window op ratio naive/zero: {fn_ / max(fz, 1):.3f} "
              "(if measured Gcell/s ratio ~matches 1/this, the gap is "
              "at the VPU op floor)")
    else:
        c = per_step(args.boundary, args.tr, args.cols, rt, args.fold)
        label = f"{args.boundary} boundary"
        if args.fold > 1:
            label += f", fold={args.fold}"
        print(f"{label} (per step):\n{table(c)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
