"""Fused Pallas TPU stencil kernel with temporal blocking.

This is the performance core of the framework — the TPU re-design of the
reference's entire optimized-backend ladder (SIMD layout + unrolled mul_add
ladder ``compute/autovec/src/lib.rs:52-115``, cache blocking
``compute/block/src/lib.rs:92-111``, and the GPU one-command-buffer
multi-dispatch pattern ``compute/gpu/naive/src/lib.rs:117-124``) collapsed
into one kernel:

- The domain is tiled into row slabs. Each grid step loads a
  ``(TR + 2*HALO, C)`` halo window of U and V from HBM into VMEM via
  element-indexed overlapping BlockSpecs (Mosaic pipelines these against
  compute automatically — the double-buffering the reference does by hand
  on GPU).
- **Temporal blocking**: K <= HALO simulation steps run entirely in VMEM
  per window before one ``(TR, C)`` result is written back. HBM traffic is
  16 bytes/cell per K steps instead of per step, lifting the roofline by K
  (the Gray-Scott step is memory-bound at ~40 flop/cell). The K-deep halo
  absorbs the cells invalidated at window edges each step, exactly like the
  reference's ``split_grid`` halo overlap (compute/shared/src/cpu.rs:112-154)
  but in time as well as space.
- State lives in HBM as ``(HALO + Rp + HALO, C)`` arrays with zero padding
  rows (the analog of SIMDConcentration's zero-filled edges,
  data/src/concentration/simd/mod.rs:42-47). Output windows write only
  interior rows into FRESH output buffers; the padding rows are restored
  by two cheap row-writes after the call (or by the sharded backend's
  halo exchange). Aliasing the outputs onto a stale double buffer — the
  v1 design — kept the padding for free but serialized Mosaic's DMA
  pipeline against compute, costing ~20% of peak. (A later dt_field
  mask-fold experiment was reverted: folding the domain mask into a
  vector time step added two (W, C) buffers of Mosaic stack liveness,
  blowing the 64 MB scoped-VMEM budget at tr=256 for a ~6% op saving.)
- Out-of-domain rows are re-zeroed after every in-VMEM step (the reaction
  term would otherwise grow them), driven by global row indices derived
  from a scalar ``origin`` operand — which also lets the *sharded* backend
  run this same kernel on row shards with halo rows delivered by
  ``lax.ppermute`` into the padding slots.

Boundary semantics (both supported, see grayscott_tpu/oracle.py): ``zero``
is the uniform separable form; ``naive`` additionally applies the
reference's clamped-window weights via per-row/column sums plus exact
strip recomputation of the top row / left column (the anchoring quirk).

Alignment notes (Mosaic requirements, probed on v5e): element-indexed
window starts and sizes must be multiples of 8 in the sublane dim, hence
halo depths are multiples of 8 (``HALO = 8`` is the minimum; deep temporal
blocking uses 16-32) and TR a multiple of 8; the lane dim uses the full
local array width.

Measured on one v5e chip at 4096^2 (see BENCHMARKS.md): with the v2
fresh-output design the step loop is VPU-bound (per-block time fits
0.63 ms + 0.198 ms/step at tr=192), so large tiles win on halo
redundancy — (tr=256, K=16) zero-border reaches 65.6 Gcell/s = 1.28x the
single-step HBM roofline.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import UnsupportedConfigError
from ..params import Parameters, Precision
from ..utils import device

#: Halo depth in rows. Must be a multiple of 8 (sublane alignment of
#: element-indexed windows); also the maximum temporal-blocking depth.
HALO = 8

#: Bumped on kernel changes that shift the performance landscape, so
#: persisted autotune winners from older kernels are not trusted.
#: v2: fresh outputs instead of stale-double-buffer aliasing (+21%).
#: v3: runtime reaction scalars via SMEM (the step math is otherwise
#: identical to v2 — narrow-operand masking variants were all measured
#: or lowering-probed negative, see make_window_stepper).
#: v4: zero-path linear fold (_zero_fold_coeffs) — ~10 fewer full-array
#: ops/step for zero semantics; naive path bit-unchanged.
KERNEL_VERSION = 4


def halo_for_steps(k: int) -> int:
    """Halo depth for K fused in-VMEM steps: K rounded up to the 8-row
    sublane alignment quantum, floored at :data:`HALO`. The single source
    of the rule — the backends and the autotuner's compile-ceiling guard
    must agree on it."""
    return max(-(-k // 8) * 8, HALO)


def _shift_cols(x, d: int):
    """Shift along lanes with zero fill: d=+1 gives x[r, c-1] (0 at c=0).

    Implemented as a circular lane roll plus an iota-masked zero of the
    wrapped column (Mosaic cannot lower lane-offset concatenations).
    """
    c = x.shape[1]
    shift = d if d >= 0 else c + d
    rolled = pltpu.roll(x, shift, axis=1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    edge = 0 if d == 1 else c - 1
    return jnp.where(ci == edge, 0.0, rolled)  # weak 0: keeps x.dtype


def _shift_rows(x, d: int):
    """Circular shift along sublanes: d=+1 gives x[r-1, c].

    Wrap-around only pollutes the window's garbage ring, which the K-deep
    halo absorbs; true domain boundaries are covered by the zero padding
    rows in HBM (kept zero by the per-step domain mask).
    """
    shift = d if d >= 0 else x.shape[0] + d  # pltpu.roll wants shift >= 0
    return pltpu.roll(x, shift, axis=0)


def _col_iota(c: int):
    """(1, C) int32 column indices (built in-kernel: Pallas kernels cannot
    capture array constants)."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)


def _col_sums(gcol, c_total, h: np.ndarray, dtype=Precision):
    """(1, W_c) per-column sums of in-bounds separable taps (naive
    semantics), in global column coordinates (``gcol`` = (1, W_c) int32
    global index of each local column; out-of-domain values are irrelevant
    because those columns are masked to zero each step)."""
    c = gcol.shape[1]
    mid = jnp.full((1, c), float(h.sum()), dtype)
    lo = jnp.where(gcol == 0, jnp.asarray(float(h[1] + h[2]), dtype), mid)
    return jnp.where(
        gcol == c_total - 1, jnp.asarray(float(h[0] + h[1]), dtype), lo
    )


def _edge_strip_1xc(x, halo: int, w2: np.ndarray, ok_e, c0_row,
                    chalo: int, shift_cols):
    """Naive-semantics diffusion gradient of the (1, W_c) global-row-0
    strip, in global column coordinates.

    Same math as ops.stencil.naive_edge_strip, expressed on (1, W_c)
    window slices (see that docstring for the formula and reference
    citations). Global column 0 sits at static local column ``chalo``
    whenever this window contains it (the westmost shard; see the row
    analog in the module docstring).

    The loop-invariant ``ok_e``/``c0_row`` predicates are hoisted into
    the window context (r5): Mosaic performs no loop-invariant code
    motion across the unrolled K-step chain, so computing them here
    cost real per-step narrow ops. NOTE a stronger restructure — slicing
    the column-shifted taps from the full-window shifted tensors the
    laplacian computes (bitwise-equal values: lane shifts commute with
    row extraction) — was built and measured in round 5: +1.1 Gcell/s
    on-chip at 4096^2 naive, but it makes those tensors multi-consumer
    and XLA:CPU then contracts the runtime-parameter and static modes
    DIFFERENTLY (1-ulp divergence after ~7 steps), breaking the
    modes-bit-identical contract (tests/test_pallas.py); rejected for
    the bit-frozen default."""
    rows = [
        (shift_cols(x[halo + i : halo + i + 1, :], 1),
         x[halo + i : halo + i + 1, :],
         shift_cols(x[halo + i : halo + i + 1, :], -1))
        for i in range(2)
    ]
    center = rows[0][1]
    full = jnp.zeros_like(center)
    for i in range(2):
        taps = rows[i]
        for j in range(3):
            wij = float(w2[i][j])
            if wij == 0.0:
                continue
            if j == 2:
                full = full + wij * (taps[j] - center * ok_e)
            else:
                full = full + wij * (taps[j] - center)
    # global c == 0: taps are lane_i[c0], lane_i[c0+1] with weights
    # w2[i][0], w2[i][1], where c0 = chalo is the local position of col 0
    q = jnp.zeros_like(center[:, :1])
    c0 = chalo
    for i in range(2):
        xi = rows[i][1]
        for j in range(2):
            wij = float(w2[i][j])
            if wij == 0.0:
                continue
            q = q + wij * (xi[:, c0 + j : c0 + j + 1] - center[:, c0 : c0 + 1])
    return jnp.where(c0_row, q, full)


def _left_col_strip(x, w: np.ndarray, ok_s, chalo: int = 0):
    """Naive-semantics gradient of the global c == 0 column (rows g >= 1),
    which sits at static local column ``chalo`` when present.

    Per window row r (reference semantics, compute/naive/src/lib.rs:56-70
    with the column window clamped to cols {0, 1}):

        full(r) = sum_{i in 0..3, j in 0..2} w[i][j] * (x[r-1+i, j] - x[r, 0])

    with the i == 2 tap masked out on the bottom domain row (ok_s).
    Returns a (W, 1) strip. Row wrap garbage lands in the window ring.

    A (W, 128) lane-tile block formulation (aligned whole-tile slice,
    sublane rotates + one lane roll, garbage lanes discarded) was
    hardware-measured in round 5 and LOST: 82.25 vs 83.38 on-chip at
    4096² naive — the ~22 one-lane-tile-wide ops cost more than this
    narrow strided form (recorded so future rounds don't re-derive it).
    """
    cols01 = x[:, chalo : chalo + 2]
    center = x[:, chalo : chalo + 1]
    n01 = _shift_rows(cols01, 1)
    s01 = _shift_rows(cols01, -1)
    rows = (n01, cols01, s01)
    full = jnp.zeros_like(center)
    for i in range(3):
        for j in range(2):
            wij = float(w[i][j])
            if wij == 0.0:
                continue
            tap = rows[i][:, j : j + 1]
            if i == 2:
                full = full + wij * (tap - center) * ok_s
            else:
                full = full + wij * (tap - center)
    return full


def _edge_strip_sliced(x, xw, xe, halo: int, w2: np.ndarray, ok_e,
                       c0_row, chalo: int):
    """slice_taps variant of :func:`_edge_strip_1xc`: identical strip
    arithmetic, but the column-shifted taps are ROWS of the full-window
    shifted tensors ``xw = shift_cols(x, 1)`` / ``xe = shift_cols(x, -1)``
    (bitwise-equal values — lane shifts commute with row extraction)."""
    rows = [
        (xw[halo + i : halo + i + 1, :], x[halo + i : halo + i + 1, :],
         xe[halo + i : halo + i + 1, :])
        for i in range(2)
    ]
    center = rows[0][1]
    full = jnp.zeros_like(center)
    for i in range(2):
        taps = rows[i]
        for j in range(3):
            wij = float(w2[i][j])
            if wij == 0.0:
                continue
            if j == 2:
                full = full + wij * (taps[j] - center * ok_e)
            else:
                full = full + wij * (taps[j] - center)
    q = jnp.zeros_like(center[:, :1])
    c0 = chalo
    for i in range(2):
        xi = rows[i][1]
        for j in range(2):
            wij = float(w2[i][j])
            if wij == 0.0:
                continue
            q = q + wij * (xi[:, c0 + j : c0 + j + 1] - center[:, c0 : c0 + 1])
    return jnp.where(c0_row, q, full)


def unpack_reaction(react_ref, dt_is_one: bool):
    """In-kernel unpack of the SMEM runtime-reaction operand — the ONE
    definition of the operand layout contract (REACTION_LEN scalars +
    the dt==1 predicate), shared by every kernel that takes one."""
    return tuple(
        react_ref[0, i] for i in range(REACTION_LEN)
    ) + (dt_is_one,)


def make_window_stepper(
    params: Parameters, boundary: str, c: int, halo: int = HALO,
    chalo: int = 0, dtype=Precision, reaction=None,
    zero_fill_rows: bool = False, mask_rows: bool = True,
    mask_cols: bool | None = None,
    fold: Tuple[int, int, int] | None = None,
    pack: bool = False,
    fast_fold: bool = False,
    slice_taps: bool = False,
):
    """Build the per-window step for one in-VMEM iteration.

    ``slice_taps`` (opt-in, ``--pallas-naive-fix slice``): the naive
    top-row quirk strip slices its column-shifted taps from the SAME
    full-window shifted tensors the laplacian consumes — bitwise-equal
    tap VALUES (lane shifts and their lane-indexed zero-fill masks act
    row-independently, so ``shift_cols(x, d)[r] == shift_cols(x[r], d)``)
    replacing the per-step narrow (1, C) lane rotates + mask rebuilds
    whose Mosaic lowering dominates the naive residual. Measured r5:
    80.15 -> 83.38 on-chip Gcell/s at 4096^2 naive (+4.0%). NOT the
    default because the multi-consumer shift tensors change XLA's
    per-mode fusion/contraction choices: the runtime-parameter and
    static modes (and this kernel vs the bit-frozen default) drift at
    the 1-ulp/step scale — the same budget class as naive_fold/pack
    (tests/test_slicetaps.py).

    Returns ``(precompute, step)``: ``precompute(giota, r_total)`` builds the
    loop-invariant context (domain mask, boundary weight-sum field, strip
    masks) ONCE per window, and ``step(u, v, ctx)`` advances one simulation
    step. Hoisting the invariants out of the K-step loop matters: they cost
    several full-window VPU ops each.

    ``giota`` is the (W, 1) int32 global row index of each window row;
    ``gcol`` the (1, W_c) global column index of each local column (plain
    ``0..c`` single-chip); ``r_total``/``c_total`` the global extents.
    ``chalo > 0`` enables column halos (2-D sharding): column shifts become
    raw lane rolls whose wrap garbage lands in the column halo ring, and
    out-of-domain columns are re-zeroed each step by the domain mask,
    mirroring the row machinery exactly.

    ``reaction``: optional ``(du_rate, dv_rate, feed, min_feed_kill, dt,
    dt_is_one)`` — five traced f32 scalars plus one STATIC bool — the
    runtime-parameter mode (the ``weights-runtime`` analog for the
    reaction constants, data/src/parameters.rs:40-53): parameter changes
    reuse the compiled kernel. ``dt_is_one`` statically elides the two
    ``du*dt``/``dv*dt`` multiplies when dt is exactly 1.0 (the default),
    recovering what constant folding gave the static mode (2 of ~45
    full-window ops/step, measured 3.5%). ``None`` folds everything from
    ``params`` at trace time; all modes are bit-identical (same f32
    rounding, same op order; ``x * 1.0 == x`` bitwise).

    Masking: out-of-domain rows are re-zeroed each step by a (W, 1)
    row-predicate select (columns too when ``chalo > 0``). Folding the
    mask into a per-row dt vector to save the selects is a measured
    negative BOTH ways: a (W, C) dt field (round 1) and a (W, 1) dt row
    (round 2) each add ~9.5 MB of Mosaic stack liveness — the compiler
    materializes broadcast multiplicands at full window size — and OOM
    the scoped-VMEM budget at the production tile sizes.

    ``fold = (F, Cd, Rp)``: the lane-fold layout for narrow domains —
    ``F`` row-panels of the true ``(R, Cd)`` domain (panel ``p`` = global
    rows ``[p*Rp, (p+1)*Rp)``) sit side by side along lanes, so the
    kernel computes on ``F*Cd``-wide windows (VPU per-op throughput at
    1920-wide windows measured ~58% of 4096-wide at equal window size).
    Column shifts zero-fill at every panel seam (each panel spans the
    full column range, so seams ARE the true domain column edges), and
    the domain-row mask becomes panel-dependent (a (W, F*Cd) predicate).
    Inter-panel halo rows are refreshed OUTSIDE the kernel every K-step
    block by :func:`fold_refresh` — the sharded backend's ppermute halo
    exchange pattern, but across lane space within one chip.

    ``pack``: the species-packed layout — U and V side by side along
    lanes in ONE array ``x = [U | V]`` of width ``2*Cd`` (``Cd = c//2``
    local panel width; true domain columns = ``c_total``). The separable
    diffusion then runs ONCE per step instead of once per species
    (halving its op count), the species seam reuses the lane-fold panel
    machinery (each panel's column edges are true domain edges), and the
    reaction couples the halves through one lane roll:
    ``y = roll(x, Cd) = [V | U]``, so ``p = x*y = [uv | vu]`` and
    ``q = p * select(half, y, x) = [(uv)v | (vu)v]`` — ``uv^2`` in BOTH
    halves with the same multiply order as the unpacked kernel (f32
    multiplication is commutative bitwise). Per-species reaction
    constants become per-lane coefficient vectors (built once per
    window). Zero boundary + separable plan only; returns
    ``step(x, ctx)`` taking the single packed array.
    """
    plan = params.separable_plan()
    w = params.weights_array()
    if fast_fold:
        # the FOLDED naive mode (opt-in, ulp-budget — VERDICT r3 #3):
        # the naive update's u-linear terms (the Euler identity, the
        # feed drain, AND the clamped-window `- x*b_field` center
        # correction) collect into ONE per-window coefficient FIELD
        # per species:
        #     u' = ((Cu*s_u - dt*uv2) + E) + AUvec*u,
        #     AUvec = (1 - dt*f) - Cu*b_field        (BVvec likewise)
        # — the zero path's v4 linear fold generalized to a spatially
        # varying coefficient. Saves the 2 subtracts/multiplies of the
        # b_field application and the naive-ordered reaction's extra
        # ~10 full-window ops; the two quirk strips are re-derived with
        # NARROW math and selected in as before. Reassociates the f32
        # sum, so results drift ulp-scale from the bit-frozen naive
        # default (same budget as fold/pack/strip_store); the quirk
        # strip VALUES themselves keep their op order.
        if boundary != "naive":
            raise ValueError("fast_fold applies to the naive boundary")
        if fold is not None or pack:
            raise ValueError("fast_fold excludes lane-fold and pack")
    if slice_taps and boundary != "naive":
        raise ValueError("slice_taps applies to the naive boundary")
    if pack:
        if fold is not None or chalo != 0:
            raise UnsupportedConfigError("pack excludes fold and column halos")
        if boundary != "zero":
            raise UnsupportedConfigError("pack supports the zero boundary only")
        if plan[0] != "separable":
            raise UnsupportedConfigError("pack requires a separable stencil plan")
        if c % 2 != 0:
            raise ValueError(f"packed array width must be even, got {c}")
        cd_p = c // 2

        def shift_cols(x, d):
            # the species seam IS a lane-fold panel seam (two panels at
            # row offset zero): each panel's column edges are true
            # domain edges, zero-filled on every shift
            cc = x.shape[1]
            s = d if d >= 0 else cc + d
            rolled = pltpu.roll(x, s, axis=1)
            ci = _col_iota(cc)
            base = 0 if d == 1 else cd_p - 1
            m = jnp.logical_or(ci == base, ci == cd_p + base)
            return jnp.where(m, 0.0, rolled)

    elif fold is not None:
        if chalo != 0:
            raise UnsupportedConfigError("fold excludes column halos")
        fold_f, fold_cd, fold_rp = fold

        def shift_cols(x, d):
            # panel-seam zero fill: column edges of EVERY panel are true
            # domain column edges. F-1 extra (1, C)-row compares per
            # shift; the full-window select is the same one the unfolded
            # path pays.
            cc = x.shape[1]
            s = d if d >= 0 else cc + d
            rolled = pltpu.roll(x, s, axis=1)
            ci = _col_iota(cc)
            base = 0 if d == 1 else fold_cd - 1
            m = ci == base
            for p in range(1, fold_f):
                m = jnp.logical_or(m, ci == p * fold_cd + base)
            return jnp.where(m, 0.0, rolled)

    elif chalo == 0:
        shift_cols = _shift_cols  # zero-fill at the (true global) lane edges
    else:

        def shift_cols(x, d):
            s = d if d >= 0 else x.shape[1] + d
            return pltpu.roll(x, s, axis=1)

    if zero_fill_rows:
        # resident (halo-free) layout: row edges are true domain edges,
        # so row shifts zero-fill like the column shifts do
        def shift_rows(x, d):
            n = x.shape[0]
            rolled = pltpu.roll(x, d if d >= 0 else n + d, axis=0)
            ri = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            return jnp.where(ri == (0 if d == 1 else n - 1), 0.0, rolled)
    else:
        shift_rows = _shift_rows  # wrap garbage absorbed by the halo ring

    if plan[0] == "separable":
        _, h, alpha = plan
        h0, h1 = float(h[0]), float(h[1])

        def laplacian(x, b_field, shifted=None):
            xw, xe = shifted if shifted is not None else (
                shift_cols(x, 1), shift_cols(x, -1))
            t = h1 * x + h0 * (xw + xe)
            s = h1 * t + h0 * (shift_rows(t, 1) + shift_rows(t, -1))
            if boundary == "zero" or b_field is None:
                # zero: the ``- alpha*x`` center correction is folded
                # into the reaction's Au/Bv coefficients
                # (_zero_fold_coeffs); naive fast_fold: the b_field
                # correction rides AUvec/BVvec the same way
                return s
            return s - x * b_field

        def make_b_field(giota, r_total, gcol, c_total, lcol=None, poff=None,
                         interior=False):
            if boundary == "zero":
                return None
            # folded: panel-local columns and panel row offsets make the
            # edge tests per-panel ((W,1)-vs-(1,F*Cd) broadcasts)
            cs = _col_sums(lcol if lcol is not None else gcol,
                           c_total, h, dtype)
            if interior:
                # window holds no global row 0 / r-1: the row factor is
                # the constant full sum, so the field collapses to a
                # (1, W_c) vector — same products bitwise where used
                return jnp.asarray(float(h.sum()), dtype) * cs
            if poff is None:
                edge = jnp.logical_or(giota == 0, giota == r_total - 1)
            else:
                edge = jnp.logical_or(
                    giota == -poff, giota == r_total - 1 - poff
                )
            rs = jnp.where(
                edge, jnp.asarray(float(h[1] + h[2]), dtype),
                jnp.asarray(float(h.sum()), dtype),
            )
            return rs * cs  # (W, W_c), materialized once per window

    else:
        wc = params.corrected_weights()

        def _taps(x, shifted=None):
            xw, xe = shifted if shifted is not None else (
                shift_cols(x, 1), shift_cols(x, -1))
            out = {}
            for i in range(3):
                for j in range(3):
                    src = (xw, x, xe)[j]
                    out[(i, j)] = src if i == 1 else shift_rows(src, 1 - i)
            return out

        def laplacian(x, b_field, shifted=None):
            taps = _taps(x, shifted)
            full = jnp.zeros_like(x)
            if boundary == "zero":
                for i in range(3):
                    for j in range(3):
                        if wc[i][j] != 0.0:
                            full = full + float(wc[i][j]) * taps[(i, j)]
                return full
            for i in range(3):
                for j in range(3):
                    if w[i][j] != 0.0:
                        full = full + float(w[i][j]) * taps[(i, j)]
            if b_field is None:  # naive fast_fold: correction in AUvec
                return full
            return full - x * b_field

        def make_b_field(giota, r_total, gcol, c_total, lcol=None, poff=None,
                         interior=False):
            if boundary == "zero":
                return None
            # per-column sums of in-bounds weights for each stencil row i
            col = lcol if lcol is not None else gcol
            cw = []
            for i in range(3):
                mid = jnp.full(col.shape, float(w[i].sum()), dtype)
                row = jnp.where(
                    col == 0, jnp.asarray(float(w[i][1] + w[i][2]), dtype),
                    mid,
                )
                row = jnp.where(
                    col == c_total - 1,
                    jnp.asarray(float(w[i][0] + w[i][1]), dtype), row,
                )
                cw.append(row)
            if interior:
                # no global row 0 / r-1 in the window: all stencil rows
                # in bounds, field is the (1, W_c) column-sum vector
                return cw[0] + cw[1] + cw[2]
            top_lim = 1 if poff is None else 1 - poff
            bot_lim = r_total - 2 if poff is None else r_total - 2 - poff
            ok_top = (giota >= top_lim).astype(dtype)
            ok_bot = (giota <= bot_lim).astype(dtype)
            one = jnp.asarray(1.0, dtype)
            rok = (ok_top, one, ok_bot)
            return rok[0] * cw[0] + rok[1] * cw[1] + rok[2] * cw[2]

    if reaction is None:
        # weak-typed Python floats: ops inherit the array dtype, and for
        # f32 the trace-time cast is bit-identical to Precision() constants
        du_rate = float(Precision(params.diffusion_rate_u))
        dv_rate = float(Precision(params.diffusion_rate_v))
        f = float(Precision(params.feed_rate))
        mfk = float(params.min_feed_kill())
        dt = float(Precision(params.time_step))
        dt_is_one = dt == 1.0
        # zero-path fold coefficients: SAME host f32 arithmetic as
        # reaction_operand, so both modes trace identical constants
        cu, cv, e_f, au, bv = (
            float(x) for x in _zero_fold_coeffs(
                du_rate, dv_rate, f, mfk, dt, _plan_alpha(params)
            )
        )
    else:
        (du_rate, dv_rate, f, mfk, dt,
         cu, cv, e_f, au, bv, dt_is_one) = reaction
    if fast_fold:
        # naive-fold base coefficients: the zero path's au/bv WITHOUT
        # the corrected-weight alpha term (naive centers via b_field)
        if reaction is None:
            au0 = float(Precision(1.0) - Precision(e_f))
            bv0 = float(Precision(1.0) + Precision(dt) * Precision(mfk))
        else:
            au0 = 1.0 - e_f
            bv0 = 1.0 + dt * mfk

    def precompute(giota, r_total, gcol, c_total, interior=False):
        """Loop-invariant context: domain mask / per-row dt, boundary
        weight-sum field, strip masks — several full-window VPU ops, paid
        once per window.

        ``interior=True`` (unpacked, unfolded, full-width callers only)
        asserts the window holds NO out-of-domain rows and no global row
        0 / r-1: the domain mask drops entirely (2 full-window selects
        per species per step), the naive top-row fix-up disappears
        (1 more select per species per step plus the strip compute), and
        the boundary weight field collapses to a (1, W_c) vector.
        Every retained operation computes the same values; callers
        branching on interiority (ops.megakernel ``specialize``) still
        see ulp-scale drift from the compiler's per-branch FMA
        contraction, so specialization is an opt-in mode, not the
        bit-frozen default."""
        if pack:
            # species-packed context: the half predicate (U lanes vs V
            # lanes), the per-lane reaction coefficient vectors, and the
            # row/panel-column domain mask. All loop-invariant; the
            # coefficient values are the SAME host/traced scalars the
            # unpacked zero path uses, broadcast per half; the V half's
            # add chain has one extra +Evec add (zero on V lanes), which
            # is exact in IEEE terms but changes the compiler's FMA-
            # contraction choices — ulp-scale spread vs the unpacked
            # kernel, same budget as the fold layout (tests/test_pack.py).
            half = gcol < cd_p
            ctx = {"b_field": None, "halfm": half}
            mask = None
            if mask_rows:
                mask = jnp.logical_and(giota >= 0, giota < r_total)
            if mask_cols:
                # per-panel column padding (c_total < Cd): mask it like
                # the unpacked resident layout masks its lane padding
                lcol = jnp.where(half, gcol, gcol - cd_p)
                inc = lcol < c_total
                mask = inc if mask is None else jnp.logical_and(mask, inc)
            ctx["dommask"] = mask
            ctx["cvec"] = jnp.where(half, cu, cv)
            ctx["evec"] = jnp.where(half, e_f, 0.0)
            ctx["avec"] = jnp.where(half, au, bv)
            # the +-1/+-dt quadratic-term sign: (-1)*q == -q and
            # (-dt)*q == -(dt*q) bitwise, matching the unpacked
            # subtraction exactly
            ctx["qvec"] = (jnp.where(half, -1.0, 1.0) if dt_is_one
                           else jnp.where(half, -dt, dt))
            return ctx
        if interior and (fold is not None or chalo > 0):
            raise ValueError(
                "interior windows require unfolded full-width layouts"
            )
        poff = lcol = None
        if fold is not None:
            # panel row offset (1, F*Cd) and panel-local column index:
            # global row of window row w at column c is poff[c] + w
            poff = jnp.zeros_like(gcol)
            lcol = gcol
            for p in range(1, fold_f):
                past = gcol >= p * fold_cd
                poff = poff + jnp.where(
                    past, jnp.int32(fold_rp), jnp.int32(0)
                )
                lcol = lcol - jnp.where(
                    past, jnp.int32(fold_cd), jnp.int32(0)
                )
        bf = make_b_field(giota, r_total, gcol,
                          fold_cd if fold is not None else c_total,
                          lcol=lcol, poff=poff, interior=interior)
        if fast_fold:
            # fold the boundary weight field into the per-species
            # u-linear coefficients; the laplacian then skips the
            # `- x*b_field` subtract entirely (b_field=None)
            ctx = {"b_field": None,
                   "auvec": au0 - cu * bf,
                   "bvvec": bv0 - cv * bf}
        else:
            ctx = {"b_field": bf}
        # Out-of-domain cells are re-zeroed each step by a predicate
        # select ((W, 1) row predicate for full-width windows; joined
        # with a column predicate for column-haloed/column-padded
        # layouts; None for exact-fit resident layouts, saving 2 full-
        # window selects/step). Measured on v5e: folding the mask into a
        # per-row dt VECTOR instead blows Mosaic stack liveness by
        # ~9.5 MB — the compiler materializes broadcast multiplicands at
        # full window size, same failure as round 1's (W, C) dt_field.
        need_cols = (chalo > 0) if mask_cols is None else mask_cols
        mask = None
        if fold is not None:
            # panel-dependent row validity: window row w of the panel at
            # column c holds global row poff[c] + w. Express the
            # in-domain test as (W, 1)-vs-(1, F*Cd) broadcast compares so
            # no (W, F*Cd) int32 field is materialized — only the boolean
            # mask (built once per window). Out-of-range cells include
            # panel 0's top halo rows and everything past R: both are
            # true domain boundary, kept zero every step. Halo rows of
            # interior panels map to REAL global rows, so the mask keeps
            # them live — they hold neighbor-panel data refreshed every
            # K-step block by fold_refresh.
            mask = jnp.logical_and(giota >= -poff, giota < r_total - poff)
        elif mask_rows and not interior:
            mask = jnp.logical_and(giota >= 0, giota < r_total)
        if need_cols:
            cols_in = jnp.logical_and(gcol >= 0, gcol < c_total)
            mask = cols_in if mask is None else \
                jnp.logical_and(mask, cols_in)
        ctx["dommask"] = mask
        if boundary == "naive" and fold is not None:
            # the naive machinery per panel: each panel spans the full
            # column range, so every panel owns a copy of the global
            # column-0 quirk strip (selected by its own mask) while the
            # top-row strip exists only where poff == 0 (panel 0)
            ctx["col0_masks"] = [
                jnp.logical_and(
                    gcol == p * fold_cd,
                    jnp.logical_and(giota >= 1 - p * fold_rp,
                                    giota < r_total - p * fold_rp),
                )
                for p in range(fold_f)
            ]
            ctx["ok_s_p"] = [
                (giota <= r_total - 2 - p * fold_rp).astype(dtype)
                for p in range(fold_f)
            ]
            ctx["top_mask"] = jnp.logical_and(giota == 0, gcol < fold_cd)
            ctx["gcol"] = lcol
            ctx["c_total"] = fold_cd
            # loop-invariant strip predicates, hoisted (no LICM across
            # the unrolled K-step chain in Mosaic)
            ctx["ok_e"] = (lcol + 1 <= fold_cd - 1).astype(dtype)
            ctx["c0_row"] = lcol == 0
        elif boundary == "naive" and interior:
            # no global row 0 (no top-row quirk strip) and no row r-1
            # (the ok_s bottom-tap mask is identically 1, and x * 1.0 is
            # a bitwise identity inside _left_col_strip); the column-0
            # strip remains — every full-width window holds it
            ctx["col0_mask"] = gcol == 0  # (1, W_c); select broadcasts
            ctx["top_mask"] = None
            ctx["ok_s"] = 1.0
            ctx["gcol"] = gcol
            ctx["c_total"] = c_total
        elif boundary == "naive":
            in_dom = jnp.logical_and(giota >= 1, giota < r_total)
            ctx["col0_mask"] = jnp.logical_and(gcol == 0, in_dom)
            ctx["col0_in"] = in_dom  # (W, 1) row part, for strip stores
            ctx["top_mask"] = giota == 0
            ctx["ok_s"] = (giota <= r_total - 2).astype(dtype)
            ctx["gcol"] = gcol
            ctx["c_total"] = c_total
            # loop-invariant strip predicates, hoisted (no LICM across
            # the unrolled K-step chain in Mosaic)
            ctx["ok_e"] = (gcol + 1 <= c_total - 1).astype(dtype)
            ctx["c0_row"] = gcol == 0
        return ctx

    def _fix_naive(x, full, ctx, shifted=None):
        """Apply the clamped-window quirk fix-ups to one species' full.

        Full-window masked selects are the ONLY Mosaic-lowerable form of
        a value-level row/column patch inside a TC kernel: jnp .at[].set
        lowers to `scatter` and a narrow patch to `dynamic_update_slice`,
        and Mosaic implements NEITHER (probed round 2 via jax.export
        cross-lowering; both raise NotImplementedError in
        pallas/mosaic/lowering.py). The 4 selects/step are naive's
        irreducible cost at the value level — cutting them needs a
        scratch-ref state layout, not smaller operands. (Interior
        windows — ``precompute(interior=True)`` — drop the top-row
        select: ``top_mask`` is None there because the window provably
        holds no global row 0.)"""
        if fold is None:
            strip = _left_col_strip(x, w, ctx["ok_s"], chalo)
            fixed = jnp.where(ctx["col0_mask"], strip, full)
            if ctx["top_mask"] is None:
                return fixed
        else:
            # every panel holds global column 0 at its local column 0
            # (lane p*Cd; _left_col_strip's chalo is exactly "the static
            # local column of global col 0"). F chained selects: the
            # F - 1 extra full-window ops per species per step are the
            # fold's naive tax. The top strip is computed once on the
            # full folded row — panels other than 0 produce garbage
            # lanes there, but top_mask never selects them.
            fixed = full
            for p in range(fold_f):
                strip_p = _left_col_strip(
                    x, w, ctx["ok_s_p"][p], p * fold_cd
                )
                fixed = jnp.where(ctx["col0_masks"][p], strip_p, fixed)
        if shifted is not None:
            top = _edge_strip_sliced(x, *shifted, halo, w[0:2, :],
                                     ctx["ok_e"], ctx["c0_row"], chalo)
        else:
            top = _edge_strip_1xc(x, halo, w[0:2, :], ctx["ok_e"],
                                  ctx["c0_row"], chalo, shift_cols)
        return jnp.where(ctx["top_mask"], top, fixed)

    def _fix_naive_store(x, full, ctx, ref, at_top, shifted=None):
        """Strip-STORE variant of :func:`_fix_naive`: write ``full`` to a
        VMEM scratch ref once, then patch the quirk strips with NARROW
        ref stores — a (W, 1) column-0 store plus, only in the window
        holding global row 0, a (1, C) top-row store — instead of 2
        full-window selects per species per step. The strip expressions
        and overwrite order (column first, top row last) match the
        select path, but the ref round trip MATERIALIZES the gradient,
        changing FMA contraction — ulp-scale drift vs the select path
        (tests/test_stripstore.py budgets 3e-7, like fold/pack); the
        select path stays the bit-frozen default. Full-width
        single-shard-column windows only (``chalo == 0``, no fold):
        the strip positions are static.
        Trade-off under test (ROADMAP "strip-store"): saves 4 full-window
        VPU ops/step but adds a full store/load round-trip per species
        per step — the same materialization pressure that sank the ILP
        split."""
        ref[:] = full
        strip = _left_col_strip(x, w, ctx["ok_s"], chalo)
        ref[:, chalo : chalo + 1] = jnp.where(
            ctx["col0_in"], strip, full[:, chalo : chalo + 1]
        )

        @pl.when(at_top)
        def _():
            if shifted is not None:
                top = _edge_strip_sliced(x, *shifted, halo, w[0:2, :],
                                         ctx["ok_e"], ctx["c0_row"], chalo)
            else:
                top = _edge_strip_1xc(x, halo, w[0:2, :], ctx["ok_e"],
                                      ctx["c0_row"], chalo, shift_cols)
            ref[halo : halo + 1, :] = top

        return ref[:]

    def step(u, v, ctx, fix=None):
        # slice_taps: ONE shared shifted-tensor pair per species feeds
        # both the laplacian and the top quirk strip (see the docstring)
        sh_u = sh_v = None
        if slice_taps and not pack:
            sh_u = (shift_cols(u, 1), shift_cols(u, -1))
            sh_v = (shift_cols(v, 1), shift_cols(v, -1))
        full_u = laplacian(u, ctx["b_field"], sh_u)
        full_v = laplacian(v, ctx["b_field"], sh_v)
        if boundary == "naive" and fast_fold:
            # folded naive (opt-in ulp mode): zero-style linear fold
            # with per-window coefficient fields; the two quirk strips
            # are re-derived with NARROW math at their static positions
            # and selected in (same select count as _fix_naive, but the
            # bulk update drops from ~19 extra ops to 0)
            uv_square = u * v * v
            q = uv_square if dt_is_one else dt * uv_square
            un = ((cu * full_u - q) + e_f) + ctx["auvec"] * u
            vn = (cv * full_v + q) + ctx["bvvec"] * v
            ch0 = chalo
            strip_u = _left_col_strip(u, w, ctx["ok_s"], ch0)
            strip_v = _left_col_strip(v, w, ctx["ok_s"], ch0)
            q0 = q[:, ch0 : ch0 + 1]
            un0 = ((cu * strip_u - q0) + e_f) + au0 * u[:, ch0 : ch0 + 1]
            vn0 = (cv * strip_v + q0) + bv0 * v[:, ch0 : ch0 + 1]
            un = jnp.where(ctx["col0_mask"], un0, un)
            vn = jnp.where(ctx["col0_mask"], vn0, vn)
            if ctx["top_mask"] is not None:
                if sh_u is not None:
                    top_u = _edge_strip_sliced(
                        u, *sh_u, halo, w[0:2, :], ctx["ok_e"],
                        ctx["c0_row"], ch0)
                    top_v = _edge_strip_sliced(
                        v, *sh_v, halo, w[0:2, :], ctx["ok_e"],
                        ctx["c0_row"], ch0)
                else:
                    top_u = _edge_strip_1xc(
                        u, halo, w[0:2, :], ctx["ok_e"], ctx["c0_row"],
                        ch0, shift_cols)
                    top_v = _edge_strip_1xc(
                        v, halo, w[0:2, :], ctx["ok_e"], ctx["c0_row"],
                        ch0, shift_cols)
                qt = q[halo : halo + 1, :]
                un_t = ((cu * top_u - qt) + e_f) \
                    + au0 * u[halo : halo + 1, :]
                vn_t = (cv * top_v + qt) + bv0 * v[halo : halo + 1, :]
                un = jnp.where(ctx["top_mask"], un_t, un)
                vn = jnp.where(ctx["top_mask"], vn_t, vn)
            if ctx["dommask"] is not None:
                un = jnp.where(ctx["dommask"], un, 0.0)
                vn = jnp.where(ctx["dommask"], vn, 0.0)
            return un, vn
        if boundary == "naive":
            # the bit-frozen path: exact reference-CPU semantics — the
            # parity suite and goldens pin every rounding in this order
            if fix is None:
                full_u = _fix_naive(u, full_u, ctx, sh_u)
                full_v = _fix_naive(v, full_v, ctx, sh_v)
            else:
                u_fix, v_fix, at_top = fix
                full_u = _fix_naive_store(u, full_u, ctx, u_fix, at_top,
                                          sh_u)
                full_v = _fix_naive_store(v, full_v, ctx, v_fix, at_top,
                                          sh_v)
            uv_square = u * v * v
            du = du_rate * full_u - uv_square + f * (1.0 - u)
            dv = dv_rate * full_v + uv_square + mfk * v
            if dt_is_one:
                # x * 1.0 == x bitwise: skipping the multiply is what
                # static constant folding did (measured -3.5% when lost).
                # The runtime-parameter mode specializes on THIS predicate
                # only: f/k/Du/Dv changes never recompile; a dt change off
                # the 1.0 default recompiles once to the general form.
                un = u + du
                vn = v + dv
            else:
                un = u + du * dt
                vn = v + dv * dt
        else:
            # zero path: every u-linear term (the Euler identity, the
            # feed drain, the folded -alpha*x center correction) is
            # collected into ONE coefficient per species
            # (_zero_fold_coeffs) — 10 fewer full-array ops per step than
            # the naive-ordered formula. Reassociates the f32 sum, like
            # the separable decomposition itself; static vs runtime-
            # parameter modes stay bitwise within one kernel (the
            # coefficients come from one host computation), but the
            # longer linear chains give the compiler FMA-contraction
            # freedom, so DIFFERENT kernel specializations may round
            # 1 ulp apart (tests/test_fold.py budgets for this).
            uv_square = u * v * v
            quv2 = uv_square if dt_is_one else dt * uv_square
            un = ((cu * full_u - quv2) + e_f) + au * u
            vn = (cv * full_v + quv2) + bv * v
        if ctx["dommask"] is not None:
            un = jnp.where(ctx["dommask"], un, 0.0)
            vn = jnp.where(ctx["dommask"], vn, 0.0)
        return un, vn

    def step_packed(x, ctx):
        # one diffusion pass over [U | V]; the reaction couples the
        # halves through a single Cd-lane roll (y = [V | U]):
        #   p = x*y           = [uv  | vu ]      (uv == vu bitwise)
        #   q = p*sel(h,y,x)  = [(uv)v | (vu)v]  = uv^2 in both halves,
        # same multiply order as the unpacked kernel. The update is the
        # v4 linear fold with per-lane coefficients (ulp-equivalent to
        # the unpacked kernel, not bitwise — see precompute above):
        #   x' = ((Cvec*s + Qvec*q) + Evec) + Avec*x
        s = laplacian(x, None)
        y = pltpu.roll(x, cd_p, axis=1)
        p = x * y
        q = p * jnp.where(ctx["halfm"], y, x)
        xn = ((ctx["cvec"] * s + ctx["qvec"] * q) + ctx["evec"]) \
            + ctx["avec"] * x
        if ctx["dommask"] is not None:
            xn = jnp.where(ctx["dommask"], xn, 0.0)
        return xn

    return precompute, (step_packed if pack else step)


def _kernel(scal_ref, *refs,
            steps: int, tr: int, c: int, halo: int, chalo: int, params,
            boundary: str, tc: int | None = None,
            runtime_params: bool = False, dt_is_one: bool = False,
            fold: Tuple[int, int, int] | None = None,
            sanitize: bool = False, strip_store: bool = False,
            fast_fold: bool = False, slice_taps: bool = False):
    fix_refs = None
    if strip_store:
        *refs, u_fix, v_fix = refs
        fix_refs = (u_fix, v_fix)
    if runtime_params:
        react_ref, u_ref, v_ref, uo_ref, vo_ref = refs
        reaction = unpack_reaction(react_ref, dt_is_one)
    else:
        u_ref, v_ref, uo_ref, vo_ref = refs
        reaction = None
    w_rows = tr + 2 * halo
    # Reduced-precision modes are STORAGE modes: state rides HBM (and the
    # window DMAs) in bf16, halving memory traffic and footprint, but the
    # in-VMEM step loop always computes in f32 — the VPU has 32-bit lanes
    # (no packed-bf16 arithmetic), and Mosaic's tpu.dynamic_rotate cannot
    # rotate 16-bit vectors at all, so computing in bf16 is both slower
    # and uncompilable on hardware. Rounding to bf16 happens once per
    # K-step block (on store), not per step.
    store_dtype = u_ref.dtype
    precompute, step = make_window_stepper(
        params, boundary, c, halo, chalo, dtype=jnp.float32,
        reaction=reaction, fold=fold, fast_fold=fast_fold,
        slice_taps=slice_taps,
    )
    origin = scal_ref[0, 0]
    r_total = scal_ref[0, 1]
    origin_c = scal_ref[0, 2]
    c_total = scal_ref[0, 3]
    g0 = origin + pl.program_id(0) * tr
    giota = g0 + jax.lax.broadcasted_iota(jnp.int32, (w_rows, 1), 0)
    if tc is not None:  # column-tiled 2-D grid: per-tile column origin
        origin_c = origin_c + pl.program_id(1) * tc
    gcol = origin_c + _col_iota(c)
    u, v = u_ref[:], v_ref[:]
    if store_dtype != jnp.float32:
        u, v = u.astype(jnp.float32), v.astype(jnp.float32)
    # NOTE: an interior-tile fast path via lax.cond (skipping the boundary
    # fix-ups for tiles strictly inside the domain) was measured SLOWER on
    # v5e (33 vs 40 Gcell/s at 4096^2): both branches inflate VMEM pressure
    # and break the Mosaic pipeline. The uniform masked path wins.
    ctx = precompute(giota, r_total, gcol, c_total)
    if sanitize and ctx["dommask"] is not None:
        # out-of-domain window cells may hold garbage in HBM (the caller
        # skipped the padding re-zero): mask them on load — the same
        # select the per-step loop applies, paid once per K-step window
        # instead of 4 host-graph row updates per call (bit-identical:
        # those cells were exactly 0.0 before)
        u = jnp.where(ctx["dommask"], u, 0.0)
        v = jnp.where(ctx["dommask"], v, 0.0)
    fix = None
    if fix_refs is not None:
        # the window holding global row 0 starts exactly at g0 == -halo
        # (true for the single-chip origin and the sharded top shard)
        fix = (*fix_refs, g0 == -halo)
    for _ in range(steps):
        u, v = step(u, v, ctx, fix)
    if store_dtype != jnp.float32:
        u, v = u.astype(store_dtype), v.astype(store_dtype)
    if tc is None:
        uo_ref[:] = u[halo : halo + tr, :]
        vo_ref[:] = v[halo : halo + tr, :]
    else:
        uo_ref[:] = u[halo : halo + tr, chalo : chalo + tc]
        vo_ref[:] = v[halo : halo + tr, chalo : chalo + tc]


def _plan_alpha(params: Parameters) -> np.float32:
    """The separable plan's center-correction scalar (0 for the direct
    full-tap plan, whose corrected weights already absorb the center)."""
    plan = params.separable_plan()
    return Precision(plan[2] if plan[0] == "separable" else 0.0)


def _zero_fold_coeffs(du, dv, f, mfk, dt, alpha):
    """(Cu, Cv, E, Au, Bv) for the zero-path linear fold (see ``step``):

        u' = ((Cu*s_u - dt*uv2) + E) + Au*u
        v' = ( (Cv*s_v + dt*uv2)     + Bv*v)

    with ``s`` the raw separable convolution (no ``- alpha*x``). This is
    the algebraic expansion of ``u + dt*(Du*(s - alpha*u) - uv2 +
    f*(1-u))`` with every u-linear term collected into one coefficient —
    6 fewer full-array ops per step plus the 2x ``- alpha*x`` subtraction.
    HOST-side f32 arithmetic in a FIXED op order, so the static and
    runtime-parameter modes stay bit-identical to each other (the zero
    path was never bitwise against the naive oracle: the separable
    reassociation already set that boundary, see separable_plan)."""
    one = Precision(1.0)
    du, dv = Precision(du), Precision(dv)
    f, mfk, dt = Precision(f), Precision(mfk), Precision(dt)
    alpha = Precision(alpha)
    cu = dt * du
    cv = dt * dv
    e = dt * f
    au = (one - e) - cu * alpha
    bv = (one + dt * mfk) - cv * alpha
    return cu, cv, e, au, bv


def reaction_operand(params: Parameters) -> np.ndarray:
    """(1, 10) f32 runtime-parameter operand for the kernel's SMEM input:
    ``[du_rate, dv_rate, feed, min_feed_kill, dt, Cu, Cv, E, Au, Bv]``
    (the last five are the zero-path fold coefficients, ignored by the
    naive path), rounded to f32 the same way the static trace-time
    constants are (bit-parity between the two modes)."""
    du = Precision(params.diffusion_rate_u)
    dv = Precision(params.diffusion_rate_v)
    f = Precision(params.feed_rate)
    mfk = params.min_feed_kill()
    dt = Precision(params.time_step)
    fold = _zero_fold_coeffs(du, dv, f, mfk, dt, _plan_alpha(params))
    return np.asarray([[du, dv, f, mfk, dt, *fold]], dtype=Precision)


#: scalar count of the runtime-parameter SMEM operand
REACTION_LEN = 10


def reaction_mode(params: Parameters, runtime_params: bool):
    """(kernel_params, reaction operand, dt_is_one) for a backend's mode —
    the one place the runtime-parameter contract lives (pallas + sharded
    backends share it): in runtime mode the executable is keyed on the
    weight structure only, the scalars ride the SMEM operand, and the
    kernel specializes on the single ``dt == 1.0`` predicate."""
    if runtime_params:
        reaction = reaction_operand(params)
        return (params.structure_only(), reaction,
                bool(reaction[0, 4] == np.float32(1.0)))
    return params, None, False


def multistep_impl(
    u_pad, v_pad, origin, r_total,
    origin_c=0, c_total=None, reaction=None,
    *, steps: int, tr: int, params: Parameters, boundary: str,
    halo: int = HALO, chalo: int = 0, interpret: bool = False,
    vmem_limit_bytes: int | None = None, zero_padding: bool = True,
    tc: int | None = None, dt_is_one: bool = False,
    fold: Tuple[int, int, int] | None = None, sanitize: bool = False,
    strip_store: bool = False, fast_fold: bool = False,
    slice_taps: bool = False,
):
    """Advance padded state by ``steps`` (<= halo) simulation steps.

    ``u_pad``/``v_pad``: (halo + Rp + halo, C) current state with zero (or
    halo-exchanged) padding rows. The kernel writes fresh output buffers
    whose padding is then re-zeroed with two cheap row updates (skippable
    via ``zero_padding=False`` when a halo exchange will overwrite it
    anyway). NOTE: aliasing the outputs onto a stale double buffer to
    preserve the padding — the original design — serialized Mosaic's DMA
    pipeline against compute and cost ~20% of peak; fresh outputs let the
    window fetches overlap the VMEM step loop.
    ``origin``: global row index of padded row 0 (-halo single-chip).
    ``halo`` must be a multiple of 8 (element-indexing alignment); deeper
    halos permit deeper temporal blocking (steps <= halo) at the price of
    more redundant window compute. Returns the new (u_pad, v_pad).

    ``tc``: optional column tile width — tiles the grid along columns too
    (2-D Pallas grid), for domains so wide that a full-width
    ``(tr + 2*halo, C)`` window pair exceeds VMEM at a useful ``tr``. Each
    tile reads a ``(tr + 2*halo, tc + 2*chalo)`` window; the column halo
    (``chalo >= steps``, a multiple of 128 for lane-dim element alignment
    on hardware) absorbs lateral invalidation exactly as the row halo does
    vertical. Requires column-padded state (``pad_state(..., chalo=...)``).
    Not jitted: call through :func:`multistep` / :func:`run_blocks` (one
    device dispatch each — the tunneled TPU has ~100 ms per-dispatch
    latency, so the driver loop lives on device, mirroring the reference's
    single-command-buffer pattern).
    """
    if halo % 8 != 0 or halo < 8:
        raise ValueError(f"halo must be a positive multiple of 8, got {halo}")
    if not (1 <= steps <= halo):
        raise ValueError(f"steps must be in [1, {halo}], got {steps}")
    rp_full, c = u_pad.shape
    rp = rp_full - 2 * halo
    if rp % tr != 0 or tr % 8 != 0:
        raise ValueError(f"interior rows {rp} must be a multiple of tr={tr} (tr % 8 == 0)")
    if chalo and chalo < steps:
        # per-step lateral invalidation moves 1 column/step: a column
        # halo shallower than the temporal depth is outrun and the seam
        # columns silently absorb wrap garbage. Validate on the UNTILED
        # path too (the 2-D sharded backend's chalo>0/tc=None layout) —
        # previously only the tc branch checked this, leaving the gap to
        # caller convention.
        raise ValueError(
            f"temporal depth {steps} exceeds the {chalo}-column halo"
        )
    if fold is not None:
        fold_f, fold_cd, fold_rp = fold
        if tc is not None or chalo != 0:
            raise ValueError("fold excludes column tiling/halos")
        if fold_f * fold_cd != c or fold_rp != rp:
            raise ValueError(
                f"fold {fold} inconsistent with padded state "
                f"({rp_full}, {c})"
            )
        if fold_f > 1 and fold_rp < halo:
            # fold_refresh copies each panel's LAST `halo` interior rows
            # to the neighbor's halo; a panel shorter than the halo would
            # silently source padding rows instead of neighbor data
            raise ValueError(
                f"fold needs panel stride >= halo, got Rp={fold_rp} < "
                f"{halo} (domain too short for this fold factor)"
            )
    if strip_store and (
        boundary != "naive" or tc is not None or chalo != 0
        or fold is not None or fast_fold
    ):
        # fast_fold included: its step path returns before the fix refs,
        # so strip_store would be silently dropped while its two (W, C)
        # scratch windows still shrink the VMEM budget — megastep
        # rejects the same combination
        raise ValueError(
            "strip_store is naive-only with full-width windows "
            "(no column tiling/halos, no fold, no fast_fold)"
        )
    if c_total is None:
        c_total = c  # single-chip, no column halos
    w_rows = tr + 2 * halo
    scalars = jnp.concatenate(
        [jnp.asarray(x, jnp.int32).reshape(1, 1)
         for x in (origin, r_total, origin_c, c_total)], axis=1
    )
    if tc is None:
        grid = (rp // tr,)
        w_cols = c
        in_map = lambda i: (pl.multiple_of(i * tr, 8), 0)  # noqa: E731
        out_map = lambda i: (pl.multiple_of(halo + i * tr, 8), 0)  # noqa: E731
        out_block = (pl.Element(tr), pl.Element(c))
        semantics = ("parallel",)
    else:
        cw = c - 2 * chalo
        if chalo < steps:
            raise ValueError(
                f"column tiling needs chalo >= steps, got {chalo} < {steps}"
            )
        if tc % 128 != 0 or chalo % 128 != 0:
            # the column in_map/out_map claim 128-lane alignment
            # (pl.multiple_of below); an unaligned tile would make that a
            # false promise to Mosaic on hardware
            raise ValueError(
                f"tc and chalo must be multiples of 128, got {tc}/{chalo}"
            )
        if cw % tc != 0:
            raise ValueError(
                f"interior cols {cw} must be a multiple of tc={tc}"
            )
        grid = (rp // tr, cw // tc)
        w_cols = tc + 2 * chalo
        in_map = lambda i, j: (  # noqa: E731
            pl.multiple_of(i * tr, 8), pl.multiple_of(j * tc, 128),
        )
        out_map = lambda i, j: (  # noqa: E731
            pl.multiple_of(halo + i * tr, 8),
            pl.multiple_of(chalo + j * tc, 128),
        )
        out_block = (pl.Element(tr), pl.Element(tc))
        semantics = ("parallel", "parallel")
    in_block = (pl.Element(w_rows), pl.Element(w_cols))
    kernel = functools.partial(
        _kernel, steps=steps, tr=tr, c=w_cols, halo=halo, chalo=chalo,
        params=params, boundary=boundary, tc=tc,
        runtime_params=reaction is not None, dt_is_one=dt_is_one,
        fold=fold, sanitize=sanitize, strip_store=strip_store,
        fast_fold=fast_fold, slice_taps=slice_taps,
    )
    zero_map = (lambda i: (0, 0)) if tc is None else (lambda i, j: (0, 0))
    in_specs = [pl.BlockSpec((1, 4), zero_map, memory_space=pltpu.SMEM)]
    operands = [scalars]
    if reaction is not None:
        in_specs.append(
            pl.BlockSpec((1, REACTION_LEN), zero_map,
                         memory_space=pltpu.SMEM)
        )
        operands.append(jnp.asarray(reaction, jnp.float32).reshape(1, REACTION_LEN))
    in_specs += [
        pl.BlockSpec(in_block, in_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(in_block, in_map, memory_space=pltpu.VMEM),
    ]
    operands += [u_pad, v_pad]
    scratch = []
    if strip_store:
        scratch = [pltpu.VMEM((w_rows, w_cols), jnp.float32),
                   pltpu.VMEM((w_rows, w_cols), jnp.float32)]
    out_u, out_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(out_block, out_map, memory_space=pltpu.VMEM),
            pl.BlockSpec(out_block, out_map, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(u_pad.shape, u_pad.dtype),
            jax.ShapeDtypeStruct(v_pad.shape, v_pad.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # tiles are independent (outputs disjoint, inputs read-only)
            dimension_semantics=semantics,
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(*operands)
    if zero_padding and not sanitize:
        zrow = jnp.zeros((halo, c), dtype=u_pad.dtype)
        out_u = out_u.at[:halo].set(zrow).at[rp_full - halo:].set(zrow)
        out_v = out_v.at[:halo].set(zrow).at[rp_full - halo:].set(zrow)
        if chalo:
            zcol = jnp.zeros((rp_full, chalo), dtype=u_pad.dtype)
            out_u = out_u.at[:, :chalo].set(zcol).at[:, c - chalo:].set(zcol)
            out_v = out_v.at[:, :chalo].set(zcol).at[:, c - chalo:].set(zcol)
    return out_u, out_v


_STATIC = ("steps", "tr", "params", "boundary", "halo", "chalo",
           "interpret", "vmem_limit_bytes", "zero_padding", "tc",
           "dt_is_one", "fold", "sanitize", "strip_store", "fast_fold",
           "slice_taps")

multistep = jax.jit(
    multistep_impl,
    static_argnames=_STATIC,
    donate_argnames=("u_pad", "v_pad"),
)


@functools.partial(
    jax.jit,
    static_argnames=_STATIC,
    donate_argnames=("u_pad", "v_pad"),
)
def run_blocks(
    u_pad, v_pad, origin, r_total, n_blocks,
    origin_c=0, c_total=None, reaction=None,
    *, steps: int, tr: int, params: Parameters, boundary: str,
    halo: int = HALO, chalo: int = 0, interpret: bool = False,
    vmem_limit_bytes: int | None = None, zero_padding: bool = True,
    tc: int | None = None, dt_is_one: bool = False,
    fold: Tuple[int, int, int] | None = None, sanitize: bool = False,
    strip_store: bool = False, fast_fold: bool = False,
    slice_taps: bool = False,
):
    """Run ``n_blocks`` successive K-step kernel calls in ONE executable.

    ``n_blocks`` is a traced operand (changing it does not recompile; nor
    does ``reaction`` in runtime-parameter mode). The double-buffer flip
    is the loop carry (XLA reuses the donated HBM buffers in place). This
    is the analog of the reference recording every step into one command
    buffer and submitting once (compute/gpu/naive/src/lib.rs:117-128).

    In the lane-fold layout (``fold``), each iteration starts with the
    inter-panel halo refresh — a few XLA row copies, fused into the same
    device dispatch — and the kernel's padding-row re-zeroing is skipped
    (the next refresh overwrites every padding row).
    """

    def body(_, carry):
        u, v = carry
        if fold is not None:
            u = fold_refresh(u, halo, *fold)
            v = fold_refresh(v, halo, *fold)
        return multistep_impl(
            u, v, origin, r_total, origin_c, c_total, reaction,
            steps=steps, tr=tr, params=params, boundary=boundary,
            halo=halo, chalo=chalo, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes,
            zero_padding=zero_padding and fold is None,
            tc=tc, dt_is_one=dt_is_one, fold=fold, sanitize=sanitize,
            strip_store=strip_store, fast_fold=fast_fold,
            slice_taps=slice_taps,
        )

    return jax.lax.fori_loop(0, n_blocks, body, (u_pad, v_pad))


def _resident_kernel(scal_ref, *refs, rp: int, cp: int, r: int, c: int,
                     params, boundary: str, runtime_params: bool,
                     dt_is_one: bool, unroll: int = 1,
                     slice_taps: bool = False):
    if runtime_params:
        react_ref, u_ref, v_ref, uo_ref, vo_ref = refs
        reaction = unpack_reaction(react_ref, dt_is_one)
    else:
        u_ref, v_ref, uo_ref, vo_ref = refs
        reaction = None
    precompute, step = make_window_stepper(
        params, boundary, cp, halo=0, chalo=0, dtype=jnp.float32,
        reaction=reaction, zero_fill_rows=True,
        mask_rows=(rp != r), mask_cols=(cp != c),
        slice_taps=slice_taps,
    )
    giota = jax.lax.broadcasted_iota(jnp.int32, (rp, 1), 0)
    gcol = _col_iota(cp)
    ctx = precompute(giota, r, gcol, c)
    n_steps = scal_ref[0, 0]

    def body(_, uv):
        return step(uv[0], uv[1], ctx)

    if unroll <= 1:
        u, v = jax.lax.fori_loop(0, n_steps, body, (u_ref[:], v_ref[:]))
    else:
        # Amortize the fori back-edge over `unroll` steps. Step counts
        # stay traced: ``n // unroll`` unrolled iterations plus a
        # single-step tail loop for the remainder — any snapshot cadence
        # reuses one executable. Bit-guarantee scope: like the windowed
        # path's remainder kernel (a different unroll graph per
        # remainder), regrouping a step total across calls may change
        # FMA contraction by an ulp; a FIXED cadence always replays the
        # same executable, so straight and checkpoint-resumed CLI runs
        # (32 steps/image in both) stay bitwise identical. (An
        # optimization_barrier between steps was tried and does not
        # restore grouping invariance — the tail loop's context alone
        # changes contraction — so it only cost the cross-step
        # scheduling.)
        def body_k(_, uv):
            for _ in range(unroll):
                uv = step(uv[0], uv[1], ctx)
            return uv

        u, v = jax.lax.fori_loop(
            0, n_steps // unroll, body_k, (u_ref[:], v_ref[:])
        )
        u, v = jax.lax.fori_loop(0, n_steps % unroll, body, (u, v))
    uo_ref[:] = u
    vo_ref[:] = v


#: Resident auto-selection envelope. The in-kernel step loop's Mosaic
#: stack liveness runs ~13-15x one padded species array against the
#: 120 MB scoped-VMEM ceiling, and the multiplier is GEOMETRY-dependent
#: (raising vmem_limit_bytes toward the 128 MB physical cap does not
#: rescue the failures below), so the envelope is empirical. Hardware-
#: validated fits: 1088x1920 (8.36 MB/array), 1600x1024 (6.55 MB),
#: 808x1920 (6.2 MB), 400x3840 (5.9 MB). Hardware failures at equal or
#: near-equal bytes: 544x3840 (8.36 MB), 2160x1024 (8.85 MB). General
#: cap 6.5 MB; the reference-default 1080x1920 family (rp<=1088,
#: cp<=2048) is validated to 9 MB. Auto-selection past the envelope
#: falls back to the windowed/mega engines instead of a hard compile
#: error; ``resident="on"`` still forces the attempt.
RESIDENT_SAFE_BYTES = int(6.5 * (1 << 20))
RESIDENT_MAX_BYTES = 9 << 20


def resident_ok(shape, dtype_bytes: int = 4) -> bool:
    # the envelope is liveness-vs-VMEM empirical on v5e's 128 MiB part;
    # on a smaller-VMEM generation the same liveness multiplier applies
    # against a proportionally smaller ceiling (utils.device)
    scale = device.vmem_scale()
    r, c = shape
    rp = -(-r // 8) * 8
    cp = -(-c // 128) * 128
    nbytes = rp * cp * dtype_bytes
    if rp <= 1088 and cp <= 2048 and scale >= 1.0:
        return nbytes <= RESIDENT_MAX_BYTES
    return nbytes <= RESIDENT_SAFE_BYTES * min(scale, 1.0)


def resident_unroll(rp: int, cp: int, boundary: str = "zero") -> int:
    """In-kernel step unroll for the resident kernel: as deep as the
    Mosaic compile ceiling allows (the unrolled graph is domain cells x
    unroll), capped at 8 — past that the back-edge is already amortized."""
    limit = COMPILE_CEILING_CELL_STEPS / (
        NAIVE_COMPILE_DERATE if boundary == "naive" else 1.0
    )
    return max(1, min(8, int(limit // (rp * cp))))


def resident_multistep_impl(
    u_res, v_res, n_steps, reaction=None,
    *, r: int, c: int, params: Parameters, boundary: str,
    interpret: bool = False, vmem_limit_bytes: int | None = None,
    dt_is_one: bool = False, unroll: int = 1, slice_taps: bool = False,
):
    """Advance a VMEM-RESIDENT domain by ``n_steps`` (traced!) steps.

    The small-domain fast path (the reference-default 1080x1920 is
    8.3 MB/species): the whole padded (Rp, Cp) state loads into VMEM
    once, a ``lax.fori_loop`` inside the kernel runs ALL requested steps
    — no halo windows, no redundant overlap compute, no per-K-block
    fixed cost, one kernel launch per ``prepare_steps`` — and the result
    stores once. Row shifts zero-fill like column shifts (no halo ring
    exists), and exact-fit domains skip the domain mask entirely, so the
    per-step op count is the windowed kernel's minus its masking. The
    step count rides SMEM: snapshot cadences and step totals never
    recompile. This is the regime the reference's `block` backend
    reaches when the grid fits L2 (compute/block/src/lib.rs:30-111) —
    on TPU the "cache" is 128 MB of software-managed VMEM, so the
    entire flagship workload fits.
    """
    rp, cp = u_res.shape
    scalars = jnp.asarray(n_steps, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _resident_kernel, rp=rp, cp=cp, r=r, c=c, params=params,
        boundary=boundary, runtime_params=reaction is not None,
        dt_is_one=dt_is_one, unroll=unroll, slice_taps=slice_taps,
    )
    zero_map = lambda: (0, 0)  # noqa: E731
    in_specs = [pl.BlockSpec((1, 1), zero_map, memory_space=pltpu.SMEM)]
    operands = [scalars]
    if reaction is not None:
        in_specs.append(
            pl.BlockSpec((1, REACTION_LEN), zero_map,
                         memory_space=pltpu.SMEM)
        )
        operands.append(jnp.asarray(reaction, jnp.float32).reshape(1, REACTION_LEN))
    full = pl.BlockSpec((rp, cp), zero_map, memory_space=pltpu.VMEM)
    in_specs += [full, full]
    operands += [u_res, v_res]
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[full, full],
        out_shape=[
            jax.ShapeDtypeStruct(u_res.shape, u_res.dtype),
            jax.ShapeDtypeStruct(v_res.shape, v_res.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes or device.vmem_tier_cap(),
        ),
        interpret=interpret,
    )(*operands)


_RESIDENT_STATIC = ("r", "c", "params", "boundary", "interpret",
                    "vmem_limit_bytes", "dt_is_one", "unroll",
                    "slice_taps")

resident_multistep = jax.jit(
    resident_multistep_impl,
    static_argnames=_RESIDENT_STATIC,
    donate_argnames=("u_res", "v_res"),
)


def pad_state(
    u: np.ndarray, v: np.ndarray, tr: int, halo: int = HALO, chalo: int = 0,
    tc: int | None = None, dtype=Precision,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack (R, C) concentrations into the padded kernel layout.

    Rows are rounded up to a multiple of ``tr``; with column tiling
    (``tc``), interior columns are rounded up to a multiple of ``tc`` (the
    extra columns are out-of-domain and stay zero under the kernel's
    domain mask). ``dtype`` selects the compute precision (the opt-in
    bfloat16 fast mode stores and steps in bf16)."""
    r, c = u.shape
    rp = -(-r // tr) * tr
    cp = c if tc is None else -(-c // tc) * tc
    out = []
    for x in (u, v):
        buf = np.zeros((halo + rp + halo, chalo + cp + chalo), dtype=dtype)
        buf[halo : halo + r, chalo : chalo + c] = x.astype(dtype)
        out.append(buf)
    return out[0], out[1]


# -- lane-fold layout ---------------------------------------------------------
#
# Narrow domains underuse the VPU: at equal window size, per-op throughput
# on 1920-wide windows measured ~58% of 4096-wide (see BENCHMARKS.md width
# probe). The fold layout places F row-panels of the (R, Cd) domain side by
# side along lanes — state (halo + Rp + halo, F*Cd) — so every kernel op
# runs at the wide-array rate. Panel seams are true domain column edges
# (each panel spans the full column range); the shared top/bottom padding
# rows double as inter-panel halos, refreshed every K-step block from the
# neighboring panel's edge rows (fold_refresh): the sharded backend's halo
# exchange (parallel/halo.py), but via plain XLA row copies across lane
# space within one chip. Zero-boundary only; cost = 2*halo/Rp redundant
# rows plus a few row copies per K steps.


def fold_geometry(r: int, f: int, tr: int) -> int:
    """Panel row stride Rp: ceil(R/F) rounded up so the folded interior
    (= Rp) is a multiple of the row tile. Panels partition [0, R) by
    stride; rows past R (last panel only) are out-of-domain, kept zero by
    the kernel's fold mask."""
    rp0 = -(-r // f)
    return -(-rp0 // tr) * tr


def fold_state(
    u: np.ndarray, v: np.ndarray, f: int, tr: int, halo: int = HALO,
    dtype=Precision,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack (R, C) concentrations into the lane-fold layout
    ``(halo + Rp + halo, F*C)``. Halo rows start zero — the first
    :func:`fold_refresh` (every run_blocks iteration starts with one)
    fills them before the kernel reads them."""
    r, c = u.shape
    rp = fold_geometry(r, f, tr)
    out = []
    for x in (u, v):
        flat = np.zeros((f * rp, c), dtype=dtype)
        flat[:r] = x.astype(dtype)
        panels = flat.reshape(f, rp, c).transpose(1, 0, 2).reshape(rp, f * c)
        buf = np.zeros((halo + rp + halo, f * c), dtype=dtype)
        buf[halo : halo + rp] = panels
        out.append(buf)
    return out[0], out[1]


def unfold_state(x_pad, halo: int, f: int, cd: int, r: int):
    """Recover the (R, Cd) domain from lane-fold state (device or host)."""
    rp = x_pad.shape[0] - 2 * halo
    interior = x_pad[halo : halo + rp]
    flat = interior.reshape(rp, f, cd).transpose(1, 0, 2).reshape(f * rp, cd)
    return flat[:r]


def fold_refresh(x, halo: int, f: int, cd: int, rp: int):
    """Refresh inter-panel halo rows of lane-fold state.

    Panel p's top ``halo`` padding rows get panel p-1's last ``halo``
    interior rows (global rows [p*Rp - halo, p*Rp)); its bottom padding
    rows get panel p+1's first ``halo`` interior rows. The outermost
    panels' outward halos are true domain boundary: zero. A (wr, F*Cd)
    <-> (wr, F, Cd) reshape is layout-free (lanes stay minor-most), so
    this is a handful of row copies fused into the surrounding dispatch.
    """
    wr = x.shape[0]
    x3 = x.reshape(wr, f, cd)
    zeros = jnp.zeros((halo, 1, cd), dtype=x.dtype)
    # last `halo` interior rows sit at [rp, rp + halo) (interior spans
    # [halo, halo + rp)); first `halo` interior rows at [halo, 2*halo)
    top = jnp.concatenate([zeros, x3[rp : rp + halo, : f - 1]], axis=1)
    bottom = jnp.concatenate([x3[halo : 2 * halo, 1:], zeros], axis=1)
    x3 = jnp.concatenate([top, x3[halo : halo + rp], bottom], axis=0)
    return x3.reshape(wr, f * cd)


#: Lane width below which folding pays (the width probe's crossover:
#: 4096-wide windows hit full VPU rate; 1920-wide ~58% of it).
FOLD_TARGET_LANES = 3840


def choose_fold(r: int, c: int, halo: int = 16) -> int:
    """Fold factor F (1 = don't fold) for a (r, c) zero-boundary domain:
    widen narrow domains toward :data:`FOLD_TARGET_LANES` lanes while
    keeping the 2*halo/Rp redundant-row overhead under ~15% and at least
    two row tiles of interior per panel."""
    if c >= FOLD_TARGET_LANES:
        return 1
    f = min(-(-FOLD_TARGET_LANES // c), 8)
    while f > 1 and (r // f) < max(14 * halo, 2 * 8):
        f -= 1
    return f


# -- species-packed layout ----------------------------------------------------
#
# x = [U | V] along lanes: ONE array holds both species, so the separable
# diffusion runs once per step instead of once per species — the packed
# zero-boundary step costs ~25 full-array ops on the double-wide array
# vs 38 on two single-wide ones (static Mosaic attribution) — and at
# narrow domains the doubled width additionally lifts per-op VPU
# throughput (the width probe: 1920-wide windows run at ~58% of the
# 4096-wide rate). See make_window_stepper's ``pack`` docstring for the
# seam and reaction math. Zero boundary + separable plans only; the
# bit-frozen naive path stays on the unpacked kernels.


def pack_state(
    u: np.ndarray, v: np.ndarray, tr: int, halo: int = HALO,
    cquant: int = 1, dtype=Precision,
) -> np.ndarray:
    """Pack (R, C) concentrations into the species-packed layout
    ``(halo + Rp + halo, 2*Cp)`` with U in lanes ``[0, Cp)`` and V in
    ``[Cp, 2*Cp)``. ``cquant`` rounds each panel's width (128 for the
    resident kernel's lane alignment); panel padding columns stay zero
    under the kernel's domain mask."""
    r, c = u.shape
    rp = -(-r // tr) * tr
    cp = -(-c // cquant) * cquant
    buf = np.zeros((halo + rp + halo, 2 * cp), dtype=dtype)
    buf[halo : halo + r, :c] = u.astype(dtype)
    buf[halo : halo + r, cp : cp + c] = v.astype(dtype)
    return buf


def unpack_state(x_pad, halo: int, r: int, c: int):
    """Recover (U, V) domain views from species-packed state."""
    cd = x_pad.shape[1] // 2
    return (x_pad[halo : halo + r, :c],
            x_pad[halo : halo + r, cd : cd + c])


def _packed_kernel(*refs, steps: int, tr: int, c: int, halo: int, r: int,
                   c_dom: int, params, runtime_params: bool,
                   dt_is_one: bool, sanitize: bool):
    if runtime_params:
        react_ref, x_ref, xo_ref = refs
        reaction = unpack_reaction(react_ref, dt_is_one)
    else:
        x_ref, xo_ref = refs
        reaction = None
    w_rows = tr + 2 * halo
    precompute, step = make_window_stepper(
        params, "zero", c, halo, 0, dtype=jnp.float32,
        reaction=reaction, pack=True, mask_cols=(c // 2 != c_dom),
    )
    g0 = pl.program_id(0) * tr - halo
    giota = g0 + jax.lax.broadcasted_iota(jnp.int32, (w_rows, 1), 0)
    gcol = _col_iota(c)
    x = x_ref[:]
    ctx = precompute(giota, r, gcol, c_dom)
    if sanitize and ctx["dommask"] is not None:
        x = jnp.where(ctx["dommask"], x, 0.0)
    for _ in range(steps):
        x = step(x, ctx)
    xo_ref[:] = x[halo : halo + tr, :]


def packed_multistep_impl(
    x_pad, reaction=None,
    *, steps: int, tr: int, r: int, c: int, params: Parameters,
    halo: int = HALO, interpret: bool = False,
    vmem_limit_bytes: int | None = None, dt_is_one: bool = False,
    sanitize: bool = True,
):
    """Advance species-packed state by ``steps`` (<= halo) simulation
    steps — the packed analog of :func:`multistep_impl` (1-D row grid,
    single-chip: origin/extents are static, and out-of-domain window
    cells are sanitized on load so HBM padding is never re-zeroed)."""
    if halo % 8 != 0 or halo < 8:
        raise ValueError(f"halo must be a positive multiple of 8, got {halo}")
    if not (1 <= steps <= halo):
        raise ValueError(f"steps must be in [1, {halo}], got {steps}")
    rp_full, cc = x_pad.shape
    rp = rp_full - 2 * halo
    if rp % tr != 0 or tr % 8 != 0:
        raise ValueError(
            f"interior rows {rp} must be a multiple of tr={tr} (tr % 8 == 0)"
        )
    w_rows = tr + 2 * halo
    in_map = lambda i: (pl.multiple_of(i * tr, 8), 0)  # noqa: E731
    out_map = lambda i: (pl.multiple_of(halo + i * tr, 8), 0)  # noqa: E731
    zero_map = lambda i: (0, 0)  # noqa: E731
    kernel = functools.partial(
        _packed_kernel, steps=steps, tr=tr, c=cc, halo=halo, r=r, c_dom=c,
        params=params, runtime_params=reaction is not None,
        dt_is_one=dt_is_one, sanitize=sanitize,
    )
    in_specs, operands = [], []
    if reaction is not None:
        in_specs.append(
            pl.BlockSpec((1, REACTION_LEN), zero_map,
                         memory_space=pltpu.SMEM)
        )
        operands.append(
            jnp.asarray(reaction, jnp.float32).reshape(1, REACTION_LEN)
        )
    in_specs.append(
        pl.BlockSpec((pl.Element(w_rows), pl.Element(cc)), in_map,
                     memory_space=pltpu.VMEM)
    )
    operands.append(x_pad)
    return pl.pallas_call(
        kernel,
        grid=(rp // tr,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((pl.Element(tr), pl.Element(cc)), out_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x_pad.shape, x_pad.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(*operands)


_PACKED_STATIC = ("steps", "tr", "r", "c", "params", "halo", "interpret",
                  "vmem_limit_bytes", "dt_is_one", "sanitize")

packed_multistep = jax.jit(
    packed_multistep_impl,
    static_argnames=_PACKED_STATIC,
    donate_argnames=("x_pad",),
)


@functools.partial(
    jax.jit,
    static_argnames=_PACKED_STATIC,
    donate_argnames=("x_pad",),
)
def packed_run_blocks(
    x_pad, n_blocks, reaction=None,
    *, steps: int, tr: int, r: int, c: int, params: Parameters,
    halo: int = HALO, interpret: bool = False,
    vmem_limit_bytes: int | None = None, dt_is_one: bool = False,
    sanitize: bool = True,
):
    """``n_blocks`` (traced) successive K-step packed kernel calls in one
    executable — the packed analog of :func:`run_blocks`."""

    def body(_, x):
        return packed_multistep_impl(
            x, reaction, steps=steps, tr=tr, r=r, c=c, params=params,
            halo=halo, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes, dt_is_one=dt_is_one,
            sanitize=sanitize,
        )

    return jax.lax.fori_loop(0, n_blocks, body, x_pad)


def _packed_resident_kernel(scal_ref, *refs, rp: int, cp: int, r: int,
                            c: int, params, runtime_params: bool,
                            dt_is_one: bool, unroll: int = 1):
    if runtime_params:
        react_ref, x_ref, xo_ref = refs
        reaction = unpack_reaction(react_ref, dt_is_one)
    else:
        x_ref, xo_ref = refs
        reaction = None
    precompute, step = make_window_stepper(
        params, "zero", cp, halo=0, chalo=0, dtype=jnp.float32,
        reaction=reaction, zero_fill_rows=True, pack=True,
        mask_rows=(rp != r), mask_cols=(cp // 2 != c),
    )
    giota = jax.lax.broadcasted_iota(jnp.int32, (rp, 1), 0)
    gcol = _col_iota(cp)
    ctx = precompute(giota, r, gcol, c)
    n_steps = scal_ref[0, 0]

    def body(_, x):
        return step(x, ctx)

    if unroll <= 1:
        x = jax.lax.fori_loop(0, n_steps, body, x_ref[:])
    else:
        def body_k(_, x):
            for _ in range(unroll):
                x = step(x, ctx)
            return x

        x = jax.lax.fori_loop(0, n_steps // unroll, body_k, x_ref[:])
        x = jax.lax.fori_loop(0, n_steps % unroll, body, x)
    xo_ref[:] = x


def packed_resident_multistep_impl(
    x_res, n_steps, reaction=None,
    *, r: int, c: int, params: Parameters,
    interpret: bool = False, vmem_limit_bytes: int | None = None,
    dt_is_one: bool = False, unroll: int = 1,
):
    """Advance a VMEM-resident species-packed domain by ``n_steps``
    (traced) steps — the packed analog of
    :func:`resident_multistep_impl` (one array of width ``2*Cp``)."""
    rp, cp = x_res.shape
    scalars = jnp.asarray(n_steps, jnp.int32).reshape(1, 1)
    kernel = functools.partial(
        _packed_resident_kernel, rp=rp, cp=cp, r=r, c=c, params=params,
        runtime_params=reaction is not None, dt_is_one=dt_is_one,
        unroll=unroll,
    )
    zero_map = lambda: (0, 0)  # noqa: E731
    in_specs = [pl.BlockSpec((1, 1), zero_map, memory_space=pltpu.SMEM)]
    operands = [scalars]
    if reaction is not None:
        in_specs.append(
            pl.BlockSpec((1, REACTION_LEN), zero_map,
                         memory_space=pltpu.SMEM)
        )
        operands.append(
            jnp.asarray(reaction, jnp.float32).reshape(1, REACTION_LEN)
        )
    full = pl.BlockSpec((rp, cp), zero_map, memory_space=pltpu.VMEM)
    in_specs.append(full)
    operands.append(x_res)
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(x_res.shape, x_res.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes or device.vmem_tier_cap(),
        ),
        interpret=interpret,
    )(*operands)


_PACKED_RESIDENT_STATIC = ("r", "c", "params", "interpret",
                           "vmem_limit_bytes", "dt_is_one", "unroll")

packed_resident_multistep = jax.jit(
    packed_resident_multistep_impl,
    static_argnames=_PACKED_RESIDENT_STATIC,
    donate_argnames=("x_res",),
)


#: Mosaic compile-tractability ceiling, measured on the v5e remote
#: compiler. The cost driver is the K-unrolled kernel graph size, i.e.
#: window cells x fused steps: every config at <= ~19.7M cell-steps
#: compiled in 10-20 min ((288,4096)x16, (320,1920)x32, (576,1920)x16,
#: (224,4096)x16-naive), while >= ~23.6M effective never returned within
#: 25 min at ANY scoped-VMEM limit ((416,4096)x16, (288,4096)x16-naive,
#: (608,1920)x32). Derated 1.25x for the naive boundary's extra live
#: strips.
COMPILE_CEILING_CELL_STEPS = 20_000_000


#: Naive-boundary compile-cost derate. Round 1 measured 1.25 on the v2
#: kernel ((288, 4096) x16 naive never compiled within 25 min); on the
#: v3 kernel the same config compiles and runs (56.7 Gcell/s, sweep
#: r2-v3b), so the derate is down to 1.05 — enough margin to keep the
#: exact boundary case honest without re-closing the (256, 16) tile.
NAIVE_COMPILE_DERATE = 1.05


def window_compile_ok(
    tr: int, halo: int, w_cols: int, boundary: str = "zero",
    steps: int | None = None,
) -> bool:
    """Whether a (tr + 2*halo, w_cols) window with ``steps`` fused
    in-VMEM iterations (default: the halo depth, the max) is known
    compile-tractable."""
    cell_steps = (tr + 2 * halo) * w_cols * (steps or halo)
    limit = COMPILE_CEILING_CELL_STEPS / (
        NAIVE_COMPILE_DERATE if boundary == "naive" else 1.0
    )
    return cell_steps <= limit


def choose_block_rows(
    r: int, c: int, vmem_budget_bytes: int | None = None, halo: int = 16,
    boundary: str = "zero", species: int = 2,
) -> int:
    """Default row-tile size: fit one (TR + 2*halo, C) f32 window pair in
    the VMEM budget (the analog of the reference's hwloc cache-budget
    defaults, compute/block/src/default.rs:6-57), clamped to [8, 256] —
    K=16 temporal blocking at tr=256 measured best on v5e at 4096^2
    (zero-border; the naive boundary caps at tr=192 there, see
    ``window_compile_ok``) — and to the domain size. Short domains
    (r <= 1536) allow taller tiles: fewer, fatter tiles measured +14% at
    the reference-default 1080x1920 ((544, 16) = 38.2 vs 33.6 Gcell/s)
    where the fixed per-block cost and halo redundancy dominate.

    Within the VMEM/compile-ceiling cap, tiles are scored by TOTAL window
    rows ``ceil(r/tr) * (tr + 2*halo)`` — the kernel's actual compute
    volume — which folds together halo redundancy AND round-up padding
    waste. The old rule ("largest tr under the ceiling") ignored padding:
    at naive 1080x1920 it picked tr=488, padding 1080 up to 1464 rows so
    ~36% of kernel compute was masked out-of-domain rows (29.4 Gcell/s);
    the score picks the padding-free tr=360 instead (3x392 window rows vs
    3x520)."""
    # 16 MiB window budget as measured on v5e; scaled to the actual
    # generation's VMEM (utils.device, the hwloc-budget analog)
    if vmem_budget_bytes is None:
        vmem_budget_bytes = device.scaled(16 << 20)
    # two species by default; the species-packed layout holds ONE array
    # at the doubled width, so its callers pass species=1 — without it
    # the budget double-counts and halves the packed row tile (extra
    # halo redundancy handicapping every packed measurement)
    bytes_per_row = c * 4 * species
    tr_max = (vmem_budget_bytes // bytes_per_row - 2 * halo) // 8 * 8
    cap = 544 if r <= 1536 else 256
    tr_max = max(8, min(cap, tr_max))
    rp = -(-r // 8) * 8
    tr_max = min(tr_max, rp)
    best, best_score = 8, None
    for tr in range(8, tr_max + 1, 8):
        if not window_compile_ok(tr, halo, c, boundary):
            break  # window size grows monotonically with tr
        score = -(-r // tr) * (tr + 2 * halo)
        # ties favor the taller tile (fewer blocks, same compute volume)
        if best_score is None or score <= best_score:
            best, best_score = tr, score
    if best_score is None and not window_compile_ok(8, halo, c, boundary):
        # even the minimum tile is past the measured Mosaic compile
        # ceiling: returning it anyway sends the remote compile into a
        # tens-of-minutes hang (the guard's whole purpose). Error
        # clearly; wide domains have the column-tiled megakernel.
        raise UnsupportedConfigError(
            f"no {c}-wide full-width window compiles within the Mosaic "
            f"ceiling at halo={halo} ({boundary}); use column tiling "
            "(--pallas-block-cols / the mega engine) or fewer steps "
            "per call"
        )
    return best


#: Column-halo depth used with intra-kernel column tiling: one lane-tile
#: (128) per side — the lane-dim element-indexing alignment quantum, and
#: deep enough for any supported temporal blocking (steps <= 32 << 128).
COL_HALO = 128


def choose_vmem_limit(
    tr: int, halo: int, w_cols: int, dtype_bytes: int = 4,
    boundary: str = "zero", fold: bool = False,
    strip_store: bool = False,
) -> int:
    """Scoped-VMEM limit for Mosaic, scaled with the tile footprint.

    The kernel's stack liveness is ~proportional to the window bytes:
    the v5e compiler reported 67.61 MB scoped for a (288, 4096) f32
    window (tr=256, K=16, zero-border; grew from the earlier 62.7 MB
    when sanitize-on-load masking extended liveness — the stale anchor
    OOMed exactly that config at the 64 MB tier); naive semantics keeps
    ~25% more alive (the (W, C) b_field and edge strips). A 10% headroom
    factor absorbs further drift. Quantized to validated tiers so
    standard configs keep stable compile params (persistent-cache
    keys)."""
    w_rows = tr + 2 * halo
    anchor = (67.61 * (1 << 20)) / (288 * 4096 * 4)
    est = 1.10 * anchor * w_rows * w_cols * dtype_bytes
    if boundary == "naive":
        est *= 1.25
    if fold:
        est *= 1.10  # the (W, F*Cd) panel-row mask stays live in the loop
    if strip_store:
        # two explicit (W, C) f32 fix-up scratch windows (scoped too)
        est += 2 * w_rows * w_cols * 4
    tiers = device.vmem_tiers()
    for tier in tiers:
        if est <= tier:
            return tier
    return tiers[-1]


def choose_block_cols(
    c: int, tr: int = 192, halo: int = 16, chalo: int = COL_HALO,
    vmem_budget_bytes: int | None = None,
) -> int | None:
    """Column tile width, or None when full-width windows are fine.

    Full-width is preferred (no redundant column-halo compute, 1-D grid);
    tiling kicks in only when a (tr + 2*halo, C) f32 window pair would
    exceed the VMEM budget at the target row tile — i.e. very wide domains
    (C > ~16K at tr=192). Tiles are balanced: the minimum tile count whose
    windows fit the budget, each tile rounded to the 128-lane quantum
    (alignment requirement for lane-dim element-indexed windows), so the
    round-up padding stays < 128 columns per tile."""
    if vmem_budget_bytes is None:
        vmem_budget_bytes = device.scaled(24 << 20)
    w_rows = tr + 2 * halo
    if w_rows * c * 4 * 2 <= vmem_budget_bytes:
        return None
    tc_max = (vmem_budget_bytes // (w_rows * 4 * 2) - 2 * chalo) // 128 * 128
    tc_max = max(tc_max, 4 * chalo)  # keep halo overhead <= 50%
    n = -(-c // tc_max)
    return -(-c // (n * 128)) * 128
