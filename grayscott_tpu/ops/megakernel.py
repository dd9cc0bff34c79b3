"""Whole-run Pallas "megakernel": the per-call fixed cost, amortized away.

Motivation (SWEEPS.md ``width``/``kdeep`` rows): across every hardware
shape measured, the windowed kernel's per-``pallas_call`` time fits

    t_call  =  T0 + work / R,     T0 ~ 0.42 ms,  R ~ 81.5 Gcell-steps/s

so a 1024-step run at the reference-default 1080x1920 (64 calls at K=16)
spends ~27 ms of its ~55 ms in fixed per-call cost. This module issues
ONE ``pallas_call`` for the entire run: a traced outer loop over K-step
time blocks, an inner loop over row blocks, and hand-rolled double-
buffered HBM<->VMEM DMA — the manual version of the pipeline Mosaic
builds per call for ``ops.pallas_stencil.multistep``, kept alive across
the whole run. The reference analog is recording every step into one
command buffer and submitting once (compute/gpu/naive/src/lib.rs:117-128)
— taken to its limit: one submission per *run*, not per K steps.

Because the fixed cost no longer scales with the call count, temporal
blocking only has to amortize HBM traffic (not T0), so the halo depth
drops to the 8-row alignment minimum: K=8 with a (TR + 16, C) window
— half the windowed kernel's halo redundancy — and the K-unrolled
kernel graph stays a quarter of the Mosaic compile ceiling.

Layout: state rides HBM as a ``(2, halo + Rp + halo, C)`` pair per
species. Slot 0 is the current state at call entry AND exit; inside the
kernel, time block ``t`` reads slot ``t % 2`` and writes slot
``1 - t % 2`` (a traced leading index — one kernel graph serves both
parities), and a final slot1->slot0 copy runs when the block count is
odd. Padding rows are never re-zeroed in HBM: windows sanitize
out-of-domain cells on load exactly like the windowed kernel's
``sanitize`` mode.

Column tiling (``tc``): on very wide domains the VMEM budget forces
full-width row tiles so thin that their halo redundancy dominates (22%
window overhead at 16384-wide f32). The flat block loop then enumerates
(row block, column block) pairs, windows become ``(tr + 16, tc + 256)``
column slices with a 128-lane halo ring (the windowed kernel's 2-D grid
made manual), and ``choose_mega_geometry`` picks the cheaper of the two
forms by total window cells. The pair layout gains column padding:
``(2, halo + Rp + halo, 128 + Cp + 128)``.

Pipeline: the loop prefetches the next window while computing the
current one (same-``t`` prefetch is always safe: reads and writes go to
different pair slots). Single-chip domains with >= 4 row blocks run one
SEAMLESS flat loop over (time block, row block) whose prefetch crosses
time boundaries — the slot-restage wait at ``g-2`` orders every
cross-boundary read after the previous block's writes, so the DMA
pipeline never drains mid-run. Shorter domains and the sharded
handshake keep the two-loop form, which drains the two outstanding
output DMAs at each time boundary — a small bubble per K steps
instead of T0.

Boundary semantics, runtime reaction parameters, and the K-step in-VMEM
step loop are shared with the windowed kernel
(:func:`ops.pallas_stencil.make_window_stepper`): the megakernel is a
driver around the same per-window stepper, so all parity guarantees
carry over bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..errors import UnsupportedConfigError
from ..params import Parameters, Precision
from ..utils import device
from . import pallas_stencil as ps

#: Halo/temporal depth: the 8-row sublane alignment minimum. With T0
#: amortized, deeper blocking would only add halo redundancy; K=8 keeps
#: HBM traffic at 2 bytes/cell-step (~40 GB/s at peak rate, 5% of HBM).
MEGA_STEPS = 8


def _mega_kernel(
    scal_ref, *refs,
    steps: int, tr: int, b_blocks: int, c: int, halo: int,
    r: int, params, boundary: str,
    runtime_params: bool, dt_is_one: bool, pack: bool = False,
    strip_store: bool = False, n_shards: int = 1,
    tc: int | None = None, chalo: int = 0, c_blocks: int = 1,
    c_dom: int | None = None, n_shard_cols: int = 1,
    depth: int = 2, specialize: bool = False, fast_fold: bool = False,
    slice_taps: bool = False,
):
    """One whole run: scal = [n_time_blocks] (+ [my_shard] when
    sharded); refs = optional reaction SMEM, then (u_pair, v_pair) HBM
    inputs, (u_out, v_out) aliased outputs, then scratch (in/out window
    slots + DMA semaphores). In species-packed mode (``pack``) a single
    x = [U | V] pair replaces the two species pairs — half the DMA
    count at twice the width. ``strip_store`` (naive only) appends two
    fix-up scratch windows, see pallas_stencil._fix_naive_store.

    ``n_shards > 1``: the multi-chip megakernel — this kernel instance
    owns a row slab of the global domain and, at the end of every time
    block, pushes its K-deep boundary rows straight into its row
    neighbors' HBM halo slots with in-kernel remote DMAs over ICI
    (``pltpu.make_async_remote_copy``), the whole run still ONE kernel
    launch per chip. No barrier is needed: a shard can only *enter*
    time block t after receiving both end-of-(t-1) halo pushes, and a
    neighbor only *sends* its end-of-t push after finishing block t's
    compute — so every remote write is transitively ordered after the
    reads of the rows it overwrites (validated by the TPU interpret
    mode's vector-clock race detector, tests/test_mega_sharded.py).
    Receive waits sit at the window-DMA sites that actually read halo
    rows (block 0 / block B-1), so interior row blocks compute while
    neighbor pushes are still in flight — in-kernel exchange/compute
    overlap, the megakernel analog of the windowed path's
    ``--sharded-overlap`` (parallel/halo.py). The reference analog of
    the whole construction is its fork-join split over shared memory
    (compute/parallel/src/lib.rs:100-120), where halos are implicit
    overlapping reads; here each "thread" is a chip and the halo is an
    explicit ICI push.

    ``n_shard_cols > 1``: the 2-D mesh form — this instance owns a
    (row, column) tile of the global domain; windows are column-tiled
    (``tc`` required) so the 128-lane column-halo ring doubles as the
    mesh column halo. The exchange grows to 8 directions: 4 cardinal
    pushes (row pushes span interior columns only; column pushes span
    interior rows) plus 4 corner pushes to the diagonal neighbors
    (the explicit-message form of the windowed engine's two-phase
    corner trick, parallel/halo.py ``_exchange_cols``). The handshake
    simplifies to entry-gating: a shard consumes ALL of a slot's
    arrivals at time-block entry, before its first window DMA of that
    slot — less exchange/compute overlap than the 1-D form's
    read-site waits, but the same barrier-free transitive-ordering
    argument (and the same per-slot receive semaphores), and the 1-D
    protocol stays byte-identical."""
    fix_refs = None
    sharded = n_shards > 1 or n_shard_cols > 1
    if sharded:  # sems are appended last in the scratch list
        *refs, sendsem, recvsem = refs
    if strip_store:
        *refs, u_fix, v_fix = refs
        fix_refs = (u_fix, v_fix)
    if runtime_params:
        react_ref = refs[0]
        refs = refs[1:]
        reaction = ps.unpack_reaction(react_ref, dt_is_one)
    else:
        reaction = None
    if pack:
        (x_in, x_hbm, xin_s, xout_s, insem, outsem, cpsem) = refs
        del x_in  # aliased to x_hbm
        hbm, ins, outs = (x_hbm,), (xin_s,), (xout_s,)
    else:
        (u_in, v_in, u_hbm, v_hbm,
         uin_s, vin_s, uout_s, vout_s, insem, outsem, cpsem) = refs
        del u_in, v_in  # aliased to u_hbm / v_hbm
        hbm, ins, outs = (u_hbm, v_hbm), (uin_s, vin_s), (uout_s, vout_s)
    n_t = scal_ref[0]
    w = tr + 2 * halo
    # column tiling (``tc``): flat block index b enumerates (row block,
    # column block) pairs column-fastest; windows become (w, tc + 2*chalo)
    # slices with a 128-lane column halo ring — the megakernel analog of
    # the windowed kernel's 2-D grid (multistep_impl ``tc``), for domains
    # so wide that full-width windows force thin, halo-redundant row tiles
    wc = (tc + 2 * chalo) if tc is not None else c
    n_b = b_blocks * c_blocks
    # bf16 is a STORAGE mode (BENCHMARKS.md): windows upcast to f32 on
    # load, round once per K-step block on store — same policy as the
    # windowed kernel (pallas_stencil._kernel)
    store_f32 = hbm[0].dtype == jnp.float32
    precompute, step = ps.make_window_stepper(
        params, boundary, wc, halo, chalo, dtype=jnp.float32,
        reaction=reaction, pack=pack, fast_fold=fast_fold,
        slice_taps=slice_taps,
    )
    # block-local column index; column-tiled windows add bc*tc per window
    gcol0 = ps._col_iota(wc) - chalo
    c_tot = c // 2 if pack else (c_dom if c_dom is not None else c)

    def split_b(b):
        """Flat block index -> (row block, column block). bc=None means
        full-width windows; a single column-TILED block (c_blocks == 1,
        the narrow-slab 2-D mesh form) keeps bc = 0 so window slicing,
        interior cropping and global column origins stay column-aware."""
        if tc is None:
            return b, None
        if c_blocks == 1:
            return b, 0
        br = jax.lax.div(b, c_blocks)
        return br, b - br * c_blocks

    def in_dma(slot, src, b):
        br, bc = split_b(b)
        idx = (src, pl.ds(pl.multiple_of(br * tr, 8), w))
        if bc is not None:
            idx += (pl.ds(pl.multiple_of(bc * tc, 128), wc),)
        return tuple(
            pltpu.make_async_copy(
                hbm[i].at[idx], ins[i].at[slot],
                insem.at[slot, i],
            )
            for i in range(len(hbm))
        )

    def out_dma(slot, dst, b):
        br, bc = split_b(b)
        idx = (dst, pl.ds(pl.multiple_of(halo + br * tr, 8), tr))
        if bc is not None:
            idx += (pl.ds(pl.multiple_of(chalo + bc * tc, 128), tc),)
        return tuple(
            pltpu.make_async_copy(
                outs[i].at[slot], hbm[i].at[idx],
                outsem.at[slot, i],
            )
            for i in range(len(hbm))
        )

    def run_window(s, b):
        """Wait nothing, start nothing: sanitize slot ``s``'s staged
        window, run the K-step in-VMEM loop, return the interior rows.

        ``specialize``: windows that provably hold no domain-edge row
        (no global row 0 / r-1 and no out-of-domain padding) branch to
        the INTERIOR stepper via ``lax.cond`` — the domain-mask selects
        and the naive top-row fix-up vanish from their K-step loop
        while every retained op computes the same values
        (pallas_stencil.precompute ``interior``). The reference analog
        is ``regular``'s center/edge split
        (compute/regular/src/lib.rs:49-62), applied per row block
        instead of per pixel slab. OPT-IN: compiling the steppers
        inside cond branches changes FMA-contraction choices — ulp-
        scale output drift (same budget as fold/pack; measured <= 8e-9
        abs even when no interior block executes), so the bit-frozen
        naive default stays unspecialized. Roughly doubles the kernel
        graph (both steppers unroll K steps)."""
        br, bc = split_b(b)
        row_lo = (row0 + br * tr) - halo  # global row of window row 0
        giota = row_lo + jax.lax.broadcasted_iota(
            jnp.int32, (w, 1), 0
        )
        gcol = gcol0 if bc is None else col0 + bc * tc + gcol0
        interior = (slice(halo, halo + tr),) if tc is None else (
            slice(halo, halo + tr), slice(chalo, chalo + tc))

        def compute(interior_win: bool):
            ctx = precompute(giota, r, gcol, c_tot, interior=interior_win)
            if pack:
                x = ins[0][s]
                if not store_f32:
                    x = x.astype(jnp.float32)
                if ctx["dommask"] is not None:
                    # sanitize on load: HBM padding is never re-zeroed
                    x = jnp.where(ctx["dommask"], x, 0.0)
                for _ in range(steps):
                    x = step(x, ctx)
                return (x[interior],)
            u = ins[0][s]
            v = ins[1][s]
            if not store_f32:
                u = u.astype(jnp.float32)
                v = v.astype(jnp.float32)
            if ctx["dommask"] is not None:
                u = jnp.where(ctx["dommask"], u, 0.0)
                v = jnp.where(ctx["dommask"], v, 0.0)
            fix = (*fix_refs, b == 0) if fix_refs is not None else None
            for _ in range(steps):
                u, v = step(u, v, ctx, fix)
            return (u[interior], v[interior])

        if not specialize:
            return compute(False)
        pred = jnp.logical_and(row_lo >= 1, row_lo + w <= r - 1)
        return jax.lax.cond(
            pred, lambda: compute(True), lambda: compute(False)
        )

    col0 = 0
    if sharded:
        my = scal_ref[1]
        rp = b_blocks * tr
        row0 = my * rp
        has_up = my > 0
        has_dn = my < n_shards - 1

    if n_shard_cols > 1:
        myc = scal_ref[2]
        cpw = c_blocks * tc
        col0 = myc * cpw
        has_lf = myc > 0
        has_rt = myc < n_shard_cols - 1
        flat = my * n_shard_cols + myc

        def xchg_dma2(slot):
            """8-direction push descriptors for pair slot ``slot`` on the
            2-D mesh: ``(copies, send_guard, recv_guard)`` triples.

            Row pushes span INTERIOR columns only (the column-halo ring
            slots belong to the column and corner pushes — a full-width
            row push would clobber the receiver's corner arrivals with
            this shard's own ring), column pushes span interior rows,
            and the four corner pushes go straight to the diagonal
            neighbors. Column and corner pushes are only ``halo`` lanes
            wide, NOT the 128-lane ring: with K <= halo steps per time
            block, stencil influence travels at most ``halo`` columns,
            so only the innermost ``halo`` ring columns can ever reach a
            stored interior cell — the outer ring columns are read by
            window loads but provably cannot propagate (same argument as
            the sanitize mask's padding). This cuts the exchange bytes
            ~6x at production tile shapes (the ring depth is a LANE
            ALIGNMENT requirement of the window DMAs, not a physics
            one). By SPMD symmetry each descriptor's recv semaphore is
            signaled by the OPPOSITE neighbor's identical push (my
            "down" push's recvsem fires when my UP neighbor's down-push
            lands in my top halo), so ``recv_guard`` names the opposite
            neighbor. The 1-D mesh enumerates devices row-major through
            the (rows, cols) grid, so the flat logical id is
            ``my * n_shard_cols + myc``. Semaphores stay per-slot (see
            ``xchg_dma``'s aliasing note)."""
            h_, ch = halo, chalo
            hw = halo  # column/corner push width (see docstring)
            rows_i = pl.ds(h_, rp)
            land = jnp.logical_and
            #      (src rows/cols,          dst rows/cols,           off,
            #       send_guard, recv_guard)
            specs = [
                ((pl.ds(rp, h_), pl.ds(ch, cpw)),        # down
                 (pl.ds(0, h_), pl.ds(ch, cpw)),
                 n_shard_cols, has_dn, has_up),
                ((pl.ds(h_, h_), pl.ds(ch, cpw)),        # up
                 (pl.ds(h_ + rp, h_), pl.ds(ch, cpw)),
                 -n_shard_cols, has_up, has_dn),
                ((rows_i, pl.ds(ch + cpw - hw, hw)),     # right
                 (rows_i, pl.ds(ch - hw, hw)),
                 1, has_rt, has_lf),
                ((rows_i, pl.ds(ch, hw)),                # left
                 (rows_i, pl.ds(ch + cpw, hw)),
                 -1, has_lf, has_rt),
                ((pl.ds(rp, h_), pl.ds(ch + cpw - hw, hw)),  # down-right
                 (pl.ds(0, h_), pl.ds(ch - hw, hw)),
                 n_shard_cols + 1, land(has_dn, has_rt),
                 land(has_up, has_lf)),
                ((pl.ds(rp, h_), pl.ds(ch, hw)),         # down-left
                 (pl.ds(0, h_), pl.ds(ch + cpw, hw)),
                 n_shard_cols - 1, land(has_dn, has_lf),
                 land(has_up, has_rt)),
                ((pl.ds(h_, h_), pl.ds(ch + cpw - hw, hw)),  # up-right
                 (pl.ds(h_ + rp, h_), pl.ds(ch - hw, hw)),
                 -(n_shard_cols - 1), land(has_up, has_rt),
                 land(has_dn, has_lf)),
                ((pl.ds(h_, h_), pl.ds(ch, hw)),         # up-left
                 (pl.ds(h_ + rp, h_), pl.ds(ch + cpw, hw)),
                 -(n_shard_cols + 1), land(has_up, has_lf),
                 land(has_dn, has_rt)),
            ]
            out = []
            for d, (src, dst, off, sg, rg) in enumerate(specs):
                copies = [
                    pltpu.make_async_remote_copy(
                        hbm[i].at[(slot,) + src], hbm[i].at[(slot,) + dst],
                        sendsem.at[d, i], recvsem.at[slot, d, i],
                        device_id=flat + off,
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    for i in range(len(hbm))
                ]
                out.append((copies, sg, rg))
            return out

    elif n_shards > 1:

        def xchg_dma(slot):
            """Remote halo-push descriptors for pair slot ``slot``.

            ``down[i]`` pushes my bottom K boundary rows into the DOWN
            neighbor's TOP halo ([0, halo)); ``up[i]`` pushes my top
            boundary rows into the UP neighbor's BOTTOM halo. By SPMD
            symmetry the recv semaphore named in ``down`` is the one
            signaled when MY top halo arrives (from my up neighbor's
            identical ``down`` push), so on the receive side:
            ``down[i].wait_recv()`` = top halo arrived (guard: has_up),
            ``up[i].wait_recv()`` = bottom halo arrived (has_dn).

            The recv semaphores are indexed BY PAIR SLOT: consecutive
            pushes in a direction target alternating slots, and two
            separate DMAs are not guaranteed to complete in issue order
            on real ICI — with a shared per-direction semaphore, block
            t's entry wait could be satisfied by the end-of-t push
            (slot 1-s) while the end-of-(t-1) push (slot s, the one the
            block actually reads) is still in flight. Per-slot
            semaphores make that aliasing impossible; same-slot pushes
            are already strictly ordered by the handshake (the t+2 push
            is issued only after the receiver consumed the t push)."""
            down, up = [], []
            for i in range(len(hbm)):
                down.append(pltpu.make_async_remote_copy(
                    hbm[i].at[slot, pl.ds(rp, halo)],
                    hbm[i].at[slot, pl.ds(0, halo)],
                    sendsem.at[0, i], recvsem.at[slot, 0, i],
                    # LOGICAL: the driver's 1-D mesh enumerates devices
                    # in order, so the row index IS the logical id (the
                    # MESH form needs mesh axes the cross-platform
                    # export lowering cannot see)
                    device_id=my + 1,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ))
                up.append(pltpu.make_async_remote_copy(
                    hbm[i].at[slot, pl.ds(halo, halo)],
                    hbm[i].at[slot, pl.ds(halo + rp, halo)],
                    sendsem.at[1, i], recvsem.at[slot, 1, i],
                    device_id=my - 1,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ))
            return down, up
    else:
        row0 = 0

    def time_body(t, _):
        src = jax.lax.rem(t, 2)
        dst = 1 - src
        if n_shard_cols > 1:
            # 2-D entry gating: consume ALL of slot src's arrivals (the
            # neighbors' end-of-(t-1) pushes) before this block's first
            # window DMA can stage any halo cells
            for copies, _sg, rg in xchg_dma2(src):
                @pl.when(jnp.logical_and(t > 0, rg))
                def _(copies=copies):
                    for cp in copies:
                        cp.wait_recv()
        elif n_shards > 1:
            src_down, src_up = xchg_dma(src)

            # my top halo (rows [0, halo) of src, read by block 0's
            # window) was pushed by the up neighbor at the end of its
            # block t-1; consume the arrival before staging the window
            @pl.when(jnp.logical_and(t > 0, has_up))
            def _():
                for cp in src_down:
                    cp.wait_recv()
            if b_blocks == 1:
                # block 0 IS the last block: its window also reads the
                # bottom halo
                @pl.when(jnp.logical_and(t > 0, has_dn))
                def _():
                    for cp in src_up:
                        cp.wait_recv()
        for d in in_dma(0, src, 0):  # warmup: block 0's window
            d.start()

        def block_body(b, _):
            s = jax.lax.rem(b, 2)

            if n_shards > 1 and n_shard_cols == 1 and b_blocks > 1:
                # the LAST ROW's windows (flat blocks n_b - c_blocks ..
                # n_b - 1) read the bottom halo; the first of them is
                # staged by the prefetch at b == n_b - c_blocks - 1, so
                # consume the arrival here — interior blocks before this
                # point compute with the push still in flight (in-kernel
                # exchange/compute overlap)
                @pl.when(jnp.logical_and(
                    b == n_b - c_blocks - 1, jnp.logical_and(t > 0, has_dn)
                ))
                def _():
                    for cp in src_up:
                        cp.wait_recv()

            @pl.when(b + 1 < n_b)
            def _():
                for d in in_dma(1 - s, src, b + 1):
                    d.start()

            for d in in_dma(s, src, b):
                d.wait()
            uv_out = run_window(s, b)
            if n_b > 2:
                # slot s's previous output DMA (flat block b-2) may still
                # be in flight; finish it before restaging the slot
                @pl.when(b >= 2)
                def _():
                    for d in out_dma(s, dst, b - 2):
                        d.wait()
            for o_ref, val in zip(outs, uv_out):
                o_ref[s] = val if store_f32 else val.astype(o_ref.dtype)
            for d in out_dma(s, dst, b):
                d.start()

        jax.lax.fori_loop(0, n_b, block_body, None, unroll=False)
        # drain before the next time block reads these rows from `dst`
        if n_b >= 2:
            for d in out_dma((n_b - 2) % 2, dst, n_b - 2):
                d.wait()
        for d in out_dma((n_b - 1) % 2, dst, n_b - 1):
            d.wait()
        if n_shard_cols > 1:
            # push this block's fresh boundary rows/columns/corners into
            # all existing neighbors' halo slots (same transitive-order
            # safety argument as the 1-D elif below: a neighbor consumed
            # this shard's end-of-(t-1) push before entering ITS block t,
            # so it has finished every slot-dst read this push could
            # race). Start all eight directions before waiting any send:
            # the local HBM reads overlap.
            descs2 = xchg_dma2(dst)
            for copies, sg, _rg in descs2:
                @pl.when(sg)
                def _(copies=copies):
                    for cp in copies:
                        cp.start()
            for copies, sg, _rg in descs2:
                @pl.when(sg)
                def _(copies=copies):
                    for cp in copies:
                        cp.wait_send()
        elif n_shards > 1:
            # push this block's fresh boundary rows into the neighbors'
            # halo slots. Safe without a barrier: the neighbor finished
            # ALL of its block t-1 (including its last read of the slot
            # being written) before it pushed the halo that gated THIS
            # shard's entry into block t. Send completion is waited
            # immediately — the source rows are rewritten no earlier
            # than block t+2, but the local HBM read is microseconds
            # and keeping it synchronous keeps the recv accounting
            # one-in-flight-per-direction.
            dst_down, dst_up = xchg_dma(dst)

            @pl.when(has_dn)
            def _():
                for cp in dst_down:
                    cp.start()

            @pl.when(has_up)
            def _():
                for cp in dst_up:
                    cp.start()

            @pl.when(has_dn)
            def _():
                for cp in dst_down:
                    cp.wait_send()

            @pl.when(has_up)
            def _():
                for cp in dst_up:
                    cp.wait_send()

    if not sharded and halo <= tr and (
        n_b >= 2 * depth if c_blocks == 1
        else (b_blocks - 1) * c_blocks >= 2 * depth
    ):
        # (halo <= tr: the safety argument below counts on a window
        # reaching at most ONE neighboring row block; a deeper halo
        # spans row block br+2, whose previous-time-block output DMA is
        # not yet semaphore-ordered at prefetch time. halo > tr takes
        # the draining two-loop form, which has no cross-time-block
        # in-flight DMAs.)
        # --- seamless pipeline: one flat loop over (time block, row
        # block, column block), so the DMA pipeline never drains at a
        # time boundary. The next iteration's window prefetch crosses the
        # boundary (the first windows of time block t+1 are staged while
        # block t's last rows still compute), which removes the
        # per-time-block serial bubble of the two-loop form (drain
        # outputs -> load block 0 -> compute); measured as the f32
        # kernel's residual DMA-overlap slack (BENCHMARKS.md "on-chip
        # device time").
        # ``depth`` generalizes the double-buffer to a D-slot ring:
        # D - 1 window prefetches ride ahead of compute and up to D
        # output DMAs stay in flight (slot s's previous output is waited
        # only when s is restaged, D iterations later).
        # Safety: in(g + D - 1)'s window reads cells written by the
        # previous time block's outputs up to flat index g+D-B for
        # full-width windows (neighbor row block br+1) and g+D-B+Bc for
        # column-tiled ones (corner neighbor (br+1, bc+1)); the slot
        # restage below waits out(g-D) before the prefetch issues — so
        # every read-after-write is semaphore-ordered iff B >= 2D
        # (full-width) resp. B - Bc >= 2D (column-tiled). The two-loop
        # form remains for shorter domains and the sharded handshake,
        # whose recv waits assume the per-t structure.
        n_g = n_t * n_b

        # warmup: stage the first D - 1 windows (B >= 2D keeps them all
        # inside time block 0, reading pair slot 0)
        for gw in range(depth - 1):
            @pl.when(n_g > gw)
            def _(gw=gw):
                for d in in_dma(gw % depth, 0, gw):
                    d.start()

        def g_body(g, _):
            t = jax.lax.div(g, n_b)
            b = g - t * n_b
            src = jax.lax.rem(t, 2)
            dst = 1 - src
            s = jax.lax.rem(g, depth)

            # finish the slot's previous output DMA (iteration g-D)
            # before restaging it below AND before the prefetch: by
            # induction every output <= g-D is then complete. The wait
            # descriptor only contributes the copy's extent (all outputs
            # are (tr, c)); the actual rows/slot of g-D's copy are
            # irrelevant to the semaphore it waits on.
            @pl.when(g >= depth)
            def _():
                for d in out_dma(s, dst, b):
                    d.wait()

            @pl.when(g + depth - 1 < n_g)
            def _():
                gp = g + depth - 1
                t1 = jax.lax.div(gp, n_b)
                for d in in_dma(jax.lax.rem(gp, depth),
                                jax.lax.rem(t1, 2), gp - t1 * n_b):
                    d.start()

            for d in in_dma(s, src, b):
                d.wait()
            uv_out = run_window(s, b)
            for o_ref, val in zip(outs, uv_out):
                o_ref[s] = val if store_f32 else val.astype(o_ref.dtype)
            for d in out_dma(s, dst, b):
                d.start()

        jax.lax.fori_loop(0, n_g, g_body, None, unroll=False)

        # drain the final D output DMAs — exactly one per slot (every
        # earlier one was waited at its slot's restage; n_g >= 2D when
        # n_t >= 1 guarantees each slot saw a final start). Wait
        # descriptors contribute extent only, so slot identity suffices.
        @pl.when(n_g > 0)
        def _():
            last_dst = 1 - jax.lax.rem(n_t - 1, 2)
            for k in range(depth):
                for d in out_dma(jax.lax.rem(n_g - 1 - k, depth),
                                 last_dst, n_b - 1 - k):
                    d.wait()
    else:
        jax.lax.fori_loop(0, n_t, time_body, None, unroll=False)

    if n_shard_cols > 1:
        # consume the final time block's arrivals (every earlier block's
        # arrivals were consumed by the next block's entry gate)
        last2 = jax.lax.rem(n_t, 2)  # dst slot of time block n_t - 1
        for copies, _sg, rg in xchg_dma2(last2):
            @pl.when(jnp.logical_and(n_t > 0, rg))
            def _(copies=copies):
                for cp in copies:
                    cp.wait_recv()
    elif n_shards > 1:
        # consume the final time block's arrivals (every earlier block's
        # arrivals were consumed at the next block's read sites)
        last = jax.lax.rem(n_t, 2)  # dst slot of time block n_t - 1
        fin_down, fin_up = xchg_dma(last)

        @pl.when(jnp.logical_and(n_t > 0, has_up))
        def _():
            for cp in fin_down:
                cp.wait_recv()

        @pl.when(jnp.logical_and(n_t > 0, has_dn))
        def _():
            for cp in fin_up:
                cp.wait_recv()

    @pl.when(jax.lax.rem(n_t, 2) == 1)
    def _():
        # odd block count: result sits in slot 1; restore the "current
        # state = slot 0" invariant with one whole-array HBM->HBM copy
        for i in range(len(hbm)):
            pltpu.make_async_copy(
                hbm[i].at[1], hbm[i].at[0], cpsem.at[i]
            ).start()
        for i in range(len(hbm)):
            pltpu.make_async_copy(
                hbm[i].at[1], hbm[i].at[0], cpsem.at[i]
            ).wait()


def _mega_vmem_est(tr: int, halo: int, c: int, species: int,
                   strip_store: bool = False, tc: int | None = None,
                   chalo: int = 0, depth: int = 2) -> float:
    """Scoped-VMEM estimate: per-species 2 window slots + 2 output slots,
    plus the step loop's stack liveness. The 13.3x liveness anchor was
    measured on the unpacked kernel per ONE species' window bytes with
    the PAIR in flight; the species-packed kernel (species=1) holds the
    same total state in one double-wide array, so its liveness estimate
    is the pair-equivalent (half the packed array width).
    ``strip_store`` adds the two explicit (W, C) fix-up scratch
    windows. ``tc``: column-tiled windows — slots and liveness scale
    with the (w, tc + 2*chalo) window instead of the full width."""
    w = tr + 2 * halo
    wc = (tc + 2 * chalo) if tc is not None else c
    otc = tc if tc is not None else c
    slots = species * depth * (w * wc + tr * otc) * 4
    liveness = 13.3 * w * wc * 4 * (species / 2)
    if tc is not None:
        # the column-joined domain mask is a full (W, Wc) boolean (the
        # full-width kernel's is (W, 1)): surcharge the liveness anchor
        # the way choose_vmem_limit derates naive's (W, C) b_field
        liveness *= 1.10
    if strip_store:
        slots += 2 * w * wc * 4
    return slots + liveness


def mega_vmem_limit(tr: int, halo: int, c: int, species: int = 2,
                    strip_store: bool = False, tc: int | None = None,
                    chalo: int = 0, depth: int = 2) -> int:
    """Scoped-VMEM tier for the estimate (quantized so standard configs
    keep stable compile params)."""
    est = _mega_vmem_est(tr, halo, c, species, strip_store, tc, chalo,
                         depth)
    tiers = device.vmem_tiers()
    for tier in tiers:
        if est <= tier:
            return tier
    return tiers[-1]


def mega_ok(shape, tr: int | None = None, halo: int = MEGA_STEPS,
            species: int = 2, strip_store: bool = False,
            tc: int | None = None, boundary: str = "zero",
            cover: bool = False, depth: int = 2,
            specialize: bool = False) -> bool:
    """Whether the megakernel supports this domain: windows (full-width,
    or ``(w, tc + 256)`` column tiles) must fit the VMEM budget and the
    K-unrolled graph must clear the Mosaic compile ceiling (derated for
    the naive boundary's heavier per-step graph, like the windowed
    guard). Resolution mirrors the runtime: ``tr`` pinned alone means
    full-width windows at that row block; neither pinned means the
    geometry heuristic picks both. ``species=1`` = the packed layout
    (shape is then the packed (r, 2*c) extent; full-width only).
    ``cover``: allow a single column tile covering the whole (padded)
    width — single-chip that is pure ring overhead and rejected, but on
    a 2-D mesh shard the ring IS the mesh column halo (shape is then
    the per-shard slab)."""
    r, c = shape
    if tr is not None and (tr < 8 or tr % 8 != 0):
        return False  # megastep_impl requires 8-row-aligned tiles
    if tc is not None:
        # column-tiled layouts silently decline specialize (backends/
        # pallas._mega_specialize_resolved): never charge them its
        # doubled-graph compile derate
        specialize = False
    if tc is not None and (strip_store or species != 2):
        return False
    if tr is None and tc is None and species == 2 and not strip_store:
        tr, tc = choose_mega_geometry(r, c, halo, boundary=boundary,
                                      depth=depth, specialize=specialize)
    chalo = ps.COL_HALO if tc is not None else 0
    if tc is not None and not (
        128 <= tc and tc % 128 == 0
        and (tc <= -(-c // 128) * 128 if cover else tc < c)
    ):
        return False
    tr = tr or choose_mega_rows(r, c, halo, species, strip_store,
                                tc=tc, chalo=chalo, boundary=boundary,
                                depth=depth, specialize=specialize)
    wc = (tc + 2 * chalo) if tc is not None else c
    # a depth > 2 ring only acts in the seamless single-chip form; mirror
    # the run-time clamp (megastep_impl) so a depth pin on a too-small
    # block count is judged at the depth=2 it will actually run with
    b_blocks = -(-r // tr)
    c_blocks = -(-c // tc) if tc is not None else 1
    seam_cap = (b_blocks * c_blocks if c_blocks == 1
                else (b_blocks - 1) * c_blocks)
    if seam_cap < 2 * depth:
        depth = 2
    # specialize compiles BOTH steppers under lax.cond per block —
    # roughly double the K-unrolled graph; gate it like doubled steps
    csteps = 2 * halo if specialize else halo
    return (
        _mega_vmem_est(tr, halo, c, species, strip_store, tc, chalo,
                       depth=depth) <= device.vmem_tier_cap()
        and ps.window_compile_ok(tr, halo, wc, boundary, steps=csteps)
    )


def choose_mega_rows(r: int, c: int, halo: int = MEGA_STEPS,
                     species: int = 2, strip_store: bool = False,
                     tc: int | None = None, chalo: int = 0,
                     boundary: str = "zero", depth: int = 2,
                     specialize: bool = False) -> int:
    """Row-block size: largest padding-free tile whose window pair plus
    slots fit the 120 MB VMEM tier, preferring >= 2 blocks so the inner
    loop can prefetch (B=1 serializes each time block's DMA against
    compute). Scored like choose_block_rows: total window rows.
    ``tc``: size for (w, tc + 2*chalo) column-tiled windows instead of
    full-width ones."""
    wc = (tc + 2 * chalo) if tc is not None else c
    rp8 = -(-r // 8) * 8
    # column-tiled layouts decline specialize: no doubled-graph derate
    csteps = 2 * halo if (specialize and tc is None) else halo
    best, best_score = None, None
    for tr in range(8, min(rp8, 1024) + 1, 8):
        w = tr + 2 * halo
        if not ps.window_compile_ok(tr, halo, wc, boundary, steps=csteps):
            break
        if _mega_vmem_est(tr, halo, c, species, strip_store,
                          tc, chalo, depth=depth) > device.vmem_tier_cap():
            break
        n = -(-r // tr)
        if n == 1 and r > 2 * halo + 8:
            continue  # prefer a prefetchable 2+ block split
        score = n * w
        if best_score is None or score <= best_score:
            best, best_score = tr, score
    if best is None:
        best = 8
    return best


def mega_window_cells(r: int, c: int, tr: int, tc: int | None,
                      halo: int = MEGA_STEPS) -> int:
    """Total window cells per time block — the kernel's VPU compute
    volume, folding together halo redundancy and round-up padding."""
    w = tr + 2 * halo
    if tc is None:
        return -(-r // tr) * w * c
    wc = tc + 2 * ps.COL_HALO
    return -(-r // tr) * w * -(-c // tc) * wc


def choose_mega_geometry(r: int, c: int, halo: int = MEGA_STEPS,
                         strip_store: bool = False,
                         species: int = 2,
                         boundary: str = "zero", depth: int = 2,
                         specialize: bool = False) -> tuple[int, int | None]:
    """(tr, tc): the megakernel window geometry for this domain.

    Full-width windows (tc=None) are preferred — no column-halo
    redundancy, contiguous DMA rows. Column tiling pays only on very
    wide domains where the VMEM budget forces full-width row tiles so
    thin that their row-halo redundancy exceeds the column tiles'
    combined row+column redundancy (measured crossover: c=16384, where
    full-width tr=72 carries 22% window overhead vs ~13% for
    tc=8192/tr=160). Candidates are scored by total window cells with a
    3% full-width bias (strided column-sliced DMAs and the (W, Wc)
    column mask are unmodeled costs)."""
    tr_fw = choose_mega_rows(r, c, halo, species, strip_store,
                             boundary=boundary, depth=depth,
                             specialize=specialize)
    best: tuple[int, int | None] = (tr_fw, None)
    fw_ok = mega_ok((r, c), tr_fw, halo, species, strip_store,
                    boundary=boundary, depth=depth, specialize=specialize)
    best_score = (
        mega_window_cells(r, c, tr_fw, None, halo) / 1.03 if fw_ok
        else float("inf")
    )
    if strip_store or species != 2:
        return best  # column tiling is plain two-species only
    for tc in (8192, 4096, 2048, 1024):
        if tc >= c:
            continue
        # column-tiled runs always decline specialize — judge these
        # candidates without its compile derate, or a mega_specialize
        # pin silently degrades wide domains to slower full-width tiles
        tr = choose_mega_rows(r, c, halo, species, strip_store,
                              tc=tc, chalo=ps.COL_HALO, boundary=boundary,
                              depth=depth, specialize=False)
        if not mega_ok((r, c), tr, halo, species, tc=tc,
                       boundary=boundary, depth=depth,
                       specialize=False):
            continue
        score = mega_window_cells(r, c, tr, tc, halo)
        if score < best_score:
            best, best_score = (tr, tc), score
    return best


def mega_pad_state(u: np.ndarray, v: np.ndarray, tr: int,
                   halo: int = MEGA_STEPS, dtype=np.float32,
                   tc: int | None = None):
    """(R, C) concentrations -> (2, halo + Rp + halo, C) HBM pairs
    (column-tiled: (2, halo + Rp + halo, chalo + Cp + chalo), Cp the
    tc-rounded width, chalo the 128-lane column halo ring).
    Slot 0 holds the current state; slot 1 starts zero (its in-domain
    cells are fully overwritten by the first time block; its padding is
    sanitized on every window load). ``dtype`` selects the storage
    precision (bfloat16 = the opt-in fast mode; compute stays f32)."""
    r, c = u.shape
    rp = -(-r // tr) * tr
    chalo = ps.COL_HALO if tc is not None else 0
    cp = c if tc is None else -(-c // tc) * tc
    out = []
    for x in (u, v):
        buf = np.zeros((2, halo + rp + halo, cp + 2 * chalo), dtype=dtype)
        buf[0, halo : halo + r, chalo : chalo + c] = x.astype(dtype)
        out.append(buf)
    return out[0], out[1]


def megastep_impl(
    u_pair, v_pair, n_blocks, reaction=None,
    *, steps: int, tr: int, r: int, params: Parameters, boundary: str,
    halo: int = MEGA_STEPS, interpret: bool = False,
    vmem_limit_bytes: int | None = None, dt_is_one: bool = False,
    strip_store: bool = False, n_shards: int = 1, my_shard=None,
    tc: int | None = None, c_dom: int | None = None,
    n_shard_cols: int = 1, my_shard_col=None,
    depth: int = 2, specialize: bool = False, fast_fold: bool = False,
    slice_taps: bool = False,
):
    """Advance the pair state by ``n_blocks`` (traced) x ``steps`` (static,
    <= halo) simulation steps in ONE kernel launch. Returns the new pairs
    with the current state in slot 0.

    ``tc``: column-tiled windows for very wide domains (pairs built with
    ``mega_pad_state(..., tc=tc)`` / ``halo.mega_shard_state(..., tc=tc)``;
    ``c_dom`` = the true domain width — the halo-exchange row slabs span
    the full padded width, so sharding composes: only the bottom-halo
    recv wait moves to the prefetch of the last row's FIRST column
    block). ``n_shards > 1`` (call inside ``shard_map`` with
    ``my_shard`` = this chip's row index, a traced scalar): the
    multi-chip megakernel — ``r`` is then the GLOBAL row count, the pair
    holds this shard's row slab, and slot 0's halo rows must be valid at
    entry (the caller pre-exchanges once per run, parallel/halo.py);
    they are fresh again at exit. ``n_shard_cols > 1``: the 2-D
    (rows x cols) mesh — windows must be column-tiled, ``my_shard_col``
    is this chip's mesh-column index, ``c_dom`` becomes the GLOBAL
    column count, and the exchange grows to 8 directions with an
    entry-gated handshake. See ``_mega_kernel``."""
    if not (1 <= steps <= halo):
        raise ValueError(f"steps must be in [1, {halo}], got {steps}")
    if not (2 <= depth <= 8):
        raise ValueError(f"pipeline depth must be in [2, 8], got {depth}")
    if specialize and strip_store:
        # the strip-store fix-up writes scratch refs inside the step
        # loop; duplicating it across the cond branches buys nothing
        raise UnsupportedConfigError("specialize and strip_store conflict")
    if fast_fold and strip_store:
        raise UnsupportedConfigError("fast_fold and strip_store conflict")
    if fast_fold and boundary != "naive":
        raise UnsupportedConfigError("fast_fold applies to the naive "
                                     "boundary")
    if slice_taps and boundary != "naive":
        raise UnsupportedConfigError("slice_taps (naive_fix='slice') is "
                                     "naive-only")
    if slice_taps and strip_store:
        raise UnsupportedConfigError("slice_taps and strip_store "
                                     "conflict; pin at most one")
    if strip_store and boundary != "naive":
        raise UnsupportedConfigError("strip_store is naive-only")
    if strip_store and (n_shards > 1 or n_shard_cols > 1):
        # the strip-store top-edge predicate is "first row block", which
        # on shard > 0 is NOT global row 0 — applying the row-0 edge
        # formula there would silently corrupt interior rows
        raise UnsupportedConfigError("strip_store is single-chip only")
    if n_shard_cols > 1:
        if my_shard is None or my_shard_col is None:
            raise UnsupportedConfigError(
                "2-D sharded mode needs my_shard and my_shard_col"
            )
        if tc is None:
            raise UnsupportedConfigError(
                "2-D sharded mode needs column-tiled windows (tc): the "
                "128-lane column-halo ring is the mesh column halo"
            )
    else:
        if my_shard_col is not None:
            raise ValueError("my_shard_col needs n_shard_cols > 1")
        if (n_shards > 1) != (my_shard is not None):
            raise ValueError(
                "sharded mode needs both n_shards and my_shard"
            )
        if n_shards > 1 and halo > tr:
            # the bottom-halo recv wait sits at block B-2's prefetch
            # site, which is only ahead of every halo-reading window DMA
            # when one tile row covers the halo depth (the 2-D form is
            # entry-gated instead, so it carries no such constraint)
            raise UnsupportedConfigError(
                f"sharded mode needs halo <= tr, got {halo} > {tr}"
            )
    _, hp, c = u_pair.shape
    rp = hp - 2 * halo
    if n_shard_cols > 1 and rp < halo:
        # the row pushes read/write halo-deep row bands of the interior
        raise ValueError(
            f"2-D sharded slabs need >= halo interior rows, got {rp}"
        )
    if rp % tr != 0 or tr % 8 != 0 or halo % 8 != 0:
        raise ValueError(
            f"interior rows {rp} must be a multiple of tr={tr} "
            "(tr and halo multiples of 8)"
        )
    chalo = 0
    c_blocks = 1
    if tc is not None:
        if strip_store:
            raise UnsupportedConfigError("strip_store needs full-width windows")
        if specialize:
            # backends silently decline specialize for column-tiled
            # layouts; a direct ops-level caller gets the uniform error
            # instead of an opaque trace-time failure in pallas_stencil
            raise UnsupportedConfigError(
                "specialize needs full-width windows (column-tiled "
                "layouts decline it)"
            )
        chalo = ps.COL_HALO
        if tc % 128 != 0:
            raise ValueError(f"tc must be a multiple of 128, got {tc}")
        if chalo < steps:
            raise ValueError(
                f"temporal depth {steps} exceeds the {chalo}-lane "
                "column-halo ring"
            )
        cp = c - 2 * chalo
        if cp % tc != 0:
            raise ValueError(
                f"interior cols {cp} must be a multiple of tc={tc}"
            )
        c_blocks = cp // tc
        # c_dom is the true GLOBAL domain width: per-shard padding can
        # land anywhere on a 2-D mesh, so only the global capacity bound
        # applies there; single-chip keeps the tight per-pair bound
        cap = n_shard_cols * cp
        lo = cp - tc if n_shard_cols == 1 else 0
        if c_dom is None or not (lo < c_dom <= cap):
            raise ValueError(
                f"column tiling needs the true domain width c_dom in "
                f"({lo}, {cap}], got {c_dom}"
            )
    b_blocks = rp // tr
    w = tr + 2 * halo
    wc = (tc + 2 * chalo) if tc is not None else c
    otc = tc if tc is not None else c
    # a depth > 2 ring only acts in the seamless single-chip form; force
    # the double buffer elsewhere instead of allocating dead slots
    sharded_any = n_shards > 1 or n_shard_cols > 1
    n_b_flat = b_blocks * c_blocks
    seam_cap = n_b_flat if c_blocks == 1 else (b_blocks - 1) * c_blocks
    if sharded_any or seam_cap < 2 * depth:
        depth = 2
    scalars = [jnp.asarray(n_blocks, jnp.int32).reshape(1)]
    if n_shards > 1 or n_shard_cols > 1:
        scalars.append(jnp.asarray(my_shard, jnp.int32).reshape(1))
    if n_shard_cols > 1:
        scalars.append(jnp.asarray(my_shard_col, jnp.int32).reshape(1))
    scalars = jnp.concatenate(scalars)
    kernel = functools.partial(
        _mega_kernel, steps=steps, tr=tr, b_blocks=b_blocks, c=c,
        halo=halo, r=r, params=params, boundary=boundary,
        runtime_params=reaction is not None, dt_is_one=dt_is_one,
        strip_store=strip_store, n_shards=n_shards,
        tc=tc, chalo=chalo, c_blocks=c_blocks, c_dom=c_dom,
        n_shard_cols=n_shard_cols, depth=depth, specialize=specialize,
        fast_fold=fast_fold, slice_taps=slice_taps,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [scalars]
    if reaction is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(reaction, jnp.float32).reshape(1, ps.REACTION_LEN))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs += [any_spec, any_spec]
    operands += [u_pair, v_pair]
    n_in = len(operands)
    out_u, out_v = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct(u_pair.shape, u_pair.dtype),
            jax.ShapeDtypeStruct(v_pair.shape, v_pair.dtype),
        ],
        input_output_aliases={n_in - 2: 0, n_in - 1: 1},
        scratch_shapes=[
            pltpu.VMEM((depth, w, wc), u_pair.dtype),
            pltpu.VMEM((depth, w, wc), v_pair.dtype),
            pltpu.VMEM((depth, tr, otc), u_pair.dtype),
            pltpu.VMEM((depth, tr, otc), v_pair.dtype),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((depth, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ] + ([pltpu.VMEM((w, c), jnp.float32),
              pltpu.VMEM((w, c), jnp.float32)] if strip_store else [])
        + ([pltpu.SemaphoreType.DMA((8, 2)),        # send: [dir, species]
            pltpu.SemaphoreType.DMA((2, 8, 2))]     # recv: [slot, dir, sp]
           if n_shard_cols > 1 else
           [pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2, 2))]
           if n_shards > 1 else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
            or mega_vmem_limit(tr, halo, c, strip_store=strip_store,
                               tc=tc, chalo=chalo, depth=depth),
        ),
        interpret=interpret,
    )(*operands)
    return out_u, out_v


_STATIC = ("steps", "tr", "r", "params", "boundary", "halo", "interpret",
           "vmem_limit_bytes", "dt_is_one", "strip_store", "n_shards",
           "tc", "c_dom", "n_shard_cols", "depth", "specialize",
           "fast_fold", "slice_taps")

megastep = jax.jit(
    megastep_impl,
    static_argnames=_STATIC,
    donate_argnames=("u_pair", "v_pair"),
)


def mega_pack_state(u: np.ndarray, v: np.ndarray, tr: int,
                    halo: int = MEGA_STEPS) -> np.ndarray:
    """(R, C) concentrations -> one (2, halo + Rp + halo, 2*C)
    species-packed f32 HBM pair (x = [U | V] along lanes)."""
    r, c = u.shape
    rp = -(-r // tr) * tr
    buf = np.zeros((2, halo + rp + halo, 2 * c), dtype=np.float32)
    buf[0, halo : halo + r, :c] = u.astype(np.float32)
    buf[0, halo : halo + r, c : 2 * c] = v.astype(np.float32)
    return buf


def packed_megastep_impl(
    x_pair, n_blocks, reaction=None,
    *, steps: int, tr: int, r: int, params: Parameters,
    halo: int = MEGA_STEPS, interpret: bool = False,
    vmem_limit_bytes: int | None = None, dt_is_one: bool = False,
):
    """Species-packed megakernel driver: one (2, *, 2C) pair instead of
    two species pairs — half the DMAs, the packed stepper's ~25-op step
    (zero boundary only; see :func:`megastep_impl` for semantics)."""
    if not (1 <= steps <= halo):
        raise ValueError(f"steps must be in [1, {halo}], got {steps}")
    _, hp, cc = x_pair.shape
    rp = hp - 2 * halo
    if rp % tr != 0 or tr % 8 != 0 or halo % 8 != 0:
        raise ValueError(
            f"interior rows {rp} must be a multiple of tr={tr} "
            "(tr and halo multiples of 8)"
        )
    b_blocks = rp // tr
    w = tr + 2 * halo
    scalars = jnp.asarray(n_blocks, jnp.int32).reshape(1)
    kernel = functools.partial(
        _mega_kernel, steps=steps, tr=tr, b_blocks=b_blocks, c=cc,
        halo=halo, r=r, params=params, boundary="zero",
        runtime_params=reaction is not None, dt_is_one=dt_is_one,
        pack=True,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    operands = [scalars]
    if reaction is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(
            jnp.asarray(reaction, jnp.float32).reshape(1, ps.REACTION_LEN)
        )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs.append(any_spec)
    operands.append(x_pair)
    n_in = len(operands)
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct(x_pair.shape, x_pair.dtype),
        input_output_aliases={n_in - 1: 0},
        scratch_shapes=[
            pltpu.VMEM((2, w, cc), jnp.float32),
            pltpu.VMEM((2, tr, cc), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA((2, 1)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes
            or mega_vmem_limit(tr, halo, cc, species=1),
        ),
        interpret=interpret,
    )(*operands)


_PACKED_STATIC = ("steps", "tr", "r", "params", "halo", "interpret",
                  "vmem_limit_bytes", "dt_is_one")

packed_megastep = jax.jit(
    packed_megastep_impl,
    static_argnames=_PACKED_STATIC,
    donate_argnames=("x_pair",),
)
