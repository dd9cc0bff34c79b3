"""Megakernel (whole-run manual-DMA engine) validation: oracle parity,
bitwise equivalence with the windowed kernel, engine selection, and
executable reuse across block counts. See ops/megakernel.py for the
design; the per-window step math is shared with the windowed kernel, so
these tests focus on the driver (DMA pipeline, ping-pong parity, final
copy, remainder handling)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.ops import megakernel as mk
from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.params import Parameters

from conftest import random_uv


def run_mega(u, v, params, boundary, steps, **kw):
    sim = PallasSimulation(params, boundary=boundary, interpret=True,
                          engine="mega", **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_mega_parity_multiblock(rng, params, boundary):
    """2 row blocks x 2 time blocks (even parity: result stays in slot 0
    without the final copy) against the oracle."""
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, 16, boundary)
    gu, gv = run_mega(u, v, params, boundary, 16, block_rows=16)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_mega_odd_blocks_and_remainder(rng, params):
    """steps=27 = 3 full K=8 time blocks (odd: exercises the slot1->slot0
    parity copy) + a remainder-3 call; 19 rows: padded block handling."""
    u, v = random_uv(rng, (19, 16))
    ou, ov = oracle.run(u, v, params, 27, "naive")
    gu, gv = run_mega(u, v, params, "naive", 27, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_mega_bitwise_matches_windowed(rng, params, boundary):
    """The megakernel is the windowed kernel's step math behind a manual
    DMA driver: the bit-frozen naive path must match BIT FOR BIT (same
    window geometry). The zero path's v4 linear fold leaves the compiler
    FMA-contraction freedom that may round 1 ulp apart between the two
    compilations (same budget as tests/test_fold.py), so zero is held to
    an ulp-scale tolerance instead."""
    u, v = random_uv(rng, (40, 16))
    tr, halo, steps = 16, 8, 8
    up, vp = ps.pad_state(u, v, tr, halo)
    uw, vw = ps.multistep(
        jnp.asarray(up), jnp.asarray(vp), -halo, 40,
        steps=steps, tr=tr, params=params, boundary=boundary,
        halo=halo, interpret=True,
    )
    up2, vp2 = mk.mega_pad_state(u, v, tr, halo)
    um, vm = mk.megastep(
        jnp.asarray(up2), jnp.asarray(vp2), jnp.int32(1), None,
        steps=steps, tr=tr, r=40, params=params, boundary=boundary,
        halo=halo, interpret=True,
    )
    atol = 0.0 if boundary == "naive" else 3e-7
    np.testing.assert_allclose(np.asarray(um[0, halo:halo + 40]),
                               np.asarray(uw[halo:halo + 40]),
                               rtol=0, atol=atol)
    np.testing.assert_allclose(np.asarray(vm[0, halo:halo + 40]),
                               np.asarray(vw[halo:halo + 40]),
                               rtol=0, atol=atol)


def test_mega_three_plus_blocks_pipeline(rng, params):
    """B=4 row blocks exercises the slot-reuse wait (b >= 2) branch."""
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, 8, "zero")
    gu, gv = run_mega(u, v, params, "zero", 8, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_mega_runtime_params_reuse_and_parity(rng):
    """Runtime-parameter mode tracks static folding within FMA-contraction
    ulps (the megakernel's surrounding DMA/loop graph makes the compiler's
    mul+add contraction choices context-dependent, unlike the windowed
    kernel where the modes stay bitwise — test_pallas.py), and neither
    parameter changes nor different step totals / block counts build a
    new executable."""
    p = Parameters(feed_rate=0.029, kill_rate=0.057)
    u, v = random_uv(rng, (24, 16))
    ru, rv = run_mega(u, v, p, "naive", 16, block_rows=8,
                      runtime_params=True)
    su, sv = run_mega(u, v, p, "naive", 16, block_rows=8,
                      runtime_params=False)
    np.testing.assert_allclose(ru, su, rtol=0, atol=1e-7)
    np.testing.assert_allclose(rv, sv, rtol=0, atol=1e-7)

    size = mk.megastep._cache_size()
    for p2, steps in ((Parameters(feed_rate=0.04), 16),
                      (Parameters(kill_rate=0.06), 32)):
        run_mega(u, v, p2, "naive", steps, block_rows=8,
                 runtime_params=True)
        assert mk.megastep._cache_size() == size, (
            "parameter/step-count change recompiled the megakernel"
        )


def test_mega_auto_selection(params):
    """'auto' picks mega on hardware-like f32 runs; pins, bf16, fold and
    interpret keep the windowed engine; engine='mega' validates."""
    sim = PallasSimulation(params, interpret=False)
    sim.interpret = False
    # VMEM-resident-size domains prefer the resident kernel (hardware:
    # 43.3 vs 39.4 Gcell/s at 1080x1920); everything bigger goes mega
    assert not sim._use_mega((1080, 1920), None)
    assert sim._use_resident((1080, 1920), None)
    assert sim._use_mega((4096, 4096), None)
    # explicit windowed knobs mean "the windowed kernel with these knobs"
    pinned = PallasSimulation(params, block_rows=256, interpret=False)
    pinned.interpret = False
    assert not pinned._use_mega((1080, 1920))
    kpin = PallasSimulation(params, steps_per_call=16, interpret=False)
    kpin.interpret = False
    assert not kpin._use_mega((1080, 1920))
    off = PallasSimulation(params, engine="windowed", interpret=False)
    off.interpret = False
    assert not off._use_mega((64, 64))
    # bf16 storage is supported behind an explicit mega pin, but the
    # auto static default keeps bf16 on the windowed kernel (where its
    # +4.6% deep-K result was measured)
    bf16 = PallasSimulation(params, dtype="bfloat16", engine="mega",
                            interpret=False)
    bf16.interpret = False
    assert bf16._use_mega((4096, 4096))
    bf16_auto = PallasSimulation(params, dtype="bfloat16", interpret=False)
    bf16_auto.interpret = False
    assert not bf16_auto._use_mega((4096, 4096), None)
    with pytest.raises(ValueError):
        PallasSimulation(params, engine="nope")
    folded = PallasSimulation(params, fold=2, engine="mega",
                              interpret=False)
    folded.interpret = False
    with pytest.raises(ValueError):
        folded._use_mega((1080, 1920))


def test_choose_mega_rows_geometry():
    """Row blocks are padding-free where possible, prefer >= 2 blocks
    (prefetchable), and always clear the compile ceiling + VMEM tier."""
    tr = mk.choose_mega_rows(1080, 1920)
    # 2 blocks; 540 isn't sublane-aligned, so 544 with 8 padded rows
    assert tr == 544  # window (560, 1920)
    tr4k = mk.choose_mega_rows(4096, 4096)
    assert 4096 % tr4k == 0 or -(-4096 // tr4k) * tr4k - 4096 < tr4k
    assert ps.window_compile_ok(tr4k, 8, 4096, steps=8)
    assert mk.mega_ok((1080, 1920)) and mk.mega_ok((4096, 4096))
    # very wide domains exceed the full-width VMEM budget at ANY row
    # tile -> the geometry heuristic switches to column-tiled windows
    assert not mk.mega_ok((4096, 262144), mk.choose_mega_rows(4096, 262144))
    assert mk.mega_ok((4096, 262144))  # geometry resolution: column tiles
    tr, tc = mk.choose_mega_geometry(4096, 262144)
    assert tc is not None and tc % 128 == 0
    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.params import Parameters

    sim = PallasSimulation(Parameters(), boundary="zero", interpret=True)
    sim.interpret = False
    # (4096, 65536): full-width windows fit only at tr=8 (3x halo
    # redundancy); the column-tiled geometry brings redundancy under the
    # 1.3 gate, so auto now takes the megakernel WITH column tiles
    assert sim._use_mega((4096, 65536), None)
    trw, tcw = sim._mega_tiles((4096, 65536))
    assert tcw is not None
    assert mk.mega_window_cells(4096, 65536, trw, tcw) <= \
        1.3 * 4096 * 65536


def test_mega_guards_apply_naive_compile_derate():
    """The naive boundary's heavier per-step graph derates the Mosaic
    compile ceiling (NAIVE_COMPILE_DERATE); the megakernel guards must
    thread the boundary into window_compile_ok like the windowed guard
    does (round-2 review: mega_ok ignored boundary entirely). With the
    current VMEM constants the derate band is unreachable for
    two-species mega windows — the VMEM estimate binds first, verified
    by exhaustive scan — so this pins the consistency property: every
    geometry the choosers emit for 'naive' clears the DERATED ceiling,
    and the shipped naive verdicts stay valid under it."""
    for shape in ((1080, 1920), (4096, 4096), (8192, 8192),
                  (16384, 16384), (4096, 32768)):
        tr, tc = mk.choose_mega_geometry(*shape, boundary="naive")
        wc = tc + 2 * ps.COL_HALO if tc is not None else shape[1]
        assert ps.window_compile_ok(tr, 8, wc, "naive", steps=8), shape
        assert mk.mega_ok(shape, tr, tc=tc, boundary="naive"), shape
    # shipped-verdict geometries stay valid under the derate
    assert mk.mega_ok((4096, 4096), boundary="naive")
    assert mk.mega_ok((16384, 16384), 72, boundary="naive")  # defaults.py


def test_choose_mega_geometry():
    """Full-width windows stay preferred wherever they are efficient
    (contiguous DMA, no column halo); column tiles take over only when
    thin full-width row tiles cost more window cells than the column
    halo does (measured crossover: c = 16384)."""
    for shape in ((1080, 1920), (2048, 2048), (4096, 4096), (8192, 8192)):
        tr, tc = mk.choose_mega_geometry(*shape)
        assert tc is None, shape
        assert tr == mk.choose_mega_rows(*shape)
    tr, tc = mk.choose_mega_geometry(16384, 16384)
    assert tc is not None and tc % 128 == 0 and tc < 16384
    assert mk.mega_ok((16384, 16384), tr, tc=tc)
    # the tiled geometry must actually beat full-width on window cells
    tr_fw = mk.choose_mega_rows(16384, 16384)
    assert mk.mega_window_cells(16384, 16384, tr, tc) < \
        mk.mega_window_cells(16384, 16384, tr_fw, None)
    # column tiling is plain two-species only
    assert mk.choose_mega_geometry(16384, 16384, species=1)[1] is None
    assert mk.choose_mega_geometry(16384, 16384, strip_store=True)[1] is None
    assert not mk.mega_ok((16384, 16384), tr, tc=tc, strip_store=True)


def test_mega_bf16_storage(params):
    """bf16 storage with the megakernel engine: pairs ride HBM in bf16,
    windows upcast to f32 on load and round once per K-step block on
    store (the windowed kernel's policy; same documented
    not-bit-compatible caveat as --pallas-dtype bfloat16 elsewhere)."""
    import jax.numpy as jnp

    from grayscott_tpu.species import initial_uv

    u0, v0 = initial_uv((32, 16))
    ou, ov = oracle.run(u0, v0, params, 16)
    sim = PallasSimulation(params, boundary="naive", interpret=True,
                           engine="mega", block_rows=8, dtype="bfloat16")
    species = sim.make_species((32, 16))
    species.storage = sim.build_storage(u0, v0)
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    assert gu.dtype == np.float32  # host view is f32 regardless
    assert species.storage[1].dtype == jnp.bfloat16
    np.testing.assert_allclose(gu, ou, rtol=0, atol=0.05)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=0.05)


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("shape,tr,steps", [
    ((32, 16), 8, 24),   # B=4, 3 time blocks (odd: final parity copy)
    ((40, 16), 8, 32),   # B=5 (odd B: slot parity flips across blocks)
    ((37, 16), 8, 16),   # B=5 with a padded last block, even blocks
])
def test_mega_seamless_pipeline_parity(rng, params, boundary, shape,
                                       tr, steps):
    """B >= 4 single-chip runs take the seamless flat-loop pipeline
    (cross-time-boundary window prefetch, no per-block drain); its
    semaphore ordering and traced (t, b) decomposition must reproduce
    the oracle across even/odd block counts and odd B."""
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, steps, boundary)
    gu, gv = run_mega(u, v, params, boundary, steps, block_rows=tr)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_mega_seamless_bitwise_matches_two_loop(rng, params):
    """The seamless pipeline reorders DMA waits only: outputs must be
    BIT-identical to the two-loop form (forced via a sharded-shaped
    n_shards=1 path is not available, so compare B=4 seamless against
    B=2 two-loop on the same domain via the windowed reference)."""
    u, v = random_uv(rng, (32, 16))
    # B=4 -> seamless
    g4u, g4v = run_mega(u, v, params, "naive", 16, block_rows=8)
    # B=2 -> two-loop legacy path, same kernel math
    g2u, g2v = run_mega(u, v, params, "naive", 16, block_rows=16)
    np.testing.assert_array_equal(g4u, g2u)
    np.testing.assert_array_equal(g4v, g2v)


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("shape,tr,tc,steps", [
    ((40, 640), 8, 256, 24),   # Br=5 x Bc=3: seamless, odd time blocks
    ((19, 384), 8, 128, 19),   # Br=3 x Bc=3: seamless, padded rows + rem-3
    ((24, 260), 16, 128, 16),  # Br=2 x Bc=3: two-loop form, padded cols
])
def test_mega_column_tiled_parity(rng, params, boundary, shape, tr, tc,
                                  steps):
    """Column-tiled megakernel windows (flat (row, column) block loop,
    column-sliced DMAs, 128-lane halo ring, per-window traced gcol)
    against the oracle — seamless and two-loop forms, padded rows and
    columns, remainder calls, both boundaries."""
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, steps, boundary)
    gu, gv = run_mega(u, v, params, boundary, steps, block_rows=tr,
                      block_cols=tc)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_mega_column_tiled_matches_full_width(rng, params):
    """Same domain, same row tile: the column-tiled kernel must agree
    with the full-width megakernel to FMA-contraction ulps (the naive
    fix-up strips and window geometry change the compiler's contraction
    context, same budget as the fold/pack layouts)."""
    u, v = random_uv(rng, (32, 512))
    fu, fv = run_mega(u, v, params, "naive", 16, block_rows=8)
    cu, cv = run_mega(u, v, params, "naive", 16, block_rows=8,
                      block_cols=256)
    np.testing.assert_allclose(cu, fu, rtol=0, atol=3e-7)
    np.testing.assert_allclose(cv, fv, rtol=0, atol=3e-7)


def test_mega_column_tiled_bf16(rng, params):
    """bf16 storage composes with column tiling (bf16 window DMA slices,
    f32 compute, per-block rounding)."""
    from grayscott_tpu.species import initial_uv

    u0, v0 = initial_uv((32, 384))
    ou, ov = oracle.run(u0, v0, params, 16)
    gu, gv = run_mega(u0, v0, params, "naive", 16, block_rows=8,
                      block_cols=128, dtype="bfloat16")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=0.05)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=0.05)


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
def test_mega_column_tiled_race_free(rng, params, dma_mode):
    """The column-tiled flat loop under the interpret-mode vector-clock
    race detector: the B - Bc >= 4 seamless gate's cross-boundary
    prefetch must stay semaphore-ordered under both DMA extremes."""
    from jax.experimental.pallas import tpu as pltpu

    u, v = random_uv(rng, (40, 640))  # Br=5 x Bc=3: seamless
    sim = PallasSimulation(params, boundary="zero", engine="mega",
                           interpret=True, block_rows=8, block_cols=256)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((40, 640))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 24)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 24, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
def test_mega_seamless_race_free(rng, params, dma_mode):
    """The seamless flat-loop pipeline under the interpret mode's
    vector-clock race detector: its deferred out-waits and
    cross-time-boundary prefetches must leave no read-after-write or
    slot-restage race, under both DMA interleaving extremes."""
    from jax.experimental.pallas import tpu as pltpu

    u, v = random_uv(rng, (40, 16))  # B=5 at tr=8: seamless, odd B
    sim = PallasSimulation(params, boundary="zero", engine="mega",
                           interpret=True, block_rows=8)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((40, 16))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 24)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 24, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


@pytest.mark.parametrize("kw", [
    dict(block_rows=16),                      # full-width pairs
    dict(block_rows=8, block_cols=128),       # column-tiled pairs
    dict(block_rows=16, dtype="bfloat16"),    # bf16 storage upcast
])
def test_mega_extract_result_matches_uv(rng, params, kw):
    """extract_result (the jitted fused V crop that avoids materializing
    U's view — at 32768^2 bf16 the eager path ResourceExhausts the chip)
    must equal extract_uv()[1] exactly."""
    shape = (40, 384)
    u, v = random_uv(rng, shape)
    sim = PallasSimulation(params, boundary="naive", engine="mega",
                           interpret=True, **kw)
    storage = sim.build_storage(u, v)
    ref = sim.extract_uv(storage, shape)[1]
    out = sim.extract_result(storage, shape)
    assert out.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("shape,tr,steps", [
    ((48, 16), 8, 16),   # B=6: interior blocks 1..4 take the fast path
    ((40, 16), 8, 24),   # B=5, odd time blocks
    ((37, 16), 8, 16),   # padded last block: edge path must catch it
    ((32, 16), 16, 16),  # B=2: no interior blocks (pred never true)
])
def test_mega_specialize_ulp_parity(rng, params, boundary, shape, tr,
                                   steps):
    """Interior/edge block specialization (VERDICT r3 #3, the regular
    backend's center/edge split, compute/regular/src/lib.rs:49-62):
    every op the interior branch retains computes the same VALUES, but
    compiling the steppers inside ``lax.cond`` branches changes the
    compiler's FMA-contraction choices — ulp-scale drift, the same
    budget as fold/pack/strip_store (measured: <= 8e-9 absolute, even
    when no interior block ever executes). Specialize is therefore an
    OPT-IN performance mode; the bit-frozen naive default stays
    unspecialized."""
    u, v = random_uv(rng, shape)
    gu, gv = run_mega(u, v, params, boundary, steps, block_rows=tr)
    su, sv = run_mega(u, v, params, boundary, steps, block_rows=tr,
                      mega_specialize=True)
    np.testing.assert_allclose(su, gu, rtol=0, atol=3e-7)
    np.testing.assert_allclose(sv, gv, rtol=0, atol=3e-7)


def test_mega_specialize_fuzz(rng, params):
    """Randomized geometry fuzz for the specialized kernel: odd shapes,
    padded blocks, remainder steps — ulp-budget against unspecialized."""
    for _ in range(6):
        r = int(rng.randint(17, 80))
        c = int(rng.randint(1, 3)) * 16
        tr = 8 * int(rng.randint(1, 3))
        steps = int(rng.randint(1, 30))
        boundary = ["naive", "zero"][int(rng.randint(0, 2))]
        u, v = random_uv(rng, (r, c))
        gu, gv = run_mega(u, v, params, boundary, steps, block_rows=tr)
        su, sv = run_mega(u, v, params, boundary, steps, block_rows=tr,
                          mega_specialize=True)
        np.testing.assert_allclose(su, gu, rtol=0, atol=3e-7,
                                   err_msg=str((r, c, tr, steps, boundary)))
        np.testing.assert_allclose(sv, gv, rtol=0, atol=3e-7)


@pytest.mark.parametrize("depth", [3, 4])
@pytest.mark.parametrize("shape,tr,steps", [
    ((64, 16), 8, 24),   # B=8: depth 3 and 4 both eligible
    ((67, 16), 8, 16),   # padded last block
])
def test_mega_depth_bitwise(rng, params, depth, shape, tr, steps):
    """The D-slot DMA ring (VERDICT r3 #2) reorders waits only: outputs
    must be bit-identical to the double-buffered kernel."""
    u, v = random_uv(rng, shape)
    gu, gv = run_mega(u, v, params, "naive", steps, block_rows=tr)
    du, dv = run_mega(u, v, params, "naive", steps, block_rows=tr,
                      mega_depth=depth)
    np.testing.assert_array_equal(du, gu)
    np.testing.assert_array_equal(dv, gv)


def test_mega_depth_falls_back_when_ineligible(rng, params):
    """depth > 2 on a domain too short for the seamless guard silently
    runs the double buffer (no dead VMEM slots, same results)."""
    u, v = random_uv(rng, (32, 16))  # B=2 at tr=16: two-loop form
    ou, ov = oracle.run(u, v, params, 16, "zero")
    du, dv = run_mega(u, v, params, "zero", 16, block_rows=16,
                      mega_depth=4)
    np.testing.assert_allclose(du, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(dv, ov, rtol=0, atol=2e-6)


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
@pytest.mark.parametrize("kw", [
    dict(mega_depth=4),
    dict(mega_specialize=True),
    dict(mega_depth=3, mega_specialize=True),
])
def test_mega_depth_specialize_race_free(rng, params, dma_mode, kw):
    """Deep-ring and specialized kernels under the vector-clock race
    detector, both DMA interleaving extremes."""
    from jax.experimental.pallas import tpu as pltpu

    u, v = random_uv(rng, (64, 16))  # B=8 at tr=8
    sim = PallasSimulation(params, boundary="naive", engine="mega",
                           interpret=True, block_rows=8, **kw)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((64, 16))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 24)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 24, "naive")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


@pytest.mark.parametrize("shape,tr,steps", [
    ((48, 16), 8, 24),
    ((37, 16), 8, 16),   # padded last block
    ((19, 32), 8, 9),    # remainder call
])
def test_mega_naive_fold_ulp_parity(rng, params, shape, tr, steps):
    """Folded naive reaction (VERDICT r3 #3, opt-in): per-window
    coefficient fields replace the b_field subtract and the naive-
    ordered reaction; quirk strips re-derived narrow. Must agree with
    the bit-frozen naive path to the usual reassociation budget."""
    u, v = random_uv(rng, shape)
    gu, gv = run_mega(u, v, params, "naive", steps, block_rows=tr)
    fu, fv = run_mega(u, v, params, "naive", steps, block_rows=tr,
                      naive_fold=True)
    np.testing.assert_allclose(fu, gu, rtol=0, atol=3e-6)
    np.testing.assert_allclose(fv, gv, rtol=0, atol=3e-6)


def test_mega_naive_fold_long_run_oracle(rng, params):
    """Error growth over hundreds of steps stays in the fold/pack
    budget class against the oracle."""
    u, v = random_uv(rng, (40, 16))
    ou, ov = oracle.run(u, v, params, 240, "naive")
    fu, fv = run_mega(u, v, params, "naive", 240, block_rows=8,
                      naive_fold=True)
    np.testing.assert_allclose(fu, ou, rtol=0, atol=1e-4)
    np.testing.assert_allclose(fv, ov, rtol=0, atol=1e-4)


def test_windowed_naive_fold_matches_mega_mode(rng, params):
    """The windowed engine shares the folded stepper: both engines'
    fold modes agree to reassociation tolerance."""
    from grayscott_tpu.backends.pallas import PallasSimulation

    u, v = random_uv(rng, (32, 16))
    outs = []
    for engine in ("mega", "windowed"):
        sim = PallasSimulation(params, boundary="naive", interpret=True,
                               engine=engine, block_rows=8,
                               naive_fold=True)
        sp = sim.make_species((32, 16))
        sp.storage = sim.build_storage(u, v)
        sim.perform_steps(sp, 16)
        outs.append(sp.uv_host())
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=0, atol=3e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=0, atol=3e-6)


def test_naive_fold_specialize_compose(rng, params):
    """naive_fold composes with interior/edge specialization: interior
    blocks then drop mask+top-fix on top of the folded reaction."""
    u, v = random_uv(rng, (48, 16))
    gu, gv = run_mega(u, v, params, "naive", 16, block_rows=8)
    fu, fv = run_mega(u, v, params, "naive", 16, block_rows=8,
                      naive_fold=True, mega_specialize=True)
    np.testing.assert_allclose(fu, gu, rtol=0, atol=3e-6)
    np.testing.assert_allclose(fv, gv, rtol=0, atol=3e-6)


def test_naive_fold_rejections(params):
    """Matrix rules: naive_fold excludes zero boundary, strip-store,
    lane-fold pins, and forced residency."""
    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.errors import UnsupportedConfigError

    for kw in (dict(boundary="zero"),
               dict(boundary="naive", naive_fix="store"),
               dict(boundary="naive", fold=2),
               dict(boundary="naive", resident="on")):
        with pytest.raises(UnsupportedConfigError):
            PallasSimulation(params, interpret=True, naive_fold=True, **kw)


def test_mega_deep_halo_exceeding_tr_is_oracle_exact(rng, params):
    """halo > tr single-chip: the seamless pipeline's safety argument
    (a window reaches at most ONE neighboring row block) does not hold,
    so these configs must take the draining two-loop form and stay
    exact (round-4 review)."""
    u, v = random_uv(rng, (32, 16))
    tr, halo, steps = 8, 16, 16
    up, vp = mk.mega_pad_state(u, v, tr, halo)
    um, vm = mk.megastep(
        jnp.asarray(up), jnp.asarray(vp), jnp.int32(2), None,
        steps=steps, tr=tr, r=32, params=params, boundary="naive",
        halo=halo, interpret=True,
    )
    ou, ov = oracle.run(u, v, params, 32, "naive")
    np.testing.assert_allclose(np.asarray(um[0, halo:halo + 32]), ou,
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm[0, halo:halo + 32]), ov,
                               rtol=0, atol=1e-6)


def test_mega_ok_rejects_unaligned_tr():
    """mega_ok must answer False for tiles megastep_impl rejects
    (round-4 review: a tr=12 pin passed the support gate, then died at
    run time instead of falling back)."""
    assert not mk.mega_ok((1080, 1920), 12)
    assert not mk.mega_ok((1080, 1920), 4)
    assert mk.mega_ok((1080, 1920), 16)


def test_mega_specialize_with_tc_uniform_error(rng, params):
    """Direct ops-level specialize + column tiling: the uniform
    UnsupportedConfigError, not an opaque trace-time failure from
    pallas_stencil (round-4 review)."""
    from grayscott_tpu.errors import UnsupportedConfigError

    u, v = random_uv(rng, (16, 640))
    up, vp = mk.mega_pad_state(u, v, 8, 8, tc=256)
    with pytest.raises(UnsupportedConfigError, match="full-width"):
        mk.megastep(
            jnp.asarray(up), jnp.asarray(vp), jnp.int32(1), None,
            steps=8, tr=8, r=16, params=params, boundary="zero",
            halo=8, tc=256, c_dom=640, specialize=True, interpret=True,
        )
