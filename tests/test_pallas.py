"""Pallas kernel numerics validation (interpreter mode on CPU) against the
NumPy oracle — covering temporal blocking depths, both boundary semantics,
tile/domain edge interactions and all stencils."""

import jax.numpy as jnp
import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.params import Parameters, STENCILS
from grayscott_tpu.species import initial_uv

from conftest import random_uv


def run_pallas(u, v, params, boundary, steps, **kw):
    sim = PallasSimulation(params, boundary=boundary, interpret=True, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("steps", [1, 3, 8])
def test_multistep_parity(rng, params, boundary, steps):
    """K steps fused in VMEM == K oracle steps (24 rows => 3 tiles of 8)."""
    u, v = random_uv(rng, (24, 16))
    ou, ov = oracle.run(u, v, params, steps, boundary)
    gu, gv = run_pallas(u, v, params, boundary, steps, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


@pytest.mark.parametrize("stencil", list(STENCILS))
def test_all_stencils(rng, stencil):
    params = Parameters.with_stencil(stencil)
    u, v = random_uv(rng, (16, 16))
    ou, ov = oracle.run(u, v, params, 4, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 4, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_unaligned_rows(rng, params):
    """R not a multiple of the tile => internal padding rows stay inert."""
    u, v = random_uv(rng, (19, 16))
    ou, ov = oracle.run(u, v, params, 5, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 5, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_steps_not_multiple_of_k(rng, params):
    """steps=11 with K=4 => 2 full calls + remainder-3 call."""
    u, v = random_uv(rng, (16, 16))
    ou, ov = oracle.run(u, v, params, 11, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 11, block_rows=8,
                        steps_per_call=4)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_standard_init_long(params):
    """16 steps from the standard init box (two fused K=8 batches)."""
    u0, v0 = initial_uv((32, 48))
    ou, ov = oracle.run(u0, v0, params, 16)
    gu, gv = run_pallas(u0, v0, params, "naive", 16, block_rows=16)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_bad_steps_per_call(params):
    with pytest.raises(ValueError):
        PallasSimulation(params, steps_per_call=33)
    with pytest.raises(ValueError):
        PallasSimulation(params, steps_per_call=0)


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_column_tiling_parity(rng, params, boundary):
    """2-D grid (row x column tiles): (24, 256) with tc=128 => 3x2 tiles;
    the 128-column halo ring absorbs lateral invalidation."""
    u, v = random_uv(rng, (24, 256))
    ou, ov = oracle.run(u, v, params, 3, boundary)
    gu, gv = run_pallas(u, v, params, boundary, 3, block_rows=8,
                        block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_column_tiling_unaligned(rng, params):
    """C not a multiple of tc => extra padded columns stay inert."""
    u, v = random_uv(rng, (19, 200))
    ou, ov = oracle.run(u, v, params, 5, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 5, block_rows=8,
                        block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_column_tiling_multicall(rng, params):
    """Column tiling through run_blocks + remainder executables."""
    u, v = random_uv(rng, (16, 256))
    ou, ov = oracle.run(u, v, params, 11, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 11, block_rows=8,
                        block_cols=128, steps_per_call=4)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_choose_block_cols_heuristic():
    from grayscott_tpu.ops import pallas_stencil as ps

    # all measured domains stay full-width
    assert ps.choose_block_cols(4096) is None
    assert ps.choose_block_cols(8192) is None
    for c in (16384, 32768, 65536, 100000):
        tc = ps.choose_block_cols(c)
        assert tc is not None and tc % 128 == 0 and tc >= 512
        n = -(-c // tc)
        assert n * tc - c < 128 * n  # balanced: little round-up padding
        # window pair fits the budget
        assert (192 + 32) * (tc + 2 * ps.COL_HALO) * 8 <= 26 << 20


def test_choose_vmem_limit_covers_measured_liveness():
    """Regression: the v5e compiler reports 67.61 MB scoped for the
    (288, 4096) f32 anchor window (tr=256, K=16, zero) — the 64 MB tier
    OOMed exactly that config (.devrate_b.log). The anchor shape and
    anything bigger must land on a tier above the measured liveness."""
    from grayscott_tpu.ops import pallas_stencil as ps

    measured = 67.61 * (1 << 20)
    assert ps.choose_vmem_limit(256, 16, 4096) > measured
    # naive keeps more alive; the validated naive config stays <= 100 MB
    assert ps.choose_vmem_limit(256, 16, 4096, boundary="naive") == 100 << 20
    # small windows keep the cheap tier (stable compile-cache keys)
    assert ps.choose_vmem_limit(192, 16, 1920) == 64 << 20
    # nothing ever exceeds the 120 MB ceiling
    assert ps.choose_vmem_limit(512, 32, 32768) == 120 << 20


def test_deep_halo_k16(rng, params):
    """steps_per_call=9 -> halo rounds up to 16: the deep-halo path stays
    exact. (9 not 16 unrolled steps: interpret-mode XLA compile time blows
    up with the unroll count.)"""
    u, v = random_uv(rng, (16, 16))
    ou, ov = oracle.run(u, v, params, 9, "naive")
    gu, gv = run_pallas(u, v, params, "naive", 9, block_rows=8,
                        steps_per_call=9)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_bf16_fast_mode(params):
    """Opt-in bfloat16 mode: same dynamics within bf16 precision (the
    reference is strictly f32, data/src/lib.rs:11 — this is a
    beyond-reference fast mode, documented as not bit-compatible)."""
    import jax.numpy as jnp

    u0, v0 = initial_uv((32, 48))
    ou, ov = oracle.run(u0, v0, params, 16)
    sim = PallasSimulation(params, boundary="naive", interpret=True,
                           block_rows=16, dtype="bfloat16")
    species = sim.make_species((32, 48))
    species.storage = sim.build_storage(u0, v0)
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    assert gu.dtype == np.float32  # host view is f32 regardless
    assert sim.dtype == jnp.bfloat16
    np.testing.assert_allclose(gu, ou, rtol=0, atol=0.05)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=0.05)
    # and it must actually be bf16 underneath
    assert species.storage[0] == "windowed"
    assert species.storage[1].dtype == jnp.bfloat16
    # the V-only snapshot view (fused crop + upcast) matches extract_uv
    vr = np.asarray(sim.extract_result(species.storage, species.shape))
    np.testing.assert_array_equal(vr, gv)


def test_choose_block_rows_minimizes_window_volume():
    """Tile heights minimize total window rows ceil(r/tr)*(tr+2*halo) —
    padding waste counts (ADVICE r1: the old rule padded naive 1080p from
    1080 to 1464 rows, ~36% masked compute)."""
    from grayscott_tpu.ops.pallas_stencil import choose_block_rows

    # with the v3-kernel naive derate (1.05; (256,16)x4096-naive compiles
    # and measures 56.7, sweep r2-v3b) both boundaries share the measured
    # zero champions; the padding-scored 360 (3x392) would win at 1080p
    # if 544 were ever re-closed by the ceiling
    assert choose_block_rows(1080, 1920, boundary="naive") == 544
    assert choose_block_rows(1080, 1920, boundary="zero") == 544
    assert choose_block_rows(4096, 4096, boundary="zero") == 256
    assert choose_block_rows(4096, 4096, boundary="naive") == 256
    assert choose_block_rows(8192, 8192, boundary="zero") == 120
    # a domain shorter than one tile clamps to its padded height
    assert choose_block_rows(24, 32) == 24


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_runtime_params_bit_identical_to_static(rng, boundary):
    """The SMEM runtime-parameter mode is bit-identical to trace-time
    constant folding (same f32 rounding, same op order)."""
    p = Parameters(feed_rate=0.029, kill_rate=0.057, time_step=0.8)
    u, v = random_uv(rng, (24, 16))
    ru, rv = run_pallas(u, v, p, boundary, 7, block_rows=8,
                        runtime_params=True)
    su, sv = run_pallas(u, v, p, boundary, 7, block_rows=8,
                        runtime_params=False)
    np.testing.assert_array_equal(ru, su)
    np.testing.assert_array_equal(rv, sv)


def test_runtime_params_reuse_executable(rng, params):
    """Changing feed/kill/dt must NOT build a new kernel executable in
    runtime-parameter mode (the livesim-slider recompile fix): the jit
    caches of multistep/run_blocks stay flat across parameter changes."""
    from grayscott_tpu.ops import pallas_stencil as ps

    u, v = random_uv(rng, (16, 16))

    def run(p):
        sim = PallasSimulation(p, boundary="naive", interpret=True,
                               block_rows=8, runtime_params=True)
        species = sim.make_species(u.shape)
        species.storage = sim.build_storage(u, v)
        sim.perform_steps(species, 17)  # exercises run_blocks AND multistep
        return (ps.multistep._cache_size(), ps.run_blocks._cache_size())

    sizes = run(Parameters())  # first variant pays the compiles
    for p in (Parameters(feed_rate=0.03),
              Parameters(feed_rate=0.045, kill_rate=0.06)):
        now = run(p)
        assert now == sizes, (
            f"parameter change recompiled the kernel: {sizes} -> {now}"
        )
    # dt moving off the 1.0 default recompiles ONCE (the dt_is_one
    # specialization loses its folded multiplies) ...
    sizes_dt = run(Parameters(time_step=0.5))
    assert sizes_dt > sizes
    # ... and further dt/f/k changes reuse the general executable
    assert run(Parameters(time_step=0.25, feed_rate=0.02)) == sizes_dt
    # a structural change (different stencil) SHOULD recompile
    sim = PallasSimulation(Parameters.with_stencil("5points"),
                           boundary="naive", interpret=True, block_rows=8,
                           runtime_params=True)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 17)
    assert ps.multistep._cache_size() > sizes[0]


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("shape", [(24, 16), (17, 23)])
def test_resident_kernel_parity(rng, params, boundary, shape):
    """The VMEM-resident whole-domain kernel (zero-filled row shifts,
    in-kernel fori_loop, optional domain-mask skip on exact-fit shapes)
    matches the oracle for aligned AND unaligned domains."""
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, 7, boundary)
    gu, gv = run_pallas(u, v, params, boundary, 7, resident="on")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_resident_step_count_is_traced(rng, params):
    """Different step counts (snapshot cadences) reuse one executable."""
    from grayscott_tpu.ops import pallas_stencil as ps

    u, v = random_uv(rng, (16, 16))
    sim = PallasSimulation(params, boundary="naive", interpret=True,
                           resident="on")
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 3)
    size = ps.resident_multistep._cache_size()
    sim.perform_steps(species, 11)
    sim.perform_steps(species, 1)
    assert ps.resident_multistep._cache_size() == size
    ou, ov = oracle.run(u, v, params, 15, "naive")
    gu, gv = species.uv_host()
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)


def test_resident_auto_selection(params):
    """'auto' picks resident only on hardware-like settings with no pins;
    pins and big domains keep the windowed kernel."""
    from grayscott_tpu.ops import pallas_stencil as ps

    sim = PallasSimulation(params, interpret=False)
    sim.interpret = False
    assert sim._use_resident((1080, 1920))
    assert not sim._use_resident((4096, 4096))  # state > budget
    assert ps.resident_ok((1080, 1920)) and not ps.resident_ok((2048, 2048))
    # geometry-dependent liveness envelope: equal-byte shapes outside the
    # validated 1080x1920 family fail on hardware and must be declined
    assert not ps.resident_ok((540, 3840))   # OOMs even at a 126 MB limit
    assert not ps.resident_ok((2160, 1024))  # OOMs at the 120 MB default
    assert ps.resident_ok((1600, 960)) and ps.resident_ok((400, 3840))
    pinned = PallasSimulation(params, block_rows=256, interpret=False)
    pinned.interpret = False
    assert not pinned._use_resident((1080, 1920))
    off = PallasSimulation(params, resident="off", interpret=False)
    off.interpret = False
    assert not off._use_resident((64, 64))


def test_resident_pin_conflicts_rejected(params):
    """resident='on' is f32-only and excludes a pinned lane fold — the
    conflicting combination errors up front (like engine='mega' on bf16)
    instead of silently running a different configuration."""
    import pytest

    with pytest.raises(ValueError, match="float32"):
        PallasSimulation(params, resident="on", dtype="bfloat16")
    with pytest.raises(ValueError, match="fold"):
        PallasSimulation(params, boundary="zero", resident="on", fold=2)


def test_sanitize_on_load_bit_identical(rng, params):
    """Masking garbage padding on window load == pre-zeroed HBM padding,
    bit for bit (the padding cells were exactly 0.0 either way), across
    multiple K-blocks whose out-buffer padding really is uninitialized
    garbage between calls."""
    from grayscott_tpu.ops import pallas_stencil as ps

    u, v = random_uv(rng, (19, 16))
    up, vp = ps.pad_state(u, v, 8)
    a = ps.run_blocks(np.asarray(up), np.asarray(vp), -8, 19, 3,
                      steps=4, tr=8, params=params, boundary="naive",
                      halo=8, interpret=True, sanitize=False)
    b = ps.run_blocks(np.asarray(up), np.asarray(vp), -8, 19, 3,
                      steps=4, tr=8, params=params, boundary="naive",
                      halo=8, interpret=True, sanitize=True)
    np.testing.assert_array_equal(np.asarray(a[0])[8:27],
                                  np.asarray(b[0])[8:27])
    np.testing.assert_array_equal(np.asarray(a[1])[8:27],
                                  np.asarray(b[1])[8:27])


def test_resident_unroll_parity(rng, params):
    """The unrolled resident fori body (+ single-step tail loop for the
    remainder) advances exactly the same steps as the plain loop, within
    FMA-contraction ulps (regrouping steps across graphs changes
    contraction — same property class as the windowed path's remainder
    kernel; a fixed CLI cadence replays one executable, so
    checkpoint/resume stays bitwise, tested in test_checkpoint)."""
    import jax.numpy as jnp

    from grayscott_tpu.ops import pallas_stencil as ps

    u, v = random_uv(rng, (16, 16))
    args = dict(r=16, c=16, params=params, boundary="zero", interpret=True)
    for steps in (1, 3, 10):
        a = ps.resident_multistep_impl(
            jnp.asarray(u), jnp.asarray(v), jnp.int32(steps), **args
        )
        b = ps.resident_multistep_impl(
            jnp.asarray(u), jnp.asarray(v), jnp.int32(steps), unroll=3,
            **args
        )
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=0, atol=2e-7)
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   rtol=0, atol=2e-7)


def test_row_tile_smaller_than_halo_stays_exact(rng, params):
    """tr < halo (a user block_rows pin under the deep-K default): the
    naive quirk strips and masks must stay anchored to GLOBAL row/column
    positions in every window, including windows where domain row 0 sits
    mid-window (round-4 review scenario — held, pinned here)."""
    u, v = random_uv(rng, (32, 16))
    for boundary in ("naive", "zero"):
        sim = PallasSimulation(params, boundary=boundary, interpret=True,
                               engine="windowed", block_rows=8,
                               steps_per_call=16)
        species = sim.make_species((32, 16))
        species.storage = sim.build_storage(u, v)
        sim.perform_steps(species, 16)
        gu, gv = species.uv_host()
        ou, ov = oracle.run(u, v, params, 16, boundary)
        np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
        np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_untiled_column_halo_shallower_than_steps_rejected(rng, params):
    """chalo < steps on the UNTILED path (the 2-D sharded layout):
    lateral invalidation outruns the ring — must error, not silently
    corrupt shard-column seams (round-4 review)."""
    u, v = random_uv(rng, (16, 64))
    up, vp = ps.pad_state(u, v, 8, 16, chalo=8)
    with pytest.raises(ValueError, match="column halo"):
        ps.multistep_impl(
            jnp.asarray(up), jnp.asarray(vp), -16, 16, -8, 64,
            steps=16, tr=8, params=params, boundary="zero",
            halo=16, chalo=8, interpret=True,
        )


def test_choose_block_rows_errors_past_compile_ceiling():
    """When even the minimum tile exceeds the Mosaic compile ceiling,
    the chooser must error clearly instead of returning a geometry its
    own measurements say never compiles (round-4 review)."""
    from grayscott_tpu.errors import UnsupportedConfigError

    with pytest.raises(UnsupportedConfigError, match="column tiling"):
        ps.choose_block_rows(4096, 32768, halo=16, boundary="naive")


def test_strip_store_conflicts_with_fast_fold(rng, params):
    """multistep_impl must reject strip_store + fast_fold like megastep
    does, instead of silently dropping strip_store while budgeting its
    dead scratch (round-4 review)."""
    u, v = random_uv(rng, (16, 16))
    up, vp = ps.pad_state(u, v, 8, 8)
    with pytest.raises(ValueError, match="fast_fold"):
        ps.multistep_impl(
            jnp.asarray(up), jnp.asarray(vp), -8, 16,
            steps=8, tr=8, params=params, boundary="naive",
            halo=8, strip_store=True, fast_fold=True, interpret=True,
        )
