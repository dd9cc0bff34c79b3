"""Multi-chip megakernel validation: the whole step loop in ONE kernel
launch per chip, halo exchange via in-kernel remote DMAs (ICI), recv/send
counted-semaphore handshake (ops/megakernel.py ``n_shards > 1``,
parallel/halo.py sharded_mega_run).

Runs under the TPU interpret mode (``pltpu.InterpretParams``), which
simulates the device mesh, remote DMAs and semaphores on CPU — including
a vector-clock data-race detector that checks the kernel's barrier-free
exchange ordering argument. The reference has no analog of any of this
(its parallelism is shared-memory fork-join with implicit halos,
compute/parallel/src/lib.rs:29-121; its race safety is Rust's borrow
checker — SURVEY.md section 5 "race detection").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.backends.sharded import ShardedSimulation
from grayscott_tpu.params import Parameters

from conftest import random_uv


def run_sharded_mega(u, v, params, boundary, steps, n_devices=4, **kw):
    sim = ShardedSimulation(params, boundary=boundary, engine="mega",
                            n_devices=n_devices, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_sharded_mega_oracle_parity(rng, params, boundary):
    """4 row shards x 2 time blocks; 48 rows pad to 16-row slabs (the
    global bottom slab is half out-of-domain, exercising the sanitize
    masking across shards)."""
    u, v = random_uv(rng, (48, 16))
    ou, ov = oracle.run(u, v, params, 16, boundary)
    gu, gv = run_sharded_mega(u, v, params, boundary, 16, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_mega_odd_blocks_and_remainder(rng, params):
    """steps=27: 3 full K=8 time blocks (odd — the slot1->slot0 parity
    copy must carry the exchanged halos too) + a remainder-3 call, which
    re-enters the kernel and relies on the end-of-run exchange having
    left slot 0's halos fresh."""
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, 27, "naive")
    gu, gv = run_sharded_mega(u, v, params, "naive", 27, block_rows=8,
                              n_devices=2)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_sharded_mega_matches_single_chip_mega(rng, params):
    """The naive path's step math is bit-frozen: splitting the domain
    over 4 chips must reproduce the single-chip megakernel exactly —
    shard-boundary windows see the same values through exchanged halos
    as single-chip windows see through their own HBM rows."""
    u, v = random_uv(rng, (64, 16))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8)
    sp1 = sim1.make_species((64, 16))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega(u, v, params, "naive", 16, block_rows=8)
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
def test_sharded_mega_race_free(rng, params, dma_mode):
    """Run with the interpret mode's vector-clock race detector enabled:
    the barrier-free handshake (recv waits gate block entry; a neighbor
    sends only after the compute whose reads the send would race) must
    produce no detected race. Both DMA execution models are exercised —
    'eager' completes every copy at issue, 'on_wait' at the wait — two
    extreme interleavings of the same protocol."""
    u, v = random_uv(rng, (32, 16))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=4, block_rows=8)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((32, 16))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 16, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    # the detector records races in a module-global state object and also
    # prints them; assert none were flagged (private API, so guard it)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


def test_sharded_mega_single_device_mesh(rng, params):
    """A 1-device mesh compiles the plain (no remote ops) kernel — this
    is the configuration a single-chip user gets and the one the real
    TPU exercises in GRAYSCOTT_TEST_TPU runs."""
    u, v = random_uv(rng, (24, 16))
    ou, ov = oracle.run(u, v, params, 8, "zero")
    gu, gv = run_sharded_mega(u, v, params, "zero", 8, block_rows=8,
                              n_devices=1)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)


def test_sharded_mega_fuzz(rng, params):
    """Randomized geometry: prime-ish row counts (global bottom padding
    lands on different shards), 2/3/4-way meshes, step counts hitting
    every remainder/parity combination."""
    for _ in range(3):
        r = int(rng.randint(17, 80))
        c = 16 * int(rng.randint(1, 3))
        n = int(rng.choice([2, 3, 4]))
        steps = int(rng.randint(1, 25))
        u, v = random_uv(rng, (r, c))
        ou, ov = oracle.run(u, v, params, steps, "naive")
        gu, gv = run_sharded_mega(u, v, params, "naive", steps,
                                  n_devices=n, block_rows=8)
        np.testing.assert_allclose(
            gu, ou, rtol=0, atol=2e-6,
            err_msg=f"r={r} c={c} n={n} steps={steps}",
        )
        np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_sharded_mega_lowers_for_tpu(params):
    """Mosaic lowering gate (see tests/test_lowering.py): the remote-DMA
    exchange, LOGICAL device ids, semaphore waits and the traced
    my_shard scalar must all lower for real TPUs — jax.export runs the
    full Pallas->Mosaic pass client-side, so a lowering regression is
    caught here instead of on multi-chip hardware this repo never
    sees."""
    from grayscott_tpu.parallel import halo

    mesh = halo.make_mesh_1d(4)
    u = np.zeros((48, 16), np.float32)
    v = np.ones((48, 16), np.float32)
    up, vp, _ = halo.mega_shard_state(u, v, mesh, 8)

    def fn(up, vp, n):
        return halo.sharded_mega_run(
            up, vp, n, None, mesh=mesh, r_total=48, steps=8, tr=8,
            params=params, boundary="naive", interpret=False,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(up), jnp.asarray(vp), jnp.int32(2)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_sharded_mega_cli_end_to_end(tmp_path):
    """`simulate --backend sharded --sharded-engine mega` writes
    oracle-exact HDF5 through the full CLI pipeline (writer thread,
    snapshot chain) on a 2-device mesh."""
    from grayscott_tpu.cli import simulate
    from grayscott_tpu.io.hdf5 import Reader
    from grayscott_tpu.species import initial_uv

    out = tmp_path / "o.h5"
    rc = simulate.main([
        "-n", "2", "-r", "24", "-c", "32", "-e", "8",
        "--backend", "sharded", "--sharded-engine", "mega",
        "--sharded-devices", "2", "--pallas-block-rows", "8",
        "-o", str(out),
    ])
    assert rc == 0
    with Reader(out) as r:
        frames = list(r)
    u, v = initial_uv((24, 32))
    for frame in frames:
        u, v = oracle.run(u, v, Parameters(), 8)
        np.testing.assert_allclose(frame, v, rtol=0, atol=1e-5)


def test_sharded_mega_validations(params):
    with pytest.raises(ValueError, match="overlap"):
        ShardedSimulation(params, engine="mega", overlap=True)
    with pytest.raises(ValueError, match="windowed/mega"):
        ShardedSimulation(params, engine="resident")
    # an explicit steps-per-call is rejected, not silently overwritten
    with pytest.raises(ValueError, match="steps-per-call"):
        ShardedSimulation(params, engine="mega", steps_per_call=16)
    # asking for more devices than exist fails loudly (the windowed
    # engine's make_mesh reshape already does; keep mega symmetric)
    from grayscott_tpu.parallel import halo as h

    with pytest.raises(ValueError, match="devices"):
        h.make_mesh_1d(99)
    # the recv-wait placement assumes one tile row covers the halo depth
    from grayscott_tpu.ops import megakernel as mk

    pair = jnp.zeros((2, 16 + 8 + 16, 16), jnp.float32)
    with pytest.raises(ValueError, match="halo <= tr"):
        mk.megastep_impl(
            pair, pair, jnp.int32(1), None, steps=8, tr=8, r=16,
            params=params, boundary="zero", halo=16,
            n_shards=2, my_shard=jnp.int32(0),
        )


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_sharded_mega_coltile_parity(rng, params, boundary):
    """Column-tiled windows on the multi-chip megakernel: 4 row shards
    x column-tiled (tr=8, tc=128) windows, 48 rows padding to 16-row
    slabs and 260 true columns padding inside the 128-lane ring. The
    bottom-halo recv wait moves to the prefetch of the last row's FIRST
    column block (flat b = n_b - c_blocks - 1) — both boundaries, 27
    steps (odd time blocks + remainder re-entry)."""
    u, v = random_uv(rng, (48, 260))
    ou, ov = oracle.run(u, v, params, 27, boundary)
    gu, gv = run_sharded_mega(u, v, params, boundary, 27, block_rows=8,
                              block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_sharded_mega_coltile_matches_single_chip(rng, params):
    """Bit equality with the single-chip column-tiled megakernel (which
    runs the SEAMLESS flat loop at this geometry; the sharded form keeps
    the two-loop handshake): same windows, same bit-frozen naive step
    math, different DMA schedules."""
    u, v = random_uv(rng, (32, 384))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8, block_cols=128)
    sp1 = sim1.make_species((32, 384))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega(u, v, params, "naive", 16, n_devices=2,
                              block_rows=8, block_cols=128)
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
def test_sharded_mega_coltile_race_free(rng, params, dma_mode):
    """The column-tiled handshake under the vector-clock race detector:
    interior column blocks of the last row must not read the bottom halo
    before its recv wait, under both DMA execution extremes."""
    u, v = random_uv(rng, (32, 384))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=2, block_rows=8, block_cols=128)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((32, 384))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 16, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


def test_sharded_mega_coltile_auto_geometry(rng, params):
    """The backend's geometry heuristic picks column tiles for wide
    slabs with no pins, and the windowed engine rejects a block_cols
    pin loudly (it derives its own column layout)."""
    from grayscott_tpu.backends.sharded import ShardedSimulation as S

    sim = S(params, boundary="zero", engine="mega", n_devices=1)
    tr, tc = sim._mega_tiles(4096, 32768)
    assert tc is not None and tc % 128 == 0
    with pytest.raises(ValueError, match="column"):
        S(params, engine="windowed", block_cols=256)


def test_sharded_mega_coltile_lowers_for_tpu(params):
    """Mosaic lowering gate for the column-tiled multi-chip kernel:
    column-sliced window DMAs at traced offsets + the remote-DMA
    exchange in one kernel."""
    from grayscott_tpu.parallel import halo

    mesh = halo.make_mesh_1d(2)
    u = np.zeros((32, 260), np.float32)
    v = np.ones((32, 260), np.float32)
    up, vp, _ = halo.mega_shard_state(u, v, mesh, 8, tc=128)

    def fn(up, vp, n):
        return halo.sharded_mega_run(
            up, vp, n, None, mesh=mesh, r_total=32, steps=8, tr=8,
            params=params, boundary="naive", interpret=False,
            tc=128, c_dom=260,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(up), jnp.asarray(vp), jnp.int32(2)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_sharded_mega_bf16_matches_single_chip(rng, params):
    """bf16 storage on the multi-chip megakernel: halo rows ride ICI in
    bf16 (they are pushed from HBM AFTER the per-block store rounding),
    so shard-boundary windows upcast exactly the values a single-chip
    bf16 megakernel reads from its own HBM rows — bitwise equality, the
    same invariant the f32 test pins."""
    u, v = random_uv(rng, (64, 16))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8,
                            dtype="bfloat16")
    sp1 = sim1.make_species((64, 16))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega(u, v, params, "naive", 16, block_rows=8,
                              dtype="bfloat16")
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


def test_sharded_mega_bf16_storage_and_views(rng, params):
    """The sharded bf16 pairs live in HBM as bfloat16; host views are
    f32 and track the oracle within the storage-rounding budget."""
    u, v = random_uv(rng, (32, 16))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=4, block_rows=8, dtype="bfloat16")
    species = sim.make_species((32, 16))
    species.storage = sim.build_storage(u, v)
    assert species.storage[1].dtype == jnp.bfloat16
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    assert gu.dtype == np.float32 and gv.dtype == np.float32
    ou, ov = oracle.run(u, v, params, 16, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=0.05)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=0.05)
    # the fused V-only snapshot view agrees with the full extraction
    np.testing.assert_array_equal(
        np.asarray(sim.extract_result(species.storage, (32, 16))), gv
    )


def test_sharded_mega_bf16_coltile_matches_single_chip(rng, params):
    """bf16 storage composes with column-tiled sharded windows: the
    full-width row-slab exchange pushes bf16 rows regardless of window
    geometry, so bitwise equality with the single-chip column-tiled
    bf16 kernel holds just like the f32 coltile test."""
    u, v = random_uv(rng, (32, 384))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8, block_cols=128,
                            dtype="bfloat16")
    sp1 = sim1.make_species((32, 384))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega(u, v, params, "naive", 16, n_devices=2,
                              block_rows=8, block_cols=128,
                              dtype="bfloat16")
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


def test_sharded_mega_bf16_lowers_for_tpu(params):
    """Mosaic lowering gate: bf16 window DMAs + bf16 remote halo pushes
    + in-kernel f32 upcast in one multi-chip kernel."""
    from grayscott_tpu.parallel import halo

    mesh = halo.make_mesh_1d(2)
    u = np.zeros((32, 16), np.float32)
    v = np.ones((32, 16), np.float32)
    up, vp, _ = halo.mega_shard_state(u, v, mesh, 8, dtype=jnp.bfloat16)

    def fn(up, vp, n):
        return halo.sharded_mega_run(
            up, vp, n, None, mesh=mesh, r_total=32, steps=8, tr=8,
            params=params, boundary="naive", interpret=False,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(up), jnp.asarray(vp), jnp.int32(2)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def run_sharded_mega2d(u, v, params, boundary, steps, n_devices=4,
                       mesh_cols=2, **kw):
    sim = ShardedSimulation(params, boundary=boundary, engine="mega",
                            n_devices=n_devices, mesh_cols=mesh_cols, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_sharded_mega2d_oracle_parity(rng, params, boundary):
    """2x2 mesh, column-tiled (tr=8, tc=128) shard windows: 32x300
    pads rows per shard and columns inside the last column shard, so
    the sanitize masking runs with GLOBAL (row, col) origins across
    both mesh axes. 16 steps = 2 time blocks through the 8-direction
    entry-gated exchange."""
    u, v = random_uv(rng, (32, 300))
    ou, ov = oracle.run(u, v, params, 16, boundary)
    gu, gv = run_sharded_mega2d(u, v, params, boundary, 16,
                                block_rows=8, block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_mega2d_matches_single_chip(rng, params):
    """Bitwise equality with the single-chip column-tiled megakernel
    (naive = bit-frozen step math): a 2x2 mesh tile sees exactly the
    values a single chip reads from its own HBM, through 8-direction
    remote-DMA halos — including the corner pushes the 1-D form never
    needs."""
    u, v = random_uv(rng, (32, 384))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8, block_cols=128)
    sp1 = sim1.make_species((32, 384))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega2d(u, v, params, "naive", 16,
                                block_rows=8, block_cols=128)
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


@pytest.mark.parametrize("dma_mode", ["on_wait", "eager"])
def test_sharded_mega2d_race_free(rng, params, dma_mode):
    """The entry-gated 8-direction handshake under the vector-clock
    race detector, both DMA execution extremes, with odd time blocks
    plus a remainder re-entry (27 steps)."""
    u, v = random_uv(rng, (32, 300))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=4, mesh_cols=2, block_rows=8,
                            block_cols=128)
    sim.interpret = pltpu.InterpretParams(detect_races=True,
                                          dma_execution_mode=dma_mode)
    species = sim.make_species((32, 300))
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 27)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 27, "zero")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    try:
        from jax._src.pallas.mosaic.interpret import (
            interpret_pallas_call as _ipc,
        )
        assert _ipc.races is None or not _ipc.races.races_found
    except ImportError:  # pragma: no cover - jax layout drift
        pass


def test_sharded_mega2d_column_only_mesh(rng, params):
    """A 1x4 column mesh: rows unsharded (no up/down/corner neighbors
    anywhere), the exchange reduces to the left/right ring pushes."""
    u, v = random_uv(rng, (24, 600))
    ou, ov = oracle.run(u, v, params, 16, "naive")
    gu, gv = run_sharded_mega2d(u, v, params, "naive", 16, mesh_cols=4,
                                block_rows=8, block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_sharded_mega2d_bf16_matches_single_chip(rng, params):
    """bf16 storage on the 2-D mesh: halo rows, ring columns and
    corners all ride ICI in bf16 (pushed after the per-block store
    rounding), so bitwise equality with the single-chip bf16
    column-tiled megakernel holds like the 1-D bf16 test."""
    u, v = random_uv(rng, (32, 384))
    sim1 = PallasSimulation(params, boundary="naive", engine="mega",
                            interpret=True, block_rows=8, block_cols=128,
                            dtype="bfloat16")
    sp1 = sim1.make_species((32, 384))
    sp1.storage = sim1.build_storage(u, v)
    sim1.perform_steps(sp1, 16)
    su, sv = sp1.uv_host()
    gu, gv = run_sharded_mega2d(u, v, params, "naive", 16, block_rows=8,
                                block_cols=128, dtype="bfloat16")
    np.testing.assert_array_equal(gu, su)
    np.testing.assert_array_equal(gv, sv)


def test_sharded_mega2d_auto_geometry(rng, params):
    """No pins: the 2-D tile heuristic maps a narrow shard slab onto
    ONE covering column tile (the ring is mandatory on a 2-D mesh) and
    the run stays oracle-exact."""
    u, v = random_uv(rng, (32, 300))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=4, mesh_cols=2)
    species = sim.make_species((32, 300))
    species.storage = sim.build_storage(u, v)
    assert species.storage[0] == "mega2d"
    tc = species.storage[4]
    assert tc is not None and tc % 128 == 0
    sim.perform_steps(species, 8)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 8, "zero")
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)
    # the fused V-only snapshot view agrees with the full extraction
    np.testing.assert_array_equal(
        np.asarray(sim.extract_result(species.storage, (32, 300))), gv
    )


def test_sharded_mega2d_lowers_for_tpu(params):
    """Mosaic lowering gate: 8-direction remote DMAs (cardinal +
    corner), entry-gated per-slot recv semaphores, and two traced mesh
    coordinates in one kernel must lower for real TPUs."""
    from grayscott_tpu.parallel import halo

    mesh = halo.make_mesh(4, 2)
    u = np.zeros((32, 300), np.float32)
    v = np.ones((32, 300), np.float32)
    up, vp, _, _ = halo.mega_shard_state2d(u, v, mesh, 8, 128)

    def fn(up, vp, n):
        return halo.sharded_mega_run2d(
            up, vp, n, None, mesh=mesh, r_total=32, c_total=300,
            steps=8, tr=8, tc=128, params=params, boundary="naive",
            interpret=False,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(up), jnp.asarray(vp), jnp.int32(2)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_sharded_mega2d_validations(params):
    from grayscott_tpu.ops import megakernel as mk

    # a 2-D mesh shard narrower than one 128-lane tile is rejected at
    # the backend (use fewer mesh columns)
    sim = ShardedSimulation(params, engine="mega", n_devices=4,
                            mesh_cols=4)
    with pytest.raises(ValueError, match="mesh columns"):
        sim.build_storage(np.zeros((32, 128), np.float32),
                          np.zeros((32, 128), np.float32))
    # the kernel driver requires column-tiled windows on 2-D meshes
    pair = jnp.zeros((2, 8 + 16 + 8, 16), jnp.float32)
    with pytest.raises(ValueError, match="column-tiled"):
        mk.megastep_impl(
            pair, pair, jnp.int32(1), None, steps=8, tr=8, r=16,
            params=params, boundary="zero", n_shards=2,
            my_shard=jnp.int32(0), n_shard_cols=2,
            my_shard_col=jnp.int32(0),
        )
    with pytest.raises(ValueError, match="my_shard_col"):
        mk.megastep_impl(
            pair, pair, jnp.int32(1), None, steps=8, tr=8, r=16,
            params=params, boundary="zero",
            my_shard_col=jnp.int32(0),
        )


def test_sharded_mega2d_interior_row_shard(rng, params):
    """3x2 mesh: the middle row shard has BOTH up and down neighbors
    (plus all four diagonals), a combination the 2x2/1x4 tests never
    produce — every one of its 8 entry-gate waits and 8 sends fires."""
    u, v = random_uv(rng, (40, 280))
    ou, ov = oracle.run(u, v, params, 8, "naive")
    gu, gv = run_sharded_mega2d(u, v, params, "naive", 8, n_devices=6,
                                mesh_cols=2, block_rows=8,
                                block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_mega2d_wide_mesh_diagonals(rng, params):
    """2x3 mesh: diagonal logical-id offsets +-(nc-1)/+-(nc+1) take
    general values (+-2/+-4) instead of degenerating to +-1/+-3 like
    nc=2 — pins the row-major flat-id arithmetic."""
    u, v = random_uv(rng, (32, 420))
    ou, ov = oracle.run(u, v, params, 8, "zero")
    gu, gv = run_sharded_mega2d(u, v, params, "zero", 8, n_devices=6,
                                mesh_cols=3, block_rows=8,
                                block_cols=128)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_mega2d_one_tile_shards(rng, params):
    """Shards exactly one 128-lane tile wide are valid (the narrowest
    supported 2-D geometry: cp == chalo == 128)."""
    u, v = random_uv(rng, (32, 256))
    sim = ShardedSimulation(params, boundary="naive", engine="mega",
                            n_devices=4, mesh_cols=2, block_rows=8)
    species = sim.make_species((32, 256))
    species.storage = sim.build_storage(u, v)
    assert species.storage[4] == 128
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 16, "naive")
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_sharded_mega2d_overwide_pin_clamps(rng, params):
    """A --pallas-block-cols pin wider than the covering column tile is
    clamped to it (the 2-D analog of the 1-D tc >= c neutralization)
    instead of surfacing as a misleading VMEM error."""
    u, v = random_uv(rng, (32, 300))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=4, mesh_cols=2, block_rows=8,
                            block_cols=512)
    species = sim.make_species((32, 300))
    species.storage = sim.build_storage(u, v)
    assert species.storage[4] == 256  # ceil(150 / 128) * 128
    sim.perform_steps(species, 8)
    gu, gv = species.uv_host()
    ou, ov = oracle.run(u, v, params, 8, "zero")
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_mega2d_fuzz(rng, params):
    """Randomized 2-D geometry (the 2-D analog of
    test_sharded_mega_fuzz): row counts that land global bottom padding
    on different mesh rows, column counts that pad inside the last
    column shard, mesh shapes covering interior shards (3x2) and
    general diagonal offsets (2x3), and step counts hitting every
    time-block remainder/parity combination."""
    for _ in range(3):
        mr, mc = [(2, 2), (3, 2), (2, 3)][int(rng.randint(3))]
        r = int(rng.randint(8 * mr + 1, 64))
        c = 128 * mc + 8 * int(rng.randint(0, 20))
        steps = int(rng.randint(1, 21))
        boundary = ["naive", "zero"][int(rng.randint(2))]
        u, v = random_uv(rng, (r, c))
        ou, ov = oracle.run(u, v, params, steps, boundary)
        gu, gv = run_sharded_mega2d(u, v, params, boundary, steps,
                                    n_devices=mr * mc, mesh_cols=mc,
                                    block_rows=8, block_cols=128)
        msg = f"mesh={mr}x{mc} r={r} c={c} steps={steps} {boundary}"
        np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6,
                                   err_msg=msg)
        np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6,
                                   err_msg=msg)
