"""Curated REAL-HARDWARE smoke suite: every kernel engine/layout against
the oracle on actual Mosaic, at small shapes so first-run remote compiles
stay in the tens of seconds (cached afterwards).

The main suite runs in interpret mode on CPU (tests/conftest.py), which
validates numerics but not Mosaic lowering, real DMA ordering, or the
chip's FMA contraction choices; the jax.export gate (test_lowering.py)
validates lowering but never executes. This file closes the gap the way
the reference's CI cannot for its GPU backends (.github/workflows/
ci.yml:201-206's FIXME): run it on a machine with a TPU attached via

    GRAYSCOTT_TEST_TPU=1 python -m pytest tests/test_hw_smoke.py -v

Skipped automatically everywhere else (including the default CPU suite).
The ad-hoc equivalents that these tests formalize: scripts/
mega_hw_check.py (engine equivalence at production shapes) and
scripts/parity_check.py (1000-step drift, PARITY.md).
"""

import numpy as np
import pytest

import jax

from grayscott_tpu import oracle
from grayscott_tpu.params import Parameters
from grayscott_tpu.species import initial_uv

from conftest import random_uv

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="hardware smoke suite: needs a real TPU "
    "(run with GRAYSCOTT_TEST_TPU=1)",
)


def run_pallas(u, v, params, boundary, steps, **kw):
    # interpret left at its platform default: False on TPU
    from grayscott_tpu.backends.pallas import PallasSimulation

    sim = PallasSimulation(params, boundary=boundary, tuned_lookup=False,
                          **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


ENGINE_CONFIGS = {
    # every config: (shape, extra PallasSimulation kwargs). Shapes chosen
    # so blocks/panels/tiles all exceed one (the interesting DMA cases)
    # while windows stay small enough for fast remote compiles.
    "windowed": ((64, 256), dict(engine="windowed", block_rows=16)),
    "mega": ((64, 256), dict(engine="mega", block_rows=16)),
    "mega-coltile": ((64, 384), dict(engine="mega", block_rows=16,
                                     block_cols=128)),
    "resident": ((64, 256), dict(resident="on")),
    "fold": ((64, 256), dict(fold=2, block_rows=8, engine="windowed")),
}


@pytest.mark.parametrize("boundary", ["naive", "zero"])
@pytest.mark.parametrize("name", sorted(ENGINE_CONFIGS))
def test_engine_oracle_parity_on_hardware(rng, params, name, boundary):
    """Each kernel engine vs the oracle on real Mosaic: 24 steps =
    full K blocks + a remainder call, random state, both boundaries."""
    shape, kw = ENGINE_CONFIGS[name]
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, 24, boundary)
    gu, gv = run_pallas(u, v, params, boundary, 24, **kw)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_packed_layout_on_hardware(rng, params):
    """Species-packed layout (x = [U | V] along lanes; zero boundary
    only) on real Mosaic."""
    u, v = random_uv(rng, (64, 256))
    ou, ov = oracle.run(u, v, params, 24, "zero")
    gu, gv = run_pallas(u, v, params, "zero", 24, pack="on")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=2e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=2e-6)


def test_bf16_storage_on_hardware(params):
    """bf16 STORAGE mode (f32 compute, per-K-block rounding) stays within
    bf16 round-off of the f32 oracle on the standard init pattern."""
    u0, v0 = initial_uv((64, 256))
    ou, ov = oracle.run(u0, v0, params, 16)
    gu, gv = run_pallas(u0, v0, params, "naive", 16, engine="mega",
                        block_rows=16, dtype="bfloat16")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=0.05)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=0.05)


@pytest.mark.parametrize("engine,kw,atol", [
    ("windowed", dict(block_rows=16), 2e-6),
    ("mega", dict(block_rows=16), 2e-6),
    ("mega", dict(block_rows=8, block_cols=128), 2e-6),  # column-tiled slab
    # bf16 storage: per-K-block rounding budget, bf16 halo bytes
    ("mega", dict(block_rows=16, dtype="bfloat16"), 0.05),
])
def test_sharded_single_device_on_hardware(rng, params, engine, kw, atol):
    """The sharded driver (shard_map + per-shard kernel) on a 1-device
    mesh: real-Mosaic execution of the multi-chip code path, incl. the
    n_shards==1 megakernel form the virtual-mesh tests only interpret."""
    from grayscott_tpu.backends.sharded import ShardedSimulation

    u, v = random_uv(rng, (64, 256))
    ou, ov = oracle.run(u, v, params, 16, "naive")
    sim = ShardedSimulation(params, boundary="naive", n_devices=1,
                            engine=engine, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 16)
    gu, gv = species.uv_host()
    np.testing.assert_allclose(gu, ou, rtol=0, atol=atol)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=atol)
