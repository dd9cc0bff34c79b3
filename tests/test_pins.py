"""Engine/layout pin contracts and autotuner isolation (round-2 review).

An explicit pin (engine=, resident=, block_rows=, steps_per_call=) names
the exact kernel configuration the user wants: persisted or shipped
autotune verdicts must never override it, and the autotuner itself must
measure each candidate exactly as pinned (tuned_lookup=False) or the
candidate table silently collapses onto whatever record already exists.
"""

import numpy as np
import pytest

from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.ops import megakernel as mk
from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.utils import cache


def _put_record(monkeypatch, tmp_path, shape, boundary, rec, params):
    import jax

    monkeypatch.setattr(cache, "CACHE_DIR", str(tmp_path))
    key = cache.autotune_key(
        jax.devices()[0].platform, shape, boundary,
        params.stencil_name(), ps.KERNEL_VERSION,
    )
    cache.save_autotune({key: rec})


def test_engine_windowed_pin_ignores_resident_verdict(
    monkeypatch, tmp_path, params
):
    """engine='windowed' must run the windowed kernel even where a
    measured verdict (or the auto heuristic) would pick resident."""
    _put_record(monkeypatch, tmp_path, (64, 128), "zero", {
        "engine": "resident", "block_rows": None, "steps_per_call": 16,
        "block_cols": None, "fold": 1, "pack": False,
        "gcells_per_sec": 99.0,
    }, params)
    assert ps.resident_ok((64, 128))
    sim = PallasSimulation(params, boundary="zero", engine="windowed",
                           interpret=False)
    assert not sim._use_resident((64, 128))
    storage = sim.build_storage(*(np.zeros((64, 128), np.float32),) * 2)
    assert storage[0] == "windowed"  # not "resident"
    # while the unpinned sim DOES follow the verdict
    auto = PallasSimulation(params, boundary="zero", interpret=False)
    assert auto._use_resident((64, 128))


def test_engine_pin_ignores_packed_resident_verdict(
    monkeypatch, tmp_path, params
):
    """In packed mode, a measured engine='resident' verdict must not
    override an explicit engine='mega' pin (_build_packed order)."""
    _put_record(monkeypatch, tmp_path, (64, 128), "zero", {
        "engine": "resident", "block_rows": None, "steps_per_call": 16,
        "block_cols": None, "fold": 1, "pack": True,
        "gcells_per_sec": 99.0,
    }, params)
    sim = PallasSimulation(params, boundary="zero", engine="mega",
                           pack="on", interpret=False)
    storage = sim.build_storage(*(np.zeros((64, 128), np.float32),) * 2)
    assert storage[0] == "megapack"


def test_resident_pin_conflicts_with_engine_pin(params):
    with pytest.raises(ValueError, match="engine pin"):
        PallasSimulation(params, resident="on", engine="mega")
    with pytest.raises(ValueError, match="engine pin"):
        PallasSimulation(params, resident="on", engine="windowed")


def test_mega_pin_rejects_foreign_steps_per_call(params):
    """engine='mega' runs at K=MEGA_STEPS; a different explicit pin is an
    error (the ShardedSimulation contract), never silently ignored."""
    with pytest.raises(ValueError, match="steps-per-call"):
        PallasSimulation(params, engine="mega", steps_per_call=16)
    # pinning the depth mega actually runs at is fine
    PallasSimulation(params, engine="mega", steps_per_call=mk.MEGA_STEPS)


def test_pack_auto_respects_tile_pins(monkeypatch, tmp_path, params):
    """A measured pack verdict must not hijack a sim with explicit
    windowed tile/K pins (the autotuner's plain candidates)."""
    _put_record(monkeypatch, tmp_path, (64, 128), "zero", {
        "engine": "mega", "block_rows": None, "steps_per_call": 8,
        "block_cols": None, "fold": 1, "pack": True,
        "gcells_per_sec": 99.0,
    }, params)
    pinned = PallasSimulation(params, boundary="zero", block_rows=16,
                              steps_per_call=8, interpret=False)
    assert not pinned._use_pack((64, 128))
    # and the unpinned sim follows the verdict
    auto = PallasSimulation(params, boundary="zero", interpret=False)
    assert auto._use_pack((64, 128))


def test_tuned_lookup_off_isolates_from_records(
    monkeypatch, tmp_path, params
):
    """tuned_lookup=False (what measure_config passes) makes 'auto' modes
    act as if no record exists, so candidates measure what they pin."""
    _put_record(monkeypatch, tmp_path, (64, 128), "zero", {
        "engine": "mega", "block_rows": None, "steps_per_call": 8,
        "block_cols": None, "fold": 1, "pack": True,
        "gcells_per_sec": 99.0,
    }, params)
    sim = PallasSimulation(params, boundary="zero", interpret=False,
                           tuned_lookup=False)
    assert sim._lookup_tuned((64, 128)) is None
    assert not sim._use_pack((64, 128))


def test_guard_ok_defaults_missing_knobs(params):
    """Arbitrary Mapping candidates without steps_per_call/block_rows must
    be guarded with runtime defaults, not crash the viability loop."""
    from grayscott_tpu.bench import autotune

    assert autotune._guard_ok({"block_rows": 16}, (64, 128), "zero") in (
        True, False,
    )
    assert autotune._guard_ok({}, (64, 128), "zero") in (True, False)


def test_engine_candidates_include_bf16_mega():
    """bf16 tuning must be able to measure the megakernel (the shipped
    per-dtype verdicts show it beating bf16-windowed at every measured
    shape); the resident kernel stays f32-only."""
    from grayscott_tpu.bench import autotune

    cands = autotune._engine_candidates((4096, 4096), "bfloat16")
    assert any(c.get("engine") == "mega" for c in cands)
    assert not any(c.get("resident") == "on" for c in cands)
    # small f32 domains still offer the resident candidate
    cands = autotune._engine_candidates((64, 128), "float32")
    assert any(c.get("resident") == "on" for c in cands)


def test_strip_store_rejected_when_sharded():
    """The strip-store top-edge predicate is per-shard, not global: the
    combination must be rejected, not silently corrupt shard > 0."""
    from grayscott_tpu.params import Parameters

    u_pair = np.zeros((2, 8 + 16 + 8, 128), np.float32)
    with pytest.raises(ValueError, match="single-chip"):
        mk.megastep_impl(
            u_pair, u_pair.copy(), 1, None,
            steps=8, tr=16, r=16, params=Parameters(), boundary="naive",
            strip_store=True, n_shards=2, my_shard=0, interpret=True,
        )


def test_sharded_mega_rejects_unfittable_slab(params):
    """A PINNED full-width config that cannot fit the VMEM budget must
    fail cleanly instead of compiling a slab the budget can never hold
    (the AUTO path column-tiles such slabs instead — asserted below)."""
    from grayscott_tpu.backends.sharded import ShardedSimulation

    r, c = 64, 131072  # full-width liveness alone exceeds the 120 MB tier
    assert not mk.mega_ok((r, c), mk.choose_mega_rows(r, c))
    sim = ShardedSimulation(params, boundary="zero", engine="mega",
                            n_devices=1, block_rows=8)  # full-width pin
    with pytest.raises(ValueError, match="windowed engine"):
        sim.build_storage(np.zeros((r, c), np.float32),
                          np.zeros((r, c), np.float32))
    # unpinned, the geometry heuristic column-tiles the slab instead
    auto = ShardedSimulation(params, boundary="zero", engine="mega",
                             n_devices=1)
    storage = auto.build_storage(np.zeros((r, c), np.float32),
                                 np.zeros((r, c), np.float32))
    assert storage[0] == "mega" and storage[4] is not None
    assert mk.mega_ok((r, c), storage[3], tc=storage[4])
