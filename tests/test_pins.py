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


def test_mega_depth_pin_respects_vmem_envelope(params):
    """A deep DMA ring multiplies the window/output slots: the envelope
    must be judged at the PINNED depth, not the default double buffer
    (round-4 review: mega_depth=8 at a depth-2 geometry compiled a
    kernel past physical VMEM instead of erroring/adapting)."""
    tr2 = mk.choose_mega_rows(4096, 4096)
    # tr=256 keeps 16 row blocks, so the run-time seam cap does NOT
    # clamp depth=8 back to 2 — the 8-slot ring is judged for real
    assert mk.mega_ok((4096, 4096), 256, depth=2)
    assert not mk.mega_ok((4096, 4096), 256, depth=8)
    # auto geometry shrinks the tile to fit the ring instead
    tr8 = mk.choose_mega_rows(4096, 4096, depth=8)
    assert tr8 < tr2
    assert mk.mega_ok((4096, 4096), tr8, depth=8)
    assert mk.choose_mega_geometry(4096, 4096, depth=8)[0] == tr8
    # backend level: a pinned tr past the pinned-depth envelope is a
    # clean config error, not a Mosaic scoped-VMEM compile failure
    from grayscott_tpu.errors import UnsupportedConfigError

    sim = PallasSimulation(params, boundary="zero", engine="mega",
                           block_rows=256, mega_depth=8)
    with pytest.raises(UnsupportedConfigError, match="mega_depth"):
        sim.build_storage(np.zeros((4096, 4096), np.float32),
                          np.zeros((4096, 4096), np.float32))


def test_mega_tuned_tiles_revalidated_under_depth_pin(
    monkeypatch, tmp_path, params
):
    """A tuned record's tiles were measured at the default envelope; a
    deeper mega_depth pin must re-derive geometry rather than run the
    record's tiles past VMEM (round-4 review)."""
    _put_record(monkeypatch, tmp_path, (4096, 4096), "zero", {
        "engine": "mega", "block_rows": 256, "steps_per_call": 16,
        "block_cols": None, "fold": 1, "pack": False,
        "gcells_per_sec": 92.0,
    }, params)
    sim = PallasSimulation(params, boundary="zero", mega_depth=8,
                           interpret=False)
    storage = sim.build_storage(np.zeros((4096, 4096), np.float32),
                                np.zeros((4096, 4096), np.float32))
    assert storage[0] == "mega"
    assert mk.mega_ok((4096, 4096), storage[3], tc=storage[4], depth=8)
    # without the depth pin the record's tiles apply unchanged
    sim2 = PallasSimulation(params, boundary="zero", interpret=False)
    storage2 = sim2.build_storage(np.zeros((4096, 4096), np.float32),
                                  np.zeros((4096, 4096), np.float32))
    assert storage2[0] == "mega" and storage2[3] == 256


def test_mega_specialize_derates_compile_ceiling(params):
    """specialize compiles BOTH steppers under lax.cond — roughly twice
    the K-unrolled graph. The compile-tractability gate must see that,
    or a near-ceiling geometry sails into the remote-compile hang the
    guard exists to prevent (round-4 review)."""
    trn = mk.choose_mega_rows(4096, 4096, boundary="naive")
    assert mk.mega_ok((4096, 4096), trn, boundary="naive")
    assert not mk.mega_ok((4096, 4096), trn, boundary="naive",
                          specialize=True)
    trs = mk.choose_mega_rows(4096, 4096, boundary="naive",
                              specialize=True)
    assert trs < trn
    assert mk.mega_ok((4096, 4096), trs, boundary="naive",
                      specialize=True)


def test_naive_fold_auto_fold_never_adopts_a_folded_record(
    monkeypatch, tmp_path, params
):
    """naive_fold excludes the lane-fold layout (constructor rule for
    pins) — but fold='auto' acting on a persisted fold record would
    silently build the folded storage, whose run path has no fast_fold
    (round-4 review: the requested mode then did nothing)."""
    _put_record(monkeypatch, tmp_path, (256, 256), "naive", {
        "engine": "windowed", "block_rows": 64, "steps_per_call": 8,
        "block_cols": None, "fold": 2, "pack": False,
        "gcells_per_sec": 50.0,
    }, params)
    sim = PallasSimulation(params, boundary="naive", naive_fold=True,
                           interpret=False)
    assert sim._fold_factor((256, 256)) == 1
    storage = sim.build_storage(np.zeros((256, 256), np.float32),
                                np.zeros((256, 256), np.float32))
    assert storage[0] != "folded"
    # the record still folds a sim WITHOUT naive_fold
    plain = PallasSimulation(params, boundary="naive", interpret=False)
    assert plain._fold_factor((256, 256)) == 2


def test_specialize_pin_keeps_column_tiling():
    """Column-tiled layouts decline specialize, so the geometry choice
    must not charge tc candidates its doubled-graph compile derate — a
    mega_specialize pin on a wide domain must not silently degrade to
    slower full-width tiles (round-4 review)."""
    plain = mk.choose_mega_geometry(16384, 16384)
    assert plain[1] is not None  # column tiling wins at this width
    assert mk.choose_mega_geometry(16384, 16384, specialize=True) == plain
    assert mk.mega_ok((16384, 16384), plain[0], tc=plain[1],
                      specialize=True)


def test_autotune_candidate_generation_survives_wide_domains(params):
    """Candidate generation must SKIP layouts whose tile chooser says no
    window compiles, not crash the tuner (round-4 review: the new
    choose_block_rows error propagated out of --autotune at exactly the
    wide domains the wide-domain candidates exist for)."""
    from grayscott_tpu.bench import autotune

    packs = autotune._pack_candidates((4096, 16384), "zero", "float32",
                                      params)
    assert all(p.get("engine") != "windowed" for p in packs)
    # Mapping candidates may omit both windowed knobs (_guard_ok contract)
    wide = autotune._wide_domain_candidates(
        (4096, 16384), [dict(engine="mega")], "zero")
    assert wide and all("block_cols" in w for w in wide)
    assert autotune._guard_ok(dict(block_rows=None),
                              (4096, 32768), "naive") is False
