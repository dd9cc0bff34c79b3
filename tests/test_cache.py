import json
import os

import pytest

from grayscott_tpu.utils import cache


def test_autotune_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(cache, "CACHE_DIR", str(tmp_path))
    assert cache.load_autotune() == {}
    cache.save_autotune({"k": {"block_rows": 96}})
    assert cache.load_autotune() == {"k": {"block_rows": 96}}
    # atomic rewrite leaves no temp files behind
    cache.save_autotune({"k": {"block_rows": 48}})
    assert cache.load_autotune()["k"]["block_rows"] == 48
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


def test_autotune_corrupt_file(tmp_path, monkeypatch):
    monkeypatch.setattr(cache, "CACHE_DIR", str(tmp_path))
    os.makedirs(tmp_path, exist_ok=True)
    with open(cache._autotune_path(), "w") as f:
        f.write("{not json")
    assert cache.load_autotune() == {}


def test_autotune_key_distinct():
    k1 = cache.autotune_key("tpu", (4096, 4096), "naive", "oono-puri")
    k2 = cache.autotune_key("tpu", (4096, 4096), "zero", "oono-puri")
    k3 = cache.autotune_key("cpu", (4096, 4096), "naive", "oono-puri")
    assert len({k1, k2, k3}) == 3


def test_lookup_miss(monkeypatch, tmp_path, params):
    monkeypatch.setattr(cache, "CACHE_DIR", str(tmp_path))
    from grayscott_tpu.bench import autotune

    assert autotune.lookup(params, (32, 32), "naive") is None


def test_compilation_cache_enable(monkeypatch, tmp_path):
    monkeypatch.setattr(cache, "CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(cache, "_compilation_cache_enabled", False)
    # the suite-wide kill switch must win: no jax config change, no dir
    monkeypatch.setenv("GRAYSCOTT_NO_PERSISTENT_CACHE", "1")
    import jax

    before = jax.config.jax_compilation_cache_dir
    path = cache.enable_compilation_cache()
    assert path.startswith(str(tmp_path))
    assert not os.path.isdir(path)  # no-op under the kill switch
    assert jax.config.jax_compilation_cache_dir == before
    # without the kill switch the cache is enabled for real
    monkeypatch.delenv("GRAYSCOTT_NO_PERSISTENT_CACHE")
    path = cache.enable_compilation_cache()
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path
    # restore: later suite compiles must not write the tmp cache
    jax.config.update("jax_compilation_cache_dir", before)
    monkeypatch.setattr(cache, "_compilation_cache_enabled", False)


def test_autotune_candidate_normalization():
    from grayscott_tpu.bench import autotune

    assert autotune._as_config((96, 8)) == {
        "block_rows": 96, "steps_per_call": 8,
    }
    d = {"block_rows": 192, "steps_per_call": 16, "block_cols": 1024}
    assert autotune._as_config(d) == d


def test_autotune_wide_domain_candidates():
    from grayscott_tpu.bench import autotune

    base = [{"block_rows": 256, "steps_per_call": 16},
            {"block_rows": 192, "steps_per_call": 16}]
    # 4096 columns: full-width windows fit VMEM -> no column candidates
    assert autotune._wide_domain_candidates((512, 4096), base) == []
    # very wide domain -> column-tiled variants, 128-lane aligned, every
    # window under the Mosaic compile ceiling
    wide = autotune._wide_domain_candidates((512, 32768), base)
    assert wide and all(c["block_cols"] % 128 == 0 for c in wide)
    assert all(c["block_cols"] < 32768 for c in wide)
    assert len({c["block_cols"] for c in wide}) >= 2
    from grayscott_tpu.ops import pallas_stencil as ps

    for c in wide:
        assert ps.window_compile_ok(
            c["block_rows"], 16, c["block_cols"] + 2 * ps.COL_HALO,
            steps=c["steps_per_call"],
        )


def test_tuned_block_cols_adopted(monkeypatch, tmp_path, params):
    """A persisted winner's block_cols (incl. an explicit None) overrides
    the width heuristic when the user pins nothing."""
    import jax

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    shape = (64, 512)
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                         ps.KERNEL_VERSION)
    c.save_autotune({key: {
        "block_rows": 16, "steps_per_call": 4, "block_cols": 256,
    }})
    sim = PallasSimulation(params, boundary="zero")
    tr, tc, chalo = sim._tiles(shape)
    assert (tr, tc, chalo) == (16, 256, ps.COL_HALO)
    assert sim.steps_per_call != 4  # k adopted in build_storage, not here
    # explicit None pins full-width even where the heuristic would tile
    c.save_autotune({key: {
        "block_rows": 16, "steps_per_call": 4, "block_cols": None,
    }})
    sim2 = PallasSimulation(params, boundary="zero")
    monkeypatch.setattr(ps, "choose_block_cols", lambda *a, **k: 128)
    tr2, tc2, chalo2 = sim2._tiles(shape)
    assert (tc2, chalo2) == (None, 0)


def test_autotune_skips_compile_ceiling(monkeypatch, tmp_path, params, capsys):
    """Candidates whose window exceeds the Mosaic compile ceiling are
    skipped (they would hang the remote compiler), not measured."""
    from grayscott_tpu.bench import autotune
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    cands = [
        {"block_rows": 384, "steps_per_call": 16},  # past ceiling at C=4096
        {"block_rows": 16, "steps_per_call": 2},
    ]
    best = autotune.autotune(params, (64, 4096), "zero", candidates=cands,
                             verbose=True, persist=False)
    assert best["block_rows"] == 16
    assert "SKIP" in capsys.readouterr().out


def test_autotune_fallback_candidates_are_guarded(params):
    """The last-resort heuristic configs must themselves pass the compile
    ceiling for representative domains (else autotune could still hang)."""
    from grayscott_tpu.bench import autotune

    for shape in [(4096, 4096), (1080, 1920), (4096, 32768), (64, 22016)]:
        for boundary in ("zero", "naive"):
            cands = autotune._fallback_candidates(shape, boundary)
            assert cands, (shape, boundary)
            for cfg in cands:
                assert autotune._guard_ok(cfg, shape, boundary), (shape, cfg)


def test_per_species_tuned_k_isolation(monkeypatch, tmp_path, params):
    """Two species from ONE sim with different tuned K per shape: each
    keeps its own halo geometry (a second make_species must not change
    how the first species' padded buffers are sliced)."""
    import jax
    import numpy as np

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    platform = jax.devices()[0].platform
    shape_a, shape_b = (32, 256), (64, 256)
    store = {}
    for shape, k in ((shape_a, 16), (shape_b, 8)):
        key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                             ps.KERNEL_VERSION)
        store[key] = {"block_rows": 16, "steps_per_call": k,
                      "block_cols": None}
    c.save_autotune(store)
    sim = PallasSimulation(params, boundary="zero", interpret=True,
                           resident="off", engine="windowed")
    sim.interpret = False  # allow k adoption; kernels never run here
    spa = sim.make_species(shape_a)
    spb = sim.make_species(shape_b)
    sim.interpret = True
    _, _, _, _, _, _, halo_a, k_a = spa.storage
    _, _, _, _, _, _, halo_b, k_b = spb.storage
    assert (k_a, halo_a) == (16, 16)
    assert (k_b, halo_b) == (8, 8)
    # species A still slices with ITS halo, not B's
    ua = np.asarray(sim.extract_uv(spa.storage, shape_a)[0])
    assert ua.shape == shape_a
    assert np.allclose(ua, 1.0 - (np.asarray(spa.result()) > 0))
    # and the init box round-trips exactly for both
    from grayscott_tpu.species import initial_uv

    for sp, shape in ((spa, shape_a), (spb, shape_b)):
        u0, v0 = initial_uv(shape)
        np.testing.assert_array_equal(np.asarray(sp.result()), v0)


def test_wide_domain_candidates_naive_derate():
    """Naive-boundary wide domains must yield viable column-tiled
    candidates: the ceiling cap has to include the 1.25x naive derate or
    _guard_ok rejects every one afterwards (ADVICE r1)."""
    from grayscott_tpu.bench import autotune

    base = [{"block_rows": 256, "steps_per_call": 16},
            {"block_rows": 192, "steps_per_call": 16}]
    wide = autotune._wide_domain_candidates((4096, 32768), base, "naive")
    assert wide
    viable = [c for c in wide
              if autotune._guard_ok(c, (4096, 32768), "naive")]
    assert viable, "all naive wide-domain candidates rejected by the guard"


def test_autotune_records_all_candidates(monkeypatch, tmp_path, params):
    """The persisted winner carries the full candidate table for audit."""
    from grayscott_tpu.bench import autotune
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    cands = [{"block_rows": 16, "steps_per_call": 2},
             {"block_rows": 8, "steps_per_call": 2}]
    best = autotune.autotune(params, (32, 256), "zero", candidates=cands,
                             persist=True)
    assert len(best["candidates"]) == 2
    for m in best["candidates"]:
        assert "gcells_per_sec" in m or "error" in m
    # and it round-trips through the store
    key = list(c.load_autotune())[0]
    assert c.load_autotune()[key]["candidates"] == best["candidates"]


def test_measure_config_records_wall_and_device(params):
    """Every measured record carries the wall-clock rate for audit; on
    interpret/CPU runs (no device trace) the ranking rate IS the wall
    rate, on hardware it is the on-chip module rate (VERDICT r2 #4:
    autotune must rank on device time, not tunnel RTT)."""
    from grayscott_tpu.bench import autotune

    rec = autotune.measure_config(params, (16, 128), "zero", steps=2,
                                  reps=1, block_rows=8, steps_per_call=2)
    assert "wall_gcells_per_sec" in rec
    assert rec["gcells_per_sec"] == rec["wall_gcells_per_sec"]
    assert "device_gcells_per_sec" not in rec  # CPU: no device plane


def test_fold_record_adoption(monkeypatch, tmp_path, params):
    """A persisted fold winner drives the folded layout under
    fold='auto' (with its tiles), is ignored under fold='off' (including
    its fold-layout tiles, which are meaningless for the plain layout),
    and autotune emits fold candidates for narrow domains."""
    import jax
    import numpy as np

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.bench import autotune
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    shape = (64, 128)
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                         ps.KERNEL_VERSION)
    c.save_autotune({key: {
        "block_rows": 16, "steps_per_call": 8, "block_cols": None,
        "fold": 2,
    }})
    sim = PallasSimulation(params, boundary="zero", fold="auto",
                           interpret=False)
    st = sim.build_storage(np.zeros(shape, np.float32),
                           np.ones(shape, np.float32))
    assert st[0] == "folded" and st[3] == 16 and st[6] == 2
    # fold='off' must neither fold nor adopt the fold record's tiles
    sim_off = PallasSimulation(params, boundary="zero", fold="off",
                               interpret=False, resident="off",
                               engine="windowed")
    st_off = sim_off.build_storage(np.zeros(shape, np.float32),
                                  np.ones(shape, np.float32))
    assert st_off[0] == "windowed" and st_off[3] != 16
    # narrow domains get fold candidates; wide/bf16 ones do not
    cands = autotune._fold_candidates((1080, 1920), "zero", "float32")
    assert cands and all(cd["fold"] == 2 for cd in cands)
    assert autotune._fold_candidates((4096, 4096), "zero", "float32") == []
    assert autotune._fold_candidates((1080, 1920), "zero", "bfloat16") == []
    assert autotune._fold_candidates((1080, 1900), "naive", "float32") == []
    for cd in cands:
        assert autotune._guard_ok(cd, (1080, 1920), "zero")


def test_engine_candidates():
    """Engine candidates: mega wherever the domain supports full-width
    windows (any storage dtype — the megakernel runs bf16 too), resident
    for VMEM-resident f32 sizes only."""
    from grayscott_tpu.bench import autotune

    cands = autotune._engine_candidates((1080, 1920), "float32")
    assert any(c.get("engine") == "mega" for c in cands)
    assert any(c.get("resident") == "on" for c in cands)
    for c in cands:
        assert autotune._guard_ok(c, (1080, 1920), "naive"), c
    bf = autotune._engine_candidates((1080, 1920), "bfloat16")
    assert any(c.get("engine") == "mega" for c in bf)
    assert not any(c.get("resident") for c in bf)  # resident is f32-only
    big = autotune._engine_candidates((8192, 8192), "float32")
    assert any(c.get("engine") == "mega" for c in big)
    assert not any(c.get("resident") for c in big)  # far past residency
    # very wide domains: the geometry heuristic column-tiles the
    # megakernel windows, so mega candidates exist (auto geometry plus
    # the double-width tile); the full-width pin is excluded by its 3x
    # halo redundancy at tr=8
    wide = autotune._engine_candidates((4096, 65536), "float32")
    megas = [c for c in wide if c.get("engine") == "mega"]
    assert megas and not any(c.get("block_rows") for c in megas)
    for c in wide:
        assert autotune._guard_ok(c, (4096, 65536), "zero"), c


def test_engine_verdict_adoption(monkeypatch, tmp_path, params):
    """A persisted engine verdict overrides the static engine preference;
    alternative-engine records never leak tiles into the windowed path."""
    import jax
    import numpy as np

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    shape = (64, 256)
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                         ps.KERNEL_VERSION)
    u = np.zeros(shape, np.float32)
    v = np.ones(shape, np.float32)

    def build(**kw):
        sim = PallasSimulation(params, boundary="zero", interpret=True, **kw)
        sim.interpret = False  # allow adoption; kernels never run here
        return sim.build_storage(u, v)

    # no record: the static preference picks resident on resident-size
    # domains (hardware: 43.3 vs 39.4 Gcell/s at 1080x1920)
    assert build()[0] == "resident"
    # mega verdict: mega storage with the recorded row block
    c.save_autotune({key: {"engine": "mega", "block_rows": 16,
                           "steps_per_call": 8, "block_cols": None,
                           "fold": 1}})
    st = build()
    assert st[0] == "mega" and st[3] == 16
    # windowed verdict: windowed storage adopting the record's tiles
    c.save_autotune({key: {"engine": "windowed", "block_rows": 16,
                           "steps_per_call": 4, "block_cols": None,
                           "fold": 1}})
    st = build()
    assert st[0] == "windowed" and st[3] == 16 and st[7] == 4
    # resident verdict: resident storage
    c.save_autotune({key: {"engine": "resident", "block_rows": None,
                           "steps_per_call": 16, "block_cols": None,
                           "fold": 1}})
    assert build()[0] == "resident"
    # user pins engine=windowed: a mega record's block_rows must NOT
    # masquerade as a windowed tile
    c.save_autotune({key: {"engine": "mega", "block_rows": 48,
                           "steps_per_call": 8, "block_cols": None,
                           "fold": 1}})
    st = build(engine="windowed", resident="off")
    assert st[0] == "windowed" and st[3] != 48


def test_shipped_defaults_schema_and_fallback(monkeypatch, tmp_path, params):
    """Shipped v5e-measured verdicts (bench/defaults.py): well-formed
    records, used by lookup only on a local-store miss, overridden by a
    local record. pack/fold='auto' act only on measured records, so a
    fresh install needs these to reach the measured winners."""
    import jax

    from grayscott_tpu.bench import autotune
    from grayscott_tpu.bench.defaults import SHIPPED
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))  # empty local store
    for key, rec in SHIPPED.items():
        # shipped keys carry the measuring device's KIND, never a bare
        # platform string (they must not apply on other generations)
        assert key.startswith(f"v{ps.KERNEL_VERSION}:v5e:")
        assert set(rec) >= {"engine", "block_rows", "steps_per_call",
                            "fold", "pack", "gcells_per_sec", "source"}
        assert "block_cols" not in rec  # never pin column tiling blind

    class _Dev:
        platform = "tpu"
        device_kind = "TPU v5 lite"

    monkeypatch.setattr(jax, "devices", lambda *a: [_Dev()])
    monkeypatch.setenv("GRAYSCOTT_DEVICE_KIND", "TPU v5 lite")
    rec = autotune.lookup(params, (2048, 2048), "zero")
    assert rec is not None and rec["pack"] is True
    assert rec["source"].startswith("shipped-v5e")
    # the backend acts on the shipped verdict like any measured record
    from grayscott_tpu.backends.pallas import PallasSimulation

    sim = PallasSimulation(params, boundary="zero", interpret=False)
    sim.interpret = False
    assert sim._use_pack((2048, 2048))
    assert not sim._use_pack((4096, 4096))  # shipped says unpacked there
    # a local record always wins over the shipped table
    key = c.autotune_key("tpu", (2048, 2048), "zero",
                         params.stencil_name(), ps.KERNEL_VERSION)
    c.save_autotune({key: {"engine": "mega", "block_rows": None,
                           "steps_per_call": 16, "fold": 1, "pack": False,
                           "gcells_per_sec": 60.0, "source": "local"}})
    rec2 = autotune.lookup(params, (2048, 2048), "zero")
    assert rec2["source"] == "local" and rec2["pack"] is False
