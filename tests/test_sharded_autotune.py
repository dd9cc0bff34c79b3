"""Sharded-backend autotuning (VERDICT r4 #2): candidates over engine /
mesh factorization / per-shard tiles / K / overlap, records keyed on the
topology, and ShardedSimulation adopting records exactly like
PallasSimulation does — the reference's parallel rung ships tunables with
measured defaults (compute/parallel/src/args.rs:8-28,
compute/parallel/src/block.rs:12-47); here the machine measures them.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.sharded import ShardedSimulation
from grayscott_tpu.bench import autotune
from grayscott_tpu.params import Parameters
from grayscott_tpu.species import initial_uv
from grayscott_tpu.utils import cache as c


@pytest.fixture()
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    return tmp_path


def test_sharded_key_is_topology_specific(params):
    k8 = autotune.sharded_key(params, (64, 256), "naive", "float32", 8)
    k4 = autotune.sharded_key(params, (64, 256), "naive", "float32", 4)
    assert k8 != k4 and "sharded:n8" in k8
    kp = autotune.sharded_key(params, (64, 256), "naive", "float32", 8,
                              mesh_cols=2)
    assert kp != k8 and kp.endswith(":mc2")


def test_viable_mesh_cols_quanta():
    # 8 devices on 64x256: 1-D gives 8-row shards (viable); 2 columns
    # gives 128-col shards (viable); 4 columns would be 64-col shards
    assert autotune._viable_mesh_cols((64, 256), 8) == [1, 2]
    # rows too short for 1-D but a column split works
    assert 8 in autotune._viable_mesh_cols((8, 2048), 8)
    # nothing viable: fall back to [1]
    assert autotune._viable_mesh_cols((8, 64), 8) == [1]


def test_sharded_candidates_honor_pins():
    shape = (128, 256)
    cands = autotune._sharded_candidates(shape, 8, "naive", "float32")
    assert any(x.get("engine") == "mega" for x in cands)
    assert any(x.get("overlap") for x in cands)
    assert {x["mesh_cols"] for x in cands} == {1, 2}
    # engine pin filters
    wins = autotune._sharded_candidates(shape, 8, "naive", "float32",
                                        engine="windowed")
    assert all(x["engine"] == "windowed" for x in wins)
    # overlap pinned on: only windowed overlap candidates remain
    over = autotune._sharded_candidates(shape, 8, "naive", "float32",
                                        overlap=True)
    assert over and all(x["engine"] == "windowed" and x["overlap"]
                        for x in over)
    # mesh pin restricts the factorizations
    m1 = autotune._sharded_candidates(shape, 8, "naive", "float32",
                                      mesh_cols=1)
    assert {x["mesh_cols"] for x in m1} == {1}


def test_sharded_autotune_end_to_end_and_adoption(isolated_cache, params):
    """The full loop on the 8-virtual-device CPU mesh: measure a small
    candidate set, persist the winner under the topology key, and a
    fresh ShardedSimulation (all-auto) adopts engine/mesh/tile/K/overlap
    — while staying oracle-exact."""
    shape = (64, 256)
    cands = [
        dict(engine="windowed", mesh_cols=1, steps_per_call=4,
             overlap=False),
        dict(engine="windowed", mesh_cols=1, steps_per_call=4,
             overlap=False, block_rows=8),
    ]
    best = autotune.sharded_autotune(
        params, shape, "naive", candidates=cands, steps=8, reps=1)
    assert best["engine"] == "windowed"
    assert best["mesh_cols"] == 1 and best["mesh_rows"] == 8
    assert best["block_rows"] is not None
    assert len(best["candidates"]) == 2
    assert "rank_metric" not in best  # transient field never persisted
    key = autotune.sharded_key(params, shape, "naive", "float32", 8)
    assert key in c.load_autotune()
    # a second call is a pure cache hit (no re-measure)
    again = autotune.sharded_autotune(
        params, shape, "naive", candidates=[], steps=8)
    assert again == best

    # adoption: an all-auto sim picks up the record's geometry
    sim = ShardedSimulation(params, boundary="naive")
    species = sim.make_species(shape)
    assert sim.engine == best["engine"]
    assert sim.block_rows == best["block_rows"]
    assert sim.overlap == bool(best["overlap"])
    nr, nc = sim.mesh.devices.shape
    assert (nr, nc) == (best["mesh_rows"], best["mesh_cols"])
    # interpreter mode keeps the small unroll (the pallas _tuned_k
    # contract) — K is NOT adopted under interpret
    assert sim.steps_per_call == 8
    # and the physics is untouched
    sim.perform_steps(species, 5)
    u0, v0 = initial_uv(shape)
    ou, ov = oracle.run(u0, v0, params, 5, "naive")
    gu, gv = species.uv_host()
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_sharded_adoption_pins_win(isolated_cache, params):
    """Explicit pins beat the record: engine, mesh, tile, K and overlap
    stay what the user named, and cross-engine geometry never
    transfers."""
    shape = (64, 256)
    key = autotune.sharded_key(params, shape, "naive", "float32", 8)
    c.save_autotune({key: {
        "engine": "mega", "mesh_cols": 1, "mesh_rows": 8,
        "block_rows": 8, "block_cols": None, "steps_per_call": 8,
        "overlap": False,
    }})
    # engine pinned windowed: the mega record's engine must not apply,
    # nor its tile (measured under the other engine)
    sim = ShardedSimulation(params, boundary="naive", engine="windowed",
                            steps_per_call=4)
    sim.make_species(shape)
    assert sim.engine == "windowed"
    assert sim.block_rows is None  # cross-engine tile never transfers
    assert sim.steps_per_call == 4  # explicit K pin wins
    # overlap pinned on excludes adopting the mega engine
    sim2 = ShardedSimulation(params, boundary="naive", overlap=True,
                             steps_per_call=4)
    sim2.make_species(shape)
    assert sim2.engine == "windowed" and sim2.overlap is True


def test_sharded_adoption_tile_transfers_on_match(isolated_cache, params):
    """When the sim resolves to the record's engine and mesh, the
    recorded per-shard tile and overlap verdict apply."""
    shape = (64, 256)
    key = autotune.sharded_key(params, shape, "naive", "float32", 8)
    c.save_autotune({key: {
        "engine": "windowed", "mesh_cols": 1, "mesh_rows": 8,
        "block_rows": 8, "block_cols": None, "steps_per_call": 8,
        "overlap": False,
    }})
    sim = ShardedSimulation(params, boundary="naive", steps_per_call=4)
    sim.make_species(shape)
    assert sim.engine == "windowed"
    assert sim.block_rows == 8
    assert sim.overlap is False
    # tuned_lookup=False (the tuner's own isolation): no adoption at all
    sim2 = ShardedSimulation(params, boundary="naive", steps_per_call=4,
                             tuned_lookup=False)
    sim2.make_species(shape)
    assert sim2.block_rows is None


def test_sharded_adoption_mega_record(isolated_cache, params):
    """An all-auto sim adopts a mega-engine record: engine flips to
    mega, K locks to the exchange depth, and the recorded geometry
    rides along — then the run stays oracle-exact."""
    from grayscott_tpu.ops import megakernel as mk

    shape = (64, 256)
    key = autotune.sharded_key(params, shape, "naive", "float32", 8)
    c.save_autotune({key: {
        "engine": "mega", "mesh_cols": 1, "mesh_rows": 8,
        "block_rows": 8, "block_cols": None,
        "steps_per_call": mk.MEGA_STEPS, "overlap": False,
    }})
    sim = ShardedSimulation(params, boundary="naive")
    species = sim.make_species(shape)
    assert sim.engine == "mega"
    assert sim.steps_per_call == mk.MEGA_STEPS
    assert sim.block_rows == 8
    assert species.storage[0] == "mega"
    sim.perform_steps(species, 4)
    u0, v0 = initial_uv(shape)
    ou, ov = oracle.run(u0, v0, params, 4, "naive")
    gu, gv = species.uv_host()
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_cli_autotune_sharded_backend(isolated_cache, monkeypatch):
    """--autotune --backend sharded works end-to-end: the CLI hook runs
    the sharded tuner (with the CLI's pins) and the simulation it builds
    adopts the persisted winner."""
    import argparse

    from grayscott_tpu.cli import shared

    calls = {}
    real = autotune.sharded_autotune

    def spy(params, shape, boundary, **kw):
        calls.update(shape=shape, boundary=boundary, **kw)
        return real(params, shape, boundary,
                    candidates=[dict(engine="windowed", mesh_cols=1,
                                     steps_per_call=4, overlap=False)],
                    steps=8, reps=1, verbose=kw.get("verbose", False))

    monkeypatch.setattr(autotune, "sharded_autotune", spy)
    parser = argparse.ArgumentParser()
    shared.add_shared_args(parser)
    ns = parser.parse_args(["-r", "64", "-c", "256", "--backend", "sharded",
                            "--autotune"])
    sim = shared.make_simulation(ns)
    assert calls["shape"] == (64, 256)
    assert calls["n_devices"] is None and calls["mesh_cols"] is None
    sim.make_species((64, 256))
    assert sim.block_rows is not None  # adopted the measured winner


# -- round-5 review regressions ----------------------------------------------


def test_k_never_transfers_cross_engine(isolated_cache, params):
    """Review r5 #1: a mega record's K must not detune a pinned-windowed
    sim — K transfers only when engine AND mesh match the record."""
    shape = (64, 256)
    key = autotune.sharded_key(params, shape, "naive", "float32", 8,
                               engine="windowed")
    c.save_autotune({key: {
        "engine": "mega", "mesh_cols": 1, "mesh_rows": 8,
        "block_rows": 8, "block_cols": None, "steps_per_call": 32,
        "overlap": False,
    }})
    sim = ShardedSimulation(params, boundary="naive", engine="windowed",
                            interpret=False)
    k0 = sim.steps_per_call
    sim._adopt_record(shape)
    assert sim.engine == "windowed"
    assert sim.steps_per_call == k0  # the mega record's K=32 ignored
    # matched case: a windowed record's K DOES transfer off-interpret
    c.save_autotune({key: {
        "engine": "windowed", "mesh_cols": 1, "mesh_rows": 8,
        "block_rows": 8, "block_cols": None, "steps_per_call": 32,
        "overlap": False,
    }})
    sim2 = ShardedSimulation(params, boundary="naive", engine="windowed",
                             interpret=False)
    sim2._adopt_record(shape)
    assert sim2.steps_per_call == 32


def test_pinned_key_isolated_from_auto_records(isolated_cache, params):
    """Review r5 #2: engine/overlap pins key their own records, so a
    pin-restricted --autotune neither reads nor writes the all-auto
    verdict."""
    shape = (64, 256)
    kauto = autotune.sharded_key(params, shape, "naive", "float32", 8)
    kmega = autotune.sharded_key(params, shape, "naive", "float32", 8,
                                 engine="mega")
    kover = autotune.sharded_key(params, shape, "naive", "float32", 8,
                                 overlap=True)
    assert len({kauto, kmega, kover}) == 3
    # an all-auto record does NOT short-circuit a pinned tune
    c.save_autotune({kauto: {"engine": "mega", "mesh_cols": 1}})
    best = autotune.sharded_autotune(
        params, shape, "naive", engine="windowed",
        candidates=[dict(engine="windowed", mesh_cols=1,
                         steps_per_call=4, overlap=False)],
        steps=8, reps=1)
    assert best["engine"] == "windowed"
    kwin = autotune.sharded_key(params, shape, "naive", "float32", 8,
                                engine="windowed")
    store = c.load_autotune()
    assert kwin in store and store[kauto] == {"engine": "mega",
                                              "mesh_cols": 1}
    # and the adoption lookup honors the pin-specific key
    sim = ShardedSimulation(params, boundary="naive", engine="windowed",
                            steps_per_call=4)
    sim.make_species(shape)
    assert sim.block_rows == best["block_rows"]


def test_overlap_candidates_actually_engage(params):
    """Review r5 #4: every generated overlap candidate pins a row tile
    the engagement rule accepts — a 'measured overlap' record can never
    be the serialized fallback in disguise."""
    from grayscott_tpu.parallel import halo as ph

    cands = autotune._sharded_candidates((512, 256), 8, "naive",
                                         "float32")
    overlaps = [x for x in cands if x.get("overlap")]
    assert overlaps
    for x in overlaps:
        from grayscott_tpu.ops import pallas_stencil as ps

        nc = x["mesh_cols"]
        nr = 8 // nc
        r_loc = -(-512 // nr)
        h = ps.halo_for_steps(x["steps_per_call"])
        assert ph.overlap_engages(r_loc, x["block_rows"], h,
                                  chalo=h if nc > 1 else 0,
                                  c_loc=-(-256 // nc))
    # a shard too short for 3 tiles generates no overlap candidate
    small = autotune._sharded_candidates((64, 256), 8, "naive", "float32")
    assert not any(x.get("overlap") for x in small)


def test_empty_pinned_candidates_raise_config_error(isolated_cache,
                                                    params):
    """Review r5 #5: an overlap pin no geometry can satisfy raises the
    uniform UnsupportedConfigError, not a bare RuntimeError."""
    import pytest

    from grayscott_tpu.errors import UnsupportedConfigError

    with pytest.raises(UnsupportedConfigError, match="overlap"):
        autotune.sharded_autotune(params, (64, 128), "naive",
                                  overlap=True)


def test_resident_on_rejects_store(params):
    """Review r5 #3: resident='on' + naive_fix='store' is a rejected
    conflict, not a silently different kernel (slice IS plumbed into
    the resident kernel, tests/test_slicetaps.py)."""
    import pytest

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.errors import UnsupportedConfigError

    with pytest.raises(UnsupportedConfigError, match="resident"):
        PallasSimulation(params, boundary="naive", interpret=True,
                         resident="on", naive_fix="store")
