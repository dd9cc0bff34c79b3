"""Sweep-result adoption: scripts/adopt_sweep.py writes autotune records
that the backends actually follow."""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def adopt():
    spec = importlib.util.spec_from_file_location(
        "adopt_sweep", os.path.join(REPO, "scripts", "adopt_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _log(tmp_path, lines):
    p = tmp_path / "sweep.log"
    p.write_text("\n".join(json.dumps(l) for l in lines) + "\nDONE\n")
    return str(p)


def test_adopt_writes_pack_record(adopt, tmp_path, monkeypatch, params):
    import jax

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "zero",
                    "pack": "on", "engine": "mega"},
         "gcells_per_sec": 50.0},
        {"config": {"shape": [64, 128], "boundary": "zero"},
         "gcells_per_sec": 40.0},
    ])
    platform = jax.devices()[0].platform
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()
    (key,) = rec.keys()
    assert rec[key]["pack"] is True
    assert rec[key]["engine"] == "mega"
    assert len(rec[key]["candidates"]) == 2
    # the backend follows the adopted verdict
    sim = PallasSimulation(params, boundary="zero", interpret=False)
    assert sim._use_pack((64, 128))


def test_adopt_skips_strip_store(adopt, tmp_path, monkeypatch, params):
    """A winning strip-store result is never auto-adopted (records cannot
    express naive_fix; silently switching it would change the naive
    path's bit-frozen rounding)."""
    import jax

    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "naive",
                    "fix": "store"},
         "gcells_per_sec": 99.0},
        {"config": {"shape": [64, 128], "boundary": "naive", "tr": 16,
                    "k": 8, "engine": "windowed"},
         "gcells_per_sec": 40.0},
    ])
    platform = jax.devices()[0].platform
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()
    (key,) = rec.keys()
    assert rec[key]["block_rows"] == 16  # the select result, not store


def test_adopt_keeps_better_existing(adopt, tmp_path, monkeypatch, params):
    import jax

    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    platform = jax.devices()[0].platform
    from grayscott_tpu.params import Parameters

    key = c.autotune_key(platform, (64, 128), "zero",
                         Parameters().stencil_name(), ps.KERNEL_VERSION)
    c.save_autotune({key: {
        "engine": "mega", "block_rows": 16, "steps_per_call": 16,
        "block_cols": None, "fold": 1, "pack": False,
        "gcells_per_sec": 60.0,
    }})
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "zero",
                    "pack": "on", "engine": "mega"},
         "gcells_per_sec": 55.0},
    ])
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()[key]
    assert rec["pack"] is False and rec["gcells_per_sec"] == 60.0
    # the losing sweep result is still auditable
    assert any(cand.get("source") == "sweep"
               for cand in rec["candidates"])


def test_adopt_writes_fold_record(adopt, tmp_path, monkeypatch, params):
    """A fold-pinned winner MUST be adopted: fold='auto' only ever folds
    on a persisted record, never heuristically — the engine=auto skip
    branch does not apply to it (review finding, round 2)."""
    import jax

    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "zero", "fold": 2},
         "gcells_per_sec": 50.0},
        {"config": {"shape": [64, 128], "boundary": "zero"},
         "gcells_per_sec": 40.0},
    ])
    platform = jax.devices()[0].platform
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()
    (key,) = rec.keys()
    assert rec[key]["fold"] == 2
    assert rec[key]["engine"] is None and rec[key]["pack"] is False


def test_adopt_auto_win_retires_stale_pin(adopt, tmp_path, monkeypatch,
                                          params):
    """A measured engine=auto winner past the margin RETIRES a stored
    engine pin (round-2 review: the old auto-skip branch kept the stale
    pin forever, while the backend keeps following the persisted
    verdict over the heuristics)."""
    import jax

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, (64, 128), "zero",
                         params.stencil_name(), ps.KERNEL_VERSION)
    c.save_autotune({key: {
        "engine": "mega", "block_rows": 16, "steps_per_call": 8,
        "block_cols": None, "fold": 1, "pack": False,
        "gcells_per_sec": 50.0,
    }})
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "zero"},
         "gcells_per_sec": 60.0},  # auto, > 2% better than the pin
    ])
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()[key]
    assert rec["engine"] is None and rec["block_rows"] is None
    assert rec["gcells_per_sec"] == 60.0
    # old pin preserved in the audit table, no longer the verdict
    assert any(cd.get("engine") == "mega" for cd in rec["candidates"])
    # the backend is back on the static preference ladder (resident for
    # this VMEM-resident-size domain), not the retired mega pin
    sim = PallasSimulation(params, boundary="zero", interpret=True)
    sim.interpret = False
    assert sim._use_resident((64, 128))
    assert not sim._use_mega((64, 128))


def test_adopt_auto_win_records_candidates_fresh(adopt, tmp_path,
                                                 monkeypatch, params):
    """With no prior record, an engine=auto winner still persists the
    candidates table (round-2 review: it wrote nothing, losing the
    measurements the docstring promises to preserve)."""
    import jax

    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    path = _log(tmp_path, [
        {"config": {"shape": [64, 128], "boundary": "zero"},
         "gcells_per_sec": 60.0},
        {"config": {"shape": [64, 128], "boundary": "zero",
                    "engine": "mega", "tr": 16},
         "gcells_per_sec": 55.0},
    ])
    platform = jax.devices()[0].platform
    assert adopt.main([path, "--platform", platform]) == 0
    rec = c.load_autotune()
    (key,) = rec.keys()
    assert rec[key]["engine"] is None
    assert len(rec[key]["candidates"]) == 2
    assert any(cd.get("engine") == "mega" and
               cd["gcells_per_sec"] == 55.0
               for cd in rec[key]["candidates"])
