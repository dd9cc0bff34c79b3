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
    path = cache.enable_compilation_cache()
    assert os.path.isdir(path)
    import jax

    assert jax.config.jax_compilation_cache_dir == path
