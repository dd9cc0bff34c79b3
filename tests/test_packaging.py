"""Packaging metadata stays consistent with the code (the Cargo-workspace
analog, /root/reference/Cargo.toml:1-19 and per-crate [[bin]] entries)."""

import importlib
import os

import pytest

# stdlib tomllib is 3.11+; the package itself supports 3.10
# (requires-python >= 3.10), so skip rather than fail collection there
tomllib = pytest.importorskip("tomllib")

PYPROJECT = os.path.join(os.path.dirname(__file__), "..", "pyproject.toml")


def load_pyproject():
    with open(PYPROJECT, "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    """Every [project.scripts] entry points at an importable callable."""
    scripts = load_pyproject()["project"]["scripts"]
    # the three reference binaries plus the benchmark harness
    for name in ("grayscott-simulate", "grayscott-data-to-pics",
                 "grayscott-livesim", "grayscott-bench"):
        assert name in scripts
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_declared_dependencies_importable():
    """The declared runtime deps exist in this environment (keeps the
    dependency list honest — nothing undeclared, nothing phantom)."""
    import re

    deps = load_pyproject()["project"]["dependencies"]
    mods = {"jax": "jax", "numpy": "numpy", "h5py": "h5py",
            "pillow": "PIL", "matplotlib": "matplotlib"}
    names = {re.split(r"[<>=\[ ]", d)[0] for d in deps}
    assert names == set(mods)
    for dep in names:
        importlib.import_module(mods[dep])


def test_native_source_shipped():
    """The C++ source must ride along in the wheel (it compiles on first
    use at the install site)."""
    data = load_pyproject()["tool"]["setuptools"]["package-data"]
    assert "*.cpp" in data["grayscott_tpu.native"]
    import grayscott_tpu.native as native

    for src in native._SRCS:
        assert os.path.exists(src)
