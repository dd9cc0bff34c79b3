"""Toolchain-gated Rust golden-parity automation (scripts/parity_rust.py).

The real diff needs a cargo toolchain (absent in this image, recorded in
PARITY.md); what IS testable everywhere: the clean-skip contract, the
HDF5 snapshot comparator, and the exact reference CLI invocation the
script would issue (simulate/src/main.rs:24-44 argument surface)."""

import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import parity_rust  # noqa: E402


def _write_matrix(path, data):
    with h5py.File(path, "w") as f:
        f.create_dataset("matrix", data=np.asarray(data, dtype=np.float32))


def test_skips_cleanly_without_toolchain(monkeypatch, capsys):
    monkeypatch.setattr(parity_rust, "find_cargo", lambda: None)
    assert parity_rust.main([]) == 0
    assert "SKIP" in capsys.readouterr().out


def test_skips_cleanly_without_reference(monkeypatch, tmp_path, capsys):
    # toolchain present but no reference checkout at the given path
    monkeypatch.setattr(parity_rust, "find_cargo", lambda: "/usr/bin/cargo")
    assert parity_rust.main(["--reference", str(tmp_path)]) == 0
    assert "SKIP" in capsys.readouterr().out


def test_script_entrypoint_today():
    """The committed invocation (what the CI job runs) exits 0 on this
    toolchain-less image."""
    rc = subprocess.run(
        [sys.executable, "scripts/parity_rust.py"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stderr
    assert "SKIP" in rc.stdout


def test_compare_within_and_beyond_tol(tmp_path):
    a = np.random.RandomState(0).rand(3, 4, 5).astype(np.float32)
    ra, rb = tmp_path / "a.h5", tmp_path / "b.h5"
    _write_matrix(ra, a)
    b = a.copy()
    b[1, 2, 3] += 5e-6
    _write_matrix(rb, b)
    rep = parity_rust.compare(str(ra), str(rb), tol=1e-5)
    assert rep["ok"] and rep["worst"] == pytest.approx(5e-6, rel=0.2)
    assert len(rep["rows"]) == 3
    rep = parity_rust.compare(str(ra), str(rb), tol=1e-6)
    assert not rep["ok"]


def test_compare_layout_mismatch_is_a_failure(tmp_path):
    ra, rb = tmp_path / "a.h5", tmp_path / "b.h5"
    _write_matrix(ra, np.zeros((2, 4, 4)))
    _write_matrix(rb, np.zeros((2, 4, 5)))
    with pytest.raises(ValueError, match="layout mismatch"):
        parity_rust.compare(str(ra), str(rb), tol=1.0)


def test_reference_invocation_arguments(monkeypatch, tmp_path):
    """run_reference issues exactly the reference CLI surface: -n images,
    -e steps/image, -r/-c shape, -f/-k rates, -o output — nothing the
    Rust clap parser (simulate/src/main.rs:24-44, ui/src/lib.rs:18-46)
    would reject."""
    calls = []
    monkeypatch.setattr(parity_rust.subprocess, "run",
                        lambda cmd, **kw: calls.append(cmd))
    parity_rust.run_reference("/bin/sim", "/tmp/o.h5", (256, 384), 10, 100)
    (cmd,) = calls
    assert cmd[0] == "/bin/sim"
    opts = dict(zip(cmd[1::2], cmd[2::2]))
    assert opts == {"-n": "10", "-e": "100", "-r": "256", "-c": "384",
                    "-f": "0.014", "-k": "0.054", "-o": "/tmp/o.h5"}


def test_build_reference_redirects_target_dir(monkeypatch, tmp_path):
    """The reference tree may be read-only: the build must write all
    artifacts through CARGO_TARGET_DIR and use the committed lockfile."""
    seen = {}

    def fake_run(cmd, cwd=None, env=None, check=None):
        seen.update(cmd=cmd, cwd=cwd, env=env)
        bindir = os.path.join(env["CARGO_TARGET_DIR"], "release")
        os.makedirs(bindir, exist_ok=True)
        path = os.path.join(bindir, "simulate")
        open(path, "w").close()
        os.chmod(path, 0o755)

    monkeypatch.setattr(parity_rust.subprocess, "run", fake_run)
    target = str(tmp_path / "target")
    binary = parity_rust.build_reference("cargo", "/root/reference", target)
    assert binary == os.path.join(target, "release", "simulate")
    assert seen["cwd"] == "/root/reference"
    assert "--locked" in seen["cmd"] and "--release" in seen["cmd"]
    assert seen["cmd"][seen["cmd"].index("--features") + 1] == \
        "compute_naive"
    assert seen["env"]["CARGO_TARGET_DIR"] == target
