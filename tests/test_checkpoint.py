"""Checkpoint/resume: a full run must equal a checkpointed split run."""

import numpy as np
import pytest

from grayscott_tpu.cli import simulate
from grayscott_tpu.io.checkpoint import load_state, save_state
from grayscott_tpu.io.hdf5 import Reader
from grayscott_tpu.params import Parameters

from conftest import random_uv


def test_state_roundtrip(tmp_path, rng):
    u, v = random_uv(rng, (13, 17))
    p = Parameters(feed_rate=0.02)
    save_state(tmp_path / "ck.h5", u, v, p, steps_performed=77)
    u2, v2, p2, steps = load_state(tmp_path / "ck.h5")
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(v, v2)
    assert p2 == p and steps == 77


def test_load_rejects_non_checkpoint(tmp_path):
    import h5py

    with h5py.File(tmp_path / "x.h5", "w") as f:
        f.create_dataset("matrix", data=np.zeros((1, 2, 2), np.float32))
    with pytest.raises(ValueError):
        load_state(tmp_path / "x.h5")


def test_split_run_equals_full_run(tmp_path):
    """8 images straight == 4 images + checkpoint + 4 resumed images."""
    common = ["-r", "24", "-c", "32", "-e", "4", "--backend", "fused"]
    full = tmp_path / "full.h5"
    assert simulate.main(common + ["-n", "8", "-o", str(full)]) == 0

    a = tmp_path / "a.h5"
    ck = tmp_path / "ck.h5"
    b = tmp_path / "b.h5"
    assert simulate.main(
        common + ["-n", "4", "-o", str(a), "--checkpoint", str(ck)]
    ) == 0
    assert simulate.main(
        common + ["-n", "4", "-o", str(b), "--resume", str(ck)]
    ) == 0

    with Reader(full) as rf, Reader(a) as ra, Reader(b) as rb:
        frames_full = list(rf)
        frames_split = list(ra) + list(rb)
    assert len(frames_full) == len(frames_split) == 8
    for i, (x, y) in enumerate(zip(frames_full, frames_split)):
        np.testing.assert_array_equal(x, y, err_msg=f"frame {i}")
