"""Two-process distributed bring-up on CPU (multi-controller JAX).

Exercises the real ``jax.distributed.initialize`` path — env parsing
(``GRAYSCOTT_COORDINATOR``/``GRAYSCOTT_NUM_PROCESSES``/
``GRAYSCOTT_PROCESS_ID``), the collective :func:`fetch` allgather, and
primary-only I/O — with two launched processes on one machine, each
contributing 2 virtual CPU devices to a 4-device global mesh running the
sharded backend with halo exchange. This is the multi-host slice pattern
(DCN) that cannot be tested on this repo's single tunneled chip; SURVEY.md
§5 "Distributed communication backend"."""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["GS_REPO"])
from grayscott_tpu.utils import distributed as dist

assert dist.maybe_initialize() is True
assert jax.process_count() == 2
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
from grayscott_tpu.backends.sharded import ShardedSimulation
from grayscott_tpu.params import Parameters

shape = (32, 24)
sim = ShardedSimulation(
    Parameters(), boundary="naive", steps_per_call=4, block_rows=8,
)
species = sim.make_species(shape)
sim.perform_steps(species, 9)
# collective: EVERY process participates, only the primary writes
v = dist.fetch(sim.extract_result(species.storage, shape))
if dist.is_primary():
    np.save(os.environ["GS_OUT"], v)
print("RANK_OK", jax.process_index(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_run(tmp_path):
    port = _free_port()
    out = tmp_path / "result.npy"
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            GS_REPO=REPO,
            GS_OUT=str(out),
            GRAYSCOTT_COORDINATOR=f"127.0.0.1:{port}",
            GRAYSCOTT_NUM_PROCESSES="2",
            GRAYSCOTT_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        # each process must NOT inherit a pinned single-process backend
        env.pop("JAX_PLATFORM_NAME", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", "-c", CHILD],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out (coordinator hang?)")
        outputs.append(stdout)
    for rank, (p, stdout) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{stdout[-3000:]}"
        assert "RANK_OK" in stdout
    # primary-only write happened, and the physics matches the oracle
    assert out.exists()
    got = np.load(out)
    from grayscott_tpu import oracle
    from grayscott_tpu.params import Parameters
    from grayscott_tpu.species import initial_uv

    u0, v0 = initial_uv((32, 24))
    _, expect = oracle.run(u0, v0, Parameters(), 9, "naive")
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-6)
