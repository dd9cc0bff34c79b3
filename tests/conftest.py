"""Test configuration.

Tests run on the CPU platform with 8 virtual devices so that multi-chip
sharding (halo exchange over a mesh) is exercised without TPU hardware —
the standard JAX trick the reference lacks for its GPU backends
(see SURVEY.md section 4 and .github/workflows/ci.yml:201-206's FIXME).
Pallas kernels run in interpreter mode on CPU.
"""

import os

# Must be set before jax is imported by any test module. Plain assignment,
# not setdefault: the environment may pre-set JAX_PLATFORMS to a hardware
# plugin (e.g. a tunneled TPU), and tests must not hog that device.
# Set GRAYSCOTT_TEST_TPU=1 to run the suite on real hardware instead.
if not os.environ.get("GRAYSCOTT_TEST_TPU"):
    # env assignment too (not just jax.config): subprocess-spawning tests
    # (two-process jax.distributed, CLI drivers) inherit the environment
    os.environ["JAX_PLATFORMS"] = "cpu"
    # never write the persistent compilation cache from the CPU suite:
    # once a CLI test enables it, every later compile in the process is
    # serialized into it — and serializing interpret-mode Pallas
    # executables (host callbacks) segfaulted the interpreter twice at
    # the same test (utils/cache.enable_compilation_cache docstring)
    os.environ["GRAYSCOTT_NO_PERSISTENT_CACHE"] = "1"
    from grayscott_tpu.utils.runtime import force_virtual_devices

    force_virtual_devices(8)

import numpy as np
import pytest

from grayscott_tpu.params import Parameters


@pytest.fixture
def params():
    return Parameters()


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def random_uv(rng, shape):
    """Random but physically-plausible concentrations."""
    u = rng.uniform(0.0, 1.0, shape).astype(np.float32)
    v = rng.uniform(0.0, 1.0, shape).astype(np.float32)
    return u, v
