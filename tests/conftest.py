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
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # A sitecustomize may have imported jax already (snapshotting
    # JAX_PLATFORMS before we could set it); override through the config.
    import jax

    jax.config.update("jax_platforms", "cpu")

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
