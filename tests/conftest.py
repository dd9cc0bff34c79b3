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


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_state_per_module():
    """Clear JAX's compiled-program caches after every test module.

    The full suite segfaulted three times inside XLA:CPU — twice while
    writing interpret-mode executables to the persistent cache (now
    disabled for tests, see GRAYSCOTT_NO_PERSISTENT_CACHE above) and
    once inside backend_compile_and_load itself — always in the same
    late-alphabet module, only after ~500 accumulated in-process
    compilations, and never when the module runs alone. Dropping
    references to compiled executables at module boundaries bounds the
    live JIT code arena instead of letting it grow monotonically for an
    hour. Shapes/kernels rarely repeat across modules, so the recompile
    cost is small.
    """
    yield
    import jax

    jax.clear_caches()
