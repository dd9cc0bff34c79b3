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


# -- slow-marker split (VERDICT r4 #7) ---------------------------------------
# The interpret-mode Pallas/megakernel/sharded heavyweights dominate the
# ~55-minute full suite. They get an automatic `slow` marker here (a
# curated list driven by the measured per-test durations, r5) so the
# edit-test loop can run `pytest -m "not slow"` in well under 10 minutes;
# default CI (and plain `pytest tests/`) still runs EVERYTHING — the
# split deselects, it never skips. The reference's analog split: fast
# `cargo test --workspace` on every push vs the cron matrix
# (.github/workflows/ci.yml:12-16).

_SLOW_FILES = {
    "test_mega.py",           # interpret-mode megakernel fuzz/parity
    "test_mega_sharded.py",   # multi-chip megakernel + race detector
    "test_stripstore.py",     # naive_fix=store ulp budgets
    "test_slicetaps.py",      # naive_fix=slice ulp budgets
    "test_fold.py",           # lane-fold layout parity
    "test_pack.py",           # species-packed layout parity
    "test_distributed.py",    # two-process jax.distributed
    "test_distributed_cli.py",  # two-process binary integration
}

_SLOW_TESTS = {
    ("test_pallas.py", "test_row_tile_smaller_than_halo_stays_exact"),
    ("test_pallas.py", "test_runtime_params_reuse_executable"),
    ("test_pallas.py", "test_runtime_params_bit_identical_to_static"),
    ("test_pallas.py", "test_multistep_parity"),
    ("test_pallas.py", "test_deep_halo_k16"),
    ("test_pallas.py", "test_standard_init_long"),
    ("test_sharded.py", "test_overlap_falls_back_when_tr_below_halo"),
    ("test_sharded.py", "test_overlap_mode_matches_serialized"),
    ("test_sharded.py", "test_sharded_extract_result_matches_uv"),
    ("test_sharded.py", "test_deep_k_sharded"),
    ("test_cache.py", "test_autotune_skips_compile_ceiling"),
    ("test_cache.py", "test_autotune_records_all_candidates"),
    ("test_support.py", "test_supported_pallas_combinations"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        base = item.name.split("[")[0]
        if fname in _SLOW_FILES or (fname, base) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
