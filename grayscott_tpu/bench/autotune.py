"""Kernel autotuner: measure (block_rows, steps_per_call) on the live device
and persist the winner.

The runtime analog of the reference's compile-time backend selection plus
hwloc-derived block-size defaults (compute/selector/src/lib.rs:4-59,
compute/block/src/default.rs:6-57): instead of trusting a hardware model,
measure candidate kernel specializations on the actual chip and cache the
best per (platform, domain, boundary, stencil) in
``~/.cache/grayscott_tpu/autotune.json``.
"""

from __future__ import annotations

import time
from typing import Iterable, Tuple

import numpy as np

from ..ops import pallas_stencil as ps
from ..params import Parameters
from ..utils import cache

DEFAULT_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    # (block_rows, steps_per_call); measured on the v2 kernel on v5e at
    # 4096^2: the step loop is VPU-bound, so large tiles win on halo
    # redundancy — (256, 16) -> 65.6 Gcell/s zero-border (1.28x the
    # single-step HBM roofline)
    (256, 16),
    (192, 16),
    (384, 16),
    (96, 8),
)


def measure_config(
    params: Parameters, shape, boundary: str, block_rows: int,
    steps_per_call: int, steps: int = 256,
) -> float:
    """Gcell/s of one kernel specialization (single dispatch, tiny sync)."""
    import jax.numpy as jnp

    from ..backends.pallas import PallasSimulation

    sim = PallasSimulation(
        params, boundary=boundary, block_rows=block_rows,
        steps_per_call=steps_per_call, vmem_limit_bytes=64 << 20,
    )
    species = sim.make_species(shape)
    sim.prepare_steps(species, steps_per_call)  # compile + warmup
    float(np.asarray(jnp.sum(species.result()[:1, :128])))
    t0 = time.time()
    sim.prepare_steps(species, steps)
    float(np.asarray(jnp.sum(species.result()[:1, :128])))
    dt = time.time() - t0
    return shape[0] * shape[1] * steps / dt / 1e9


def autotune(
    params: Parameters, shape, boundary: str = "naive",
    candidates: Iterable[Tuple[int, int]] = DEFAULT_CANDIDATES,
    persist: bool = True, verbose: bool = False,
) -> dict:
    """Measure candidates, persist and return the best config dict."""
    import jax

    platform = jax.devices()[0].platform
    key = cache.autotune_key(platform, shape, boundary,
                             params.stencil_name(), ps.KERNEL_VERSION)
    store = cache.load_autotune()
    if key in store:
        return store[key]
    best = None
    for block_rows, k in candidates:
        try:
            rate = measure_config(params, shape, boundary, block_rows, k)
        except Exception as e:  # config may not fit VMEM etc.
            if verbose:
                print(f"tr={block_rows} k={k}: FAIL ({type(e).__name__})")
            continue
        if verbose:
            print(f"tr={block_rows} k={k}: {rate:.2f} Gcell/s")
        if best is None or rate > best["gcells_per_sec"]:
            best = {
                "block_rows": block_rows,
                "steps_per_call": k,
                "gcells_per_sec": round(rate, 3),
            }
    if best is None:
        raise RuntimeError("no autotune candidate compiled successfully")
    if persist:
        store[key] = best
        cache.save_autotune(store)
    return best


def lookup(params: Parameters, shape, boundary: str) -> dict | None:
    """Cached best config for this configuration, if any."""
    import jax

    platform = jax.devices()[0].platform
    key = cache.autotune_key(platform, shape, boundary,
                             params.stencil_name(), ps.KERNEL_VERSION)
    return cache.load_autotune().get(key)
