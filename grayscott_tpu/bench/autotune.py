"""Kernel autotuner: measure kernel specializations on the live device
and persist the winner.

The runtime analog of the reference's compile-time backend selection plus
hwloc-derived block-size defaults (compute/selector/src/lib.rs:4-59,
compute/block/src/default.rs:6-57): instead of trusting a hardware model,
measure candidate kernel specializations on the actual chip and cache the
best per (platform, domain, boundary, stencil) in
``~/.cache/grayscott_tpu/autotune.json``.

Tuned dimensions: ``block_rows`` (row tile), ``steps_per_call`` (temporal
blocking depth), and — for domains too wide for full-width VMEM windows —
``block_cols`` (intra-kernel column tiling). The Mosaic scoped-VMEM limit
is derived per candidate from the tile footprint
(ops.pallas_stencil.choose_vmem_limit), so large tiles compile with the
budget they need instead of failing at a fixed cap.
"""

from __future__ import annotations

import time
from typing import Iterable, Mapping, Tuple, Union

import numpy as np

from ..ops import pallas_stencil as ps
from ..params import Parameters
from ..utils import cache

Candidate = Union[Tuple[int, int], Mapping]

DEFAULT_CANDIDATES: Tuple[Mapping, ...] = (
    # (block_rows, steps_per_call); measured on the v2 kernel on v5e:
    # the step loop is VPU-bound, so large tiles win on halo redundancy —
    # (256, 16) -> 65.6 Gcell/s zero-border at 4096^2 (1.28x the
    # single-step HBM roofline). The taller tiles win on narrower domains
    # ((544, 16) -> 38.2 at 1080x1920 vs 33.6 for (256, 16)) and are
    # auto-skipped by the compile-ceiling guard where the window would be
    # too wide to compile (e.g. at C=4096).
    dict(block_rows=256, steps_per_call=16),
    dict(block_rows=192, steps_per_call=16),
    dict(block_rows=544, steps_per_call=16),
    dict(block_rows=368, steps_per_call=16),
    dict(block_rows=96, steps_per_call=8),
)


def _as_config(c: Candidate) -> dict:
    if isinstance(c, Mapping):
        return dict(c)
    tr, k = c  # legacy (block_rows, steps_per_call) tuples
    return dict(block_rows=tr, steps_per_call=k)


def _wide_domain_candidates(shape, base: Iterable[Mapping]) -> list[dict]:
    """Column-tiling variants for domains whose full-width window pair
    exceeds VMEM: the heuristic tile width and its 2x/0.5x neighbors."""
    _, c = shape
    tc0 = ps.choose_block_cols(c)
    if tc0 is None:
        return []
    out = []
    widths = {tc0}
    widths.add(min(-(-c // 128) * 128, 2 * tc0))
    if tc0 >= 1024:
        widths.add(tc0 // 2 // 128 * 128)
    for cfg in base:
        for tc in sorted(widths):
            if tc and tc < c:
                out.append({**cfg, "block_cols": tc})
    return out


def measure_config(
    params: Parameters, shape, boundary: str, steps: int = 256,
    dtype: str = "float32", **config,
) -> float:
    """Gcell/s of one kernel specialization (single dispatch, tiny sync).

    ``config``: block_rows, steps_per_call, optional block_cols. The
    scoped-VMEM limit is auto-scaled with the tile footprint unless
    overridden via ``vmem_limit_bytes``.
    """
    import jax.numpy as jnp

    from ..backends.pallas import PallasSimulation

    sim = PallasSimulation(params, boundary=boundary, dtype=dtype, **config)
    species = sim.make_species(shape)
    k = config.get("steps_per_call") or sim.steps_per_call
    sim.prepare_steps(species, k)  # compile + warmup
    float(np.asarray(jnp.sum(species.result()[:1, :128])))
    t0 = time.time()
    sim.prepare_steps(species, steps)
    float(np.asarray(jnp.sum(species.result()[:1, :128])))
    dt = time.time() - t0
    return shape[0] * shape[1] * steps / dt / 1e9


def autotune(
    params: Parameters, shape, boundary: str = "naive",
    candidates: Iterable[Candidate] = DEFAULT_CANDIDATES,
    persist: bool = True, verbose: bool = False, dtype: str = "float32",
) -> dict:
    """Measure candidates, persist and return the best config dict.

    The winner records block_rows, steps_per_call and block_cols (None =
    full-width windows won); PallasSimulation adopts all three when the
    user pins none.
    """
    import jax

    platform = jax.devices()[0].platform
    key = cache.autotune_key(platform, shape, boundary,
                             params.stencil_name(), ps.KERNEL_VERSION)
    store = cache.load_autotune()
    if key in store:
        return store[key]
    configs = [_as_config(c) for c in candidates]
    configs += _wide_domain_candidates(shape, configs[:2])
    best = None
    for cfg in configs:
        # compile-tractability guard: windows past the measured Mosaic
        # ceiling send the remote compile into tens of minutes — skip
        # rather than hang the tuner (ops.pallas_stencil.window_compile_ok)
        halo = max(-(-cfg["steps_per_call"] // 8) * 8, ps.HALO)
        chalo = ps.COL_HALO if cfg.get("block_cols") else 0
        w_cols = (cfg["block_cols"] + 2 * chalo) if cfg.get("block_cols") \
            else shape[1]
        if not ps.window_compile_ok(cfg["block_rows"], halo, w_cols, boundary,
                                    cfg["steps_per_call"]):
            if verbose:
                print(f"{cfg}: SKIP (window past the compile ceiling)")
            continue
        try:
            rate = measure_config(params, shape, boundary, dtype=dtype, **cfg)
        except Exception as e:  # config may not fit VMEM etc.
            if verbose:
                print(f"{cfg}: FAIL ({type(e).__name__})")
            continue
        if verbose:
            print(f"{cfg}: {rate:.2f} Gcell/s")
        if best is None or rate > best["gcells_per_sec"]:
            best = {
                "block_rows": cfg["block_rows"],
                "steps_per_call": cfg["steps_per_call"],
                "block_cols": cfg.get("block_cols"),
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
