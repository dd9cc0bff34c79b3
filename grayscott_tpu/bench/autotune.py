"""Kernel autotuner: measure kernel specializations on the live device
and persist the winner.

The runtime analog of the reference's compile-time backend selection plus
hwloc-derived block-size defaults (compute/selector/src/lib.rs:4-59,
compute/block/src/default.rs:6-57): instead of trusting a hardware model,
measure candidate kernel specializations on the actual chip and cache the
best per (platform, domain, boundary, stencil, dtype) in
``~/.cache/grayscott_tpu/autotune.json``.

Tuned dimensions: ``block_rows`` (row tile), ``steps_per_call`` (temporal
blocking depth), and — for domains too wide for full-width VMEM windows —
``block_cols`` (intra-kernel column tiling). The Mosaic scoped-VMEM limit
is derived per candidate from the tile footprint
(ops.pallas_stencil.choose_vmem_limit); candidates whose K-unrolled
window would hang the compiler are skipped up front
(ops.pallas_stencil.window_compile_ok), and winners record the tile
configuration the measured simulation ACTUALLY ran (the width heuristic
may column-tile a candidate that did not pin block_cols).
"""

from __future__ import annotations

import time
from typing import Iterable, Mapping, Tuple, Union

import numpy as np

from ..errors import UnsupportedConfigError
from ..ops import megakernel as mk
from ..ops import pallas_stencil as ps
from ..params import Parameters
from ..utils import cache

Candidate = Union[Tuple[int, int], Mapping]

DEFAULT_CANDIDATES: Tuple[Mapping, ...] = (
    # (block_rows, steps_per_call); measured on the v2/v3 kernels on v5e:
    # the step loop is VPU-bound, so large tiles win on halo redundancy —
    # (256, 16) is the champion at 4096^2 for BOTH boundaries since the
    # v3 naive compile-derate relaxation (65.6 zero / 56.7 naive). Taller
    # tiles win on narrower domains ((544, 16) -> 38.2 at 1080x1920 vs
    # 33.6 for (256, 16); the padding-scored 360 beats 488 there when 544
    # is ceiling-blocked). Candidates past the compile ceiling for a
    # given width are auto-skipped.
    dict(block_rows=256, steps_per_call=16),
    dict(block_rows=192, steps_per_call=16),
    dict(block_rows=544, steps_per_call=16),
    dict(block_rows=360, steps_per_call=16),
    dict(block_rows=96, steps_per_call=8),
)


def _as_config(c: Candidate) -> dict:
    if isinstance(c, Mapping):
        return dict(c)
    tr, k = c  # legacy (block_rows, steps_per_call) tuples
    return dict(block_rows=tr, steps_per_call=k)


def _guard_ok(cfg: Mapping, shape, boundary: str) -> bool:
    """Compile-ceiling check for a candidate as it would actually run
    (column-tiled width when block_cols is pinned; folded width and the
    heuristic row tile for lane-fold candidates; doubled width for
    species-packed candidates)."""
    try:
        return _guard_ok_impl(cfg, shape, boundary)
    except UnsupportedConfigError:
        # choose_block_rows errors when NO tile compiles at this width
        # (round-4): for the viability loop that simply means the
        # candidate is not viable — skip, don't crash the tuner
        return False


def _guard_ok_impl(cfg: Mapping, shape, boundary: str) -> bool:
    if cfg.get("pack") == "on":
        r, c = shape
        pshape = (r, 2 * c)
        if cfg.get("engine") == "mega":
            return mk.mega_ok(pshape, cfg.get("block_rows"), species=1)
        if cfg.get("resident") == "on":
            return ps.resident_ok(pshape)
        k = cfg.get("steps_per_call") or 16
        halo = ps.halo_for_steps(k)
        tr = cfg.get("block_rows") or ps.choose_block_rows(
            r, 2 * c, halo=halo, boundary="zero", species=1
        )
        return ps.window_compile_ok(tr, halo, 2 * c, "zero", k)
    if cfg.get("engine") == "mega":
        # pin semantics mirror the runtime: block_rows alone = full-width
        # windows; block_cols = the megakernel's column tile
        return mk.mega_ok(shape, cfg.get("block_rows"),
                          tc=cfg.get("block_cols"), boundary=boundary)
    if cfg.get("resident") == "on":
        return ps.resident_ok(shape)
    # arbitrary Mapping candidates may omit either windowed knob: default
    # like the runtime does instead of crashing the viability loop
    k = cfg.get("steps_per_call") or 16
    halo = ps.halo_for_steps(k)
    fold = int(cfg.get("fold") or 1)
    if fold > 1:
        w_cols = shape[1] * fold
        tr = cfg.get("block_rows") or ps.choose_block_rows(
            -(-shape[0] // fold), w_cols, halo=halo, boundary=boundary
        )
        return ps.window_compile_ok(tr, halo, w_cols, boundary, k)
    if cfg.get("block_cols"):
        w_cols = cfg["block_cols"] + 2 * ps.COL_HALO
    else:
        w_cols = shape[1]
    tr = cfg.get("block_rows") or ps.choose_block_rows(
        shape[0], w_cols, halo=halo, boundary=boundary
    )
    return ps.window_compile_ok(tr, halo, w_cols, boundary, k)


def _wide_domain_candidates(
    shape, base: Iterable[Mapping], boundary: str = "zero"
) -> list[dict]:
    """Column-tiling variants for domains whose full-width window pair
    exceeds VMEM: the heuristic tile width and neighbors, each shrunk to
    the compile ceiling if needed."""
    _, c = shape
    tc0 = ps.choose_block_cols(c)
    if tc0 is None:
        return []
    out = []
    widths = {tc0}
    widths.add(min(-(-c // 128) * 128, 2 * tc0))
    if tc0 >= 1024:
        widths.add(tc0 // 2 // 128 * 128)
    # same naive-boundary derate as window_compile_ok: without it every
    # column-tiled naive candidate is later rejected by _guard_ok and
    # tuning degrades to the fallback configs
    ceiling = ps.COMPILE_CEILING_CELL_STEPS / (
        ps.NAIVE_COMPILE_DERATE if boundary == "naive" else 1.0
    )
    for cfg in base:
        # arbitrary Mapping candidates may omit either windowed knob
        # (the _guard_ok contract): default like the runtime does
        k = cfg.get("steps_per_call") or 16
        halo = ps.halo_for_steps(k)
        tr = cfg.get("block_rows")
        if tr is None:
            try:
                tr = ps.choose_block_rows(
                    shape[0], tc0 + 2 * ps.COL_HALO, halo=halo,
                    boundary=boundary,
                )
            except UnsupportedConfigError:
                continue
        w_rows = tr + 2 * halo
        # widest tile this (tr, k) can compile with
        limit = int(ceiling) // (w_rows * k)
        tc_cap = (limit - 2 * ps.COL_HALO) // 128 * 128
        for tc in sorted(widths):  # noqa: B007
            tc = min(tc, tc_cap)
            if tc >= 128 and tc < c:
                entry = {**cfg, "block_cols": tc}
                if entry not in out:
                    out.append(entry)
    return out


def _fold_candidates(shape, boundary: str, dtype: str) -> list[dict]:
    """Lane-fold variants for narrow domains (the backend heuristic picks
    the row tile for the folded width, mirroring runtime behavior)."""
    r, c = shape
    if dtype != "float32":
        return []
    f = ps.choose_fold(r, c)
    if f <= 1 or (boundary == "naive" and c % 128 != 0):
        return []
    return [dict(fold=f, steps_per_call=16), dict(fold=f, steps_per_call=8)]


def _engine_candidates(shape, dtype: str,
                       boundary: str = "zero") -> list[dict]:
    """Alternative-engine candidates: the whole-run megakernel (default
    row blocks + a half-size variant for deeper DMA pipelining) and the
    VMEM-resident kernel, wherever each supports the domain. The winner's
    record carries ``engine`` so the backend follows the measured verdict
    instead of the static preference order."""
    out = []
    r, c = shape
    tr, tc = mk.choose_mega_geometry(r, c, boundary=boundary)
    # skip mega candidates whose forced window geometry carries high halo
    # redundancy (measuring a known-inefficient config only wastes tuner
    # budget). The megakernel supports bf16 storage too (the shipped
    # per-dtype verdicts measured it +9.5% to +22.7% over bf16-windowed)
    # — without a mega candidate here, bf16 tuning at unlisted shapes
    # would persist a windowed record that then pins the shape to the
    # slower kernel permanently.
    if mk.mega_ok(shape, tr, tc=tc, boundary=boundary) and \
            mk.mega_window_cells(r, c, tr, tc) <= 1.3 * r * c:
        out.append(dict(engine="mega"))
        if tc is None:
            half = tr // 2 // 8 * 8
            if half >= 8 and mk.mega_ok(shape, half, boundary=boundary) \
                    and (half + 2 * mk.MEGA_STEPS) / half <= 1.3:
                out.append(dict(engine="mega", block_rows=half))
        else:
            # the geometry heuristic picked column tiles on a 3%-bias
            # cost model — let the hardware also rank the full-width
            # form (pin semantics: block_rows alone = full-width
            # windows) and the double-width tile (fewer column halos,
            # thinner row tiles) when they exist
            tr_fw = mk.choose_mega_rows(r, c, boundary=boundary)
            if mk.mega_ok(shape, tr_fw, boundary=boundary) and \
                    (tr_fw + 2 * mk.MEGA_STEPS) / tr_fw <= 1.3:
                out.append(dict(engine="mega", block_rows=tr_fw))
            if 2 * tc < c and mk.mega_ok(shape, None, tc=2 * tc,
                                         boundary=boundary):
                out.append(dict(engine="mega", block_cols=2 * tc))
    # the resident kernel keeps the whole f32 state in VMEM: f32-only
    if dtype == "float32" and ps.resident_ok(shape):
        out.append(dict(resident="on"))
    return out


def _pack_candidates(shape, boundary: str, dtype: str,
                     params: Parameters) -> list[dict]:
    """Species-packed variants (x = [U | V] along lanes, ~half the
    diffusion op count at double width; ops.pallas_stencil
    "species-packed layout"). Zero boundary + separable plan + f32
    only; each sub-engine is pinned so the tuner measures it
    explicitly, and the winner's ``pack`` flag is what
    PallasSimulation's pack='auto' follows."""
    r, c = shape
    if boundary != "zero" or dtype != "float32":
        return []
    if params.separable_plan()[0] != "separable":
        return []
    out = []
    pshape = (r, 2 * c)
    tr = mk.choose_mega_rows(r, 2 * c, species=1)
    if mk.mega_ok(pshape, tr, species=1) and \
            (tr + 2 * mk.MEGA_STEPS) / tr <= 1.3:
        out.append(dict(pack="on", engine="mega"))
    if ps.resident_ok(pshape):
        out.append(dict(pack="on", resident="on"))
    halo = ps.halo_for_steps(16)
    try:
        tr_w = ps.choose_block_rows(r, 2 * c, halo=halo, boundary="zero",
                                    species=1)
    except UnsupportedConfigError:
        # doubled width past the compile ceiling: no windowed pack
        # candidate (the mega/resident probes above already decided)
        return out
    if ps.window_compile_ok(tr_w, halo, 2 * c, "zero", 16):
        out.append(dict(pack="on", engine="windowed"))
    return out


def _fallback_candidates(shape, boundary: str) -> list[dict]:
    """Last-resort configs mirroring the runtime heuristics (which are
    themselves ceiling-guarded), so autotune never comes up empty for a
    domain the backend's own defaults can run."""
    r, c = shape
    out = []
    for k in (16, 8):
        halo = ps.halo_for_steps(k)
        tc = ps.choose_block_cols(c, halo=halo)
        eff_c = c if tc is None else tc + 2 * ps.COL_HALO
        tr = ps.choose_block_rows(r, eff_c, halo=halo, boundary=boundary)
        cfg = dict(block_rows=tr, steps_per_call=k)
        if tc is not None:
            cfg["block_cols"] = tc
        if _guard_ok(cfg, shape, boundary) and cfg not in out:
            out.append(cfg)
    return out


def measure_config(
    params: Parameters, shape, boundary: str, steps: int | None = None,
    dtype: str = "float32", reps: int = 3, **config,
) -> dict:
    """Measure one kernel specialization (single dispatch, tiny sync).

    ``config``: block_rows, steps_per_call, optional block_cols. Returns
    the tile configuration the simulation ACTUALLY used (the heuristics
    may column-tile or clamp an unpinned dimension) plus
    ``gcells_per_sec`` (best of ``reps`` timed runs — single samples from
    one noisy measurement used to be persisted permanently; the criterion
    analog samples statistically, compute/shared/src/benchmark.rs:50-72).
    """
    import jax.numpy as jnp

    from ..backends.pallas import PallasSimulation

    # tuned_lookup=False isolates the measurement from the autotune store
    # and the shipped verdicts: each candidate must run exactly what it
    # pins — a persisted pack/engine record acting through the 'auto'
    # modes would otherwise make every candidate measure the same config
    sim = PallasSimulation(params, boundary=boundary, dtype=dtype,
                           tuned_lookup=False, **config)
    species = sim.make_species(shape)
    engine, pack = "windowed", False
    if species.storage[0] == "mega":
        engine = "mega"
        tr_used, tc_used = species.storage[3], species.storage[4]
        f_used, k = 1, mk.MEGA_STEPS
    elif species.storage[0] == "megapack":
        engine, pack = "mega", True
        tr_used, tc_used, f_used, k = species.storage[2], None, 1, mk.MEGA_STEPS
    elif species.storage[0] == "resident":
        engine = "resident"
        tr_used, tc_used, f_used, k = None, None, 1, sim.steps_per_call
    elif species.storage[0] == "respack":
        engine, pack = "resident", True
        tr_used, tc_used, f_used, k = None, None, 1, sim.steps_per_call
    elif species.storage[0] == "packed":
        pack = True
        _, _, tr_used, _halo, k = species.storage
        tc_used, f_used = None, 1
    elif species.storage[0] == "folded":
        _, _, _, tr_used, _halo, k, f_used, _rp = species.storage
        tc_used = None
    else:
        _, _, _, tr_used, tc_used, _chalo, _halo, k = species.storage
        f_used = 1
    if steps is None:
        # a FIXED work target across candidates (rounded up to this
        # candidate's K): with steps proportional to K, the constant
        # per-measurement dispatch+sync overhead (~25-30 ms on a tunneled
        # TPU) is amortized over half the work for K=8 candidates,
        # systematically misranking them against K=16 ones
        steps = -(-1024 // k) * k
    rec = {
        "engine": engine,
        "block_rows": tr_used,
        "steps_per_call": k,
        "block_cols": tc_used,
        "fold": f_used,
        "pack": pack,
    }
    rec.update(_measure_rates(sim, species, shape, steps, reps, warm=k))
    return rec


def _measure_rates(sim, species, shape, steps: int, reps: int,
                   warm: int) -> dict:
    """Warmup + best-of-``reps`` timed runs + device-time ranking for one
    built (sim, species) pair — the measurement core shared by the
    single-chip and sharded tuners.

    On real hardware, candidates are ranked on ON-CHIP module time: wall
    clock through a tunneled host carries a ~25-30 ms constant
    dispatch+sync RTT that is ~10x kernel time at small shapes, so wall
    rankings there are noise-ranked tunnel measurements (BENCHMARKS.md).
    Device module time still contains every per-call fixed cost inside
    the executable (what the engines differ on) and drops only the
    constant host RTT, identical across candidates. The criterion
    analog: measure the workload, not the harness
    (compute/shared/src/benchmark.rs:77-113). Wall stays in the record
    for audit. ``rank_metric`` names the unit gcells_per_sec carries: a
    candidate whose trace failed (after one retry) is tagged 'wall' so
    the tuners can keep their rankings unit-consistent instead of
    comparing a 2-6x smaller wall rate against rivals' device rates."""
    import jax
    import jax.numpy as jnp

    sim.prepare_steps(species, warm)  # compile + warmup
    float(np.asarray(jnp.sum(species.result()[:1, :128])))
    best = float("inf")
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        sim.prepare_steps(species, steps)
        float(np.asarray(jnp.sum(species.result()[:1, :128])))
        best = min(best, time.perf_counter() - t0)
    cells = shape[0] * shape[1] * steps
    rec = {
        "gcells_per_sec": cells / best / 1e9,
        "wall_gcells_per_sec": cells / best / 1e9,
        "rank_metric": "wall",
    }
    if not getattr(sim, "interpret", True) and \
            jax.devices()[0].platform in ("tpu", "gpu"):
        from .harness import _device_time_rep

        for _ in range(2):  # one retry: transient profiler failures
            try:
                dev_best = min(
                    _device_time_rep(sim, species, steps)
                    for _ in range(min(2, max(1, reps)))
                )
            except Exception:
                continue
            rec["device_gcells_per_sec"] = cells / dev_best / 1e9
            rec["gcells_per_sec"] = rec["device_gcells_per_sec"]
            rec["rank_metric"] = "device"
            break
    return rec


def autotune(
    params: Parameters, shape, boundary: str = "naive",
    candidates: Iterable[Candidate] = DEFAULT_CANDIDATES,
    persist: bool = True, verbose: bool = False, dtype: str = "float32",
) -> dict:
    """Measure candidates, persist and return the best config dict.

    The winner records block_rows, steps_per_call and block_cols (None =
    full-width windows won) as actually measured; PallasSimulation adopts
    all three when the user pins none.
    """
    import jax

    from ..utils import device

    # records key on the device KIND (v5e/v4/...), not the platform
    # string: a verdict measured on one generation must not pin another
    # (their VMEM geometry differs up to 8x; utils.device)
    key = cache.autotune_key(device.autotune_platform(), shape, boundary,
                             params.stencil_name(), ps.KERNEL_VERSION, dtype)
    store = cache.load_autotune()
    if key in store:
        return store[key]
    configs = [_as_config(c) for c in candidates]
    configs += _wide_domain_candidates(shape, configs[:2], boundary)
    if jax.devices()[0].platform == "tpu":
        # alternative engines/layouts are a hardware question:
        # interpret-mode timings would rank them meaninglessly on CPU,
        # and the backend refuses to act on a fold/pack record off-TPU
        # anyway (build_storage nulls fold>1 records under interpret)
        configs += _fold_candidates(shape, boundary, dtype)
        configs += _engine_candidates(shape, dtype, boundary)
        configs += _pack_candidates(shape, boundary, dtype, params)
    viable = []
    for cfg in configs:
        # compile-tractability guard: windows past the measured Mosaic
        # ceiling send the remote compile into tens of minutes — skip
        # rather than hang the tuner (ops.pallas_stencil.window_compile_ok)
        if _guard_ok(cfg, shape, boundary):
            viable.append(cfg)
        elif verbose:
            print(f"{cfg}: SKIP (window past the compile ceiling)")
    if not viable:
        viable = _fallback_candidates(shape, boundary)
        if verbose and viable:
            print(f"all candidates past the ceiling; falling back to "
                  f"heuristic configs {viable}")
    measured = []
    for cfg in viable:
        try:
            res = measure_config(params, shape, boundary, dtype=dtype, **cfg)
        except Exception as e:  # config may not fit VMEM etc.
            if verbose:
                print(f"{cfg}: FAIL ({type(e).__name__})")
            measured.append({**_as_config(cfg), "error": type(e).__name__})
            continue
        if verbose:
            print(f"{cfg}: {res['gcells_per_sec']:.2f} Gcell/s "
                  f"(ran as {res['block_rows']}/{res['steps_per_call']}"
                  f"/{res['block_cols']})")
        measured.append(dict(res, gcells_per_sec=round(
            res["gcells_per_sec"], 3)))
    pool = [m for m in measured if "error" not in m]
    metrics = {m.get("rank_metric", "wall") for m in pool}
    if len(metrics) > 1:
        # mixed units (a trace failed even after retry): rank everything
        # on the wall rate — a noisier but consistent comparison beats a
        # device-vs-wall one that silently buries the fastest candidate
        for m in pool:
            m["gcells_per_sec"] = round(
                m.get("wall_gcells_per_sec", m["gcells_per_sec"]), 3)
            m["rank_metric"] = "wall"
        if verbose:
            print("autotune: a device-time trace failed; ranking all "
                  "candidates on wall clock for unit consistency")
    ranked = sorted(pool, key=lambda m: m["gcells_per_sec"], reverse=True)
    if not ranked:
        raise RuntimeError("no autotune candidate compiled successfully")
    # suspect call: winner within measurement noise of the runner-up —
    # re-measure both (executables are warm now, so this is cheap) and let
    # the fresh best-of decide
    if len(ranked) >= 2 and ranked[1]["gcells_per_sec"] >= \
            0.97 * ranked[0]["gcells_per_sec"]:
        for m in ranked[:2]:
            if m.get("pack"):
                if m.get("engine") == "mega":
                    cfg = {"pack": "on", "engine": "mega",
                           "block_rows": m["block_rows"]}
                elif m.get("engine") == "resident":
                    cfg = {"pack": "on", "resident": "on"}
                else:
                    cfg = {"pack": "on", "engine": "windowed",
                           "block_rows": m["block_rows"],
                           "steps_per_call": m["steps_per_call"]}
            elif m.get("engine") == "mega":
                cfg = {"engine": "mega", "block_rows": m["block_rows"],
                       "block_cols": m.get("block_cols")}
            elif m.get("engine") == "resident":
                cfg = {"resident": "on"}
            else:
                cfg = {k: m.get(k) for k in
                       ("block_rows", "steps_per_call", "block_cols", "fold")}
                cfg["fold"] = cfg.get("fold") or 1
            try:
                again = measure_config(
                    params, shape, boundary, dtype=dtype, **cfg
                )
            except Exception:
                continue
            if again.get("rank_metric", "wall") != \
                    m.get("rank_metric", "wall"):
                # unit mismatch on the re-measure (trace flaked one way
                # or the other): keep the original consistent number
                continue
            m["gcells_per_sec"] = round(
                max(m["gcells_per_sec"], again["gcells_per_sec"]), 3
            )
        ranked.sort(key=lambda m: m["gcells_per_sec"], reverse=True)
    # the full candidate table rides along for later audit; the transient
    # ``rank_metric`` bookkeeping (which unit THIS run ranked on) stays out
    # of the on-disk schema — the per-unit rates (wall_gcells_per_sec /
    # device_gcells_per_sec) already record each number's provenance
    def _persisted(m):
        return {k: v for k, v in m.items() if k != "rank_metric"}

    best = dict(_persisted(ranked[0]),
                candidates=[_persisted(m) for m in measured])
    if persist:
        store[key] = best
        cache.save_autotune(store)
    return best


def lookup(params: Parameters, shape, boundary: str,
           dtype: str = "float32") -> dict | None:
    """Best known config for this configuration, if any: the local
    autotune store first, then the package's shipped v5e-measured
    verdicts (bench/defaults.py) — some layout decisions (pack/fold)
    act only on measured records, so a fresh install still gets them."""
    from ..utils import device

    kind = device.autotune_platform()
    key = cache.autotune_key(kind, shape, boundary,
                             params.stencil_name(), ps.KERNEL_VERSION, dtype)
    store = cache.load_autotune()
    rec = store.get(key)
    if rec is None and kind == "v5e":
        # rounds 1-2 keyed local records on the platform string "tpu";
        # every one of them was measured on this v5e, so they remain
        # valid here — and ONLY here
        rec = store.get(cache.autotune_key(
            "tpu", shape, boundary, params.stencil_name(),
            ps.KERNEL_VERSION, dtype))
    if rec is not None:
        return rec
    from .defaults import SHIPPED

    return SHIPPED.get(key)


# -- sharded (multi-chip) backend tuner --------------------------------------
#
# The reference's parallel rung ships tunables with measured-per-machine
# defaults (compute/parallel/src/args.rs:8-28 -j/--seq-block-size,
# compute/parallel/src/block.rs:12-47 per-thread cache budgets from hwloc).
# The TPU analog measures the distribution-layer knobs on the live
# topology: engine (windowed ppermute blocks vs the one-launch remote-DMA
# megakernel), exchange/blocking depth K, per-shard row tile, mesh
# factorization, and exchange/compute overlap — ranked on device time
# like the single-chip tuner, keyed additionally on the device COUNT
# (and on a pinned mesh, since a record measured on one topology must
# not pin another).


def sharded_key(params: Parameters, shape, boundary: str, dtype: str,
                n_devices: int, mesh_cols: int | None = None,
                engine: str | None = None, overlap=None) -> str:
    """Record key for the sharded backend: the single-chip key plus the
    topology AND any candidate-restricting pins. A user-pinned mesh,
    engine, or overlap gets its own record (the tuner only measured
    within that pin), so pin-restricted verdicts never cross-contaminate
    all-auto runs — and an all-auto record never short-circuits a
    pinned --autotune. Auto records carry the winning values inside the
    record instead."""
    from ..utils import device

    base = cache.autotune_key(device.autotune_platform(), shape, boundary,
                              params.stencil_name(), ps.KERNEL_VERSION,
                              dtype)
    key = f"{base}|sharded:n{n_devices}"
    if mesh_cols is not None:
        key += f":mc{mesh_cols}"
    if engine in ("windowed", "mega"):
        key += f":eng-{engine}"
    if overlap is not None:
        key += f":ov-{'on' if overlap else 'off'}"
    return key


def _viable_mesh_cols(shape, n: int) -> list[int]:
    """Mesh factorizations worth measuring: the shared lane/sublane
    viability scan (parallel/halo.viable_mesh_cols), with a 1-D
    fallback so the tuner always has something to measure."""
    from ..parallel import halo as ph

    return ph.viable_mesh_cols(shape, n) or [1]


def _sharded_candidates(shape, n: int, boundary: str, dtype: str,
                        mesh_cols: int | None = None,
                        engine: str | None = None,
                        overlap=None) -> list[dict]:
    """Candidate configs honoring any user pins (``engine``/``overlap``/
    ``mesh_cols``; pins always win — the backends' pin contract). Per
    viable mesh: windowed K=16/K=8, a half-tile windowed variant,
    windowed+overlap, and the megakernel with auto geometry. Unfittable
    candidates raise UnsupportedConfigError at measure time (the
    backend's storage gates are compile-ceiling-guarded internally), so
    no extra viability filtering is needed here."""
    meshes = [mesh_cols] if mesh_cols else _viable_mesh_cols(shape, n)
    engines = [engine] if engine in ("windowed", "mega") \
        else ["windowed", "mega"]
    if overlap is True:
        engines = [e for e in engines if e == "windowed"]
    out = []
    for nc in meshes:
        nr = max(1, n // nc)
        r_loc = -(-shape[0] // nr)
        c_loc = -(-shape[1] // nc)
        if "windowed" in engines:
            for k in (16, 8):
                base = dict(engine="windowed", mesh_cols=nc,
                            steps_per_call=k)
                if overlap is not True:
                    out.append(dict(base, overlap=False))
                # overlap splits the per-shard kernel into interior/edge
                # slabs; pin a row tile the engagement rule accepts
                # (>= 3 tiles of >= halo rows — parallel/halo
                # .overlap_engages) so the measured candidate is
                # guaranteed to run the overlapped code, not the
                # serialized fallback under an identical label
                halo = ps.halo_for_steps(k)
                if overlap in (None, True):
                    from ..parallel import halo as ph

                    tr_ov = max(halo, r_loc // 3 // 8 * 8)
                    c_eff = c_loc + (2 * halo if nc > 1 else 0)
                    if ph.overlap_engages(r_loc, tr_ov, halo,
                                          chalo=halo if nc > 1 else 0,
                                          c_loc=c_loc) and                             ps.window_compile_ok(tr_ov, halo, c_eff,
                                                 boundary, k):
                        out.append(dict(base, overlap=True,
                                        block_rows=tr_ov))
                if k == 16 and overlap is not True:
                    # one explicit tile variant: half the heuristic row
                    # tile (deeper pipelining of smaller blocks)
                    try:
                        chalo = halo if nc > 1 else 0
                        tr0 = ps.choose_block_rows(
                            r_loc, c_loc + 2 * chalo, halo=halo,
                            boundary=boundary)
                    except UnsupportedConfigError:
                        continue
                    half = max(8, tr0 // 2 // 8 * 8)
                    if half < tr0:
                        out.append(dict(base, overlap=False,
                                        block_rows=half))
        if "mega" in engines and overlap is not True:
            out.append(dict(engine="mega", mesh_cols=nc))
    return out


def _overlap_engaged(sim, shape, tr: int, nr: int, nc: int) -> bool:
    from ..parallel import halo as ph

    r_loc = -(-shape[0] // max(nr, 1))
    c_loc = -(-shape[1] // max(nc, 1))
    return ph.overlap_engages(r_loc, tr, sim.halo, chalo=sim.chalo,
                              c_loc=c_loc)


def measure_sharded_config(
    params: Parameters, shape, boundary: str, dtype: str = "float32",
    reps: int = 3, steps: int | None = None, n_devices: int | None = None,
    **config,
) -> dict:
    """Measure one sharded configuration end-to-end (shard, exchange,
    unshard sync) and return what ACTUALLY ran: engine, mesh_cols, the
    per-shard row tile from the built storage, K, overlap — plus the
    ranked rates (device time on hardware, wall elsewhere)."""
    from ..backends.sharded import ShardedSimulation

    # tuned_lookup=False isolates candidates from persisted records (the
    # same contract as the single-chip tuner): each candidate runs
    # exactly what it pins
    sim = ShardedSimulation(params, boundary=boundary, dtype=dtype,
                            n_devices=n_devices, tuned_lookup=False,
                            **config)
    species = sim.make_species(shape)
    storage = species.storage
    dev_shape = sim.mesh.devices.shape
    nr, nc = dev_shape if len(dev_shape) == 2 else (dev_shape[0], 1)
    if storage[0] in ("mega", "mega2d"):
        engine, tr_used, tc_used = "mega", storage[3], storage[4]
        k = mk.MEGA_STEPS
    else:
        engine, tr_used, tc_used = "windowed", storage[3], None
        k = sim.steps_per_call
    if steps is None:
        steps = -(-1024 // k) * k  # fixed work target (see measure_config)
    rec = {
        "engine": engine,
        "mesh_cols": int(nc),
        "mesh_rows": int(nr),
        "block_rows": tr_used,
        "block_cols": tc_used,
        "steps_per_call": k,
        # record overlap only when the geometry ENGAGES the split
        # (parallel/halo.overlap_engages): a serialized fallback must
        # not persist an "overlap" verdict it never measured
        "overlap": bool(sim.overlap) and engine == "windowed" and
        _overlap_engaged(sim, shape, tr_used, nr, nc),
    }
    rec.update(_measure_rates(sim, species, shape, steps, reps, warm=k))
    return rec


def sharded_autotune(
    params: Parameters, shape, boundary: str = "naive",
    dtype: str = "float32", n_devices: int | None = None,
    mesh_cols: int | None = None, engine: str | None = None,
    overlap=None, candidates: Iterable[Mapping] | None = None,
    persist: bool = True, verbose: bool = False, reps: int = 3,
    steps: int | None = None,
) -> dict:
    """Measure sharded candidates on the live mesh, persist and return
    the best config dict; ``ShardedSimulation`` adopts it through
    ``sharded_lookup`` exactly like ``PallasSimulation`` adopts its
    records. ``engine``/``overlap``/``mesh_cols`` restrict the candidate
    set to the user's pins ('auto' strings mean unpinned)."""
    import jax

    n = n_devices or len(jax.devices())
    if engine in ("auto", ""):
        engine = None
    if isinstance(overlap, str):
        overlap = {"on": True, "off": False}.get(overlap)
    key = sharded_key(params, shape, boundary, dtype, n, mesh_cols,
                      engine=engine, overlap=overlap)
    store = cache.load_autotune()
    if key in store:
        return store[key]
    if candidates is None:
        candidates = _sharded_candidates(
            shape, n, boundary, dtype, mesh_cols=mesh_cols,
            engine=engine, overlap=overlap)
        if not candidates:
            raise UnsupportedConfigError(
                "no sharded autotune candidate satisfies the pinned "
                f"engine/overlap on this shape x {n}-device topology "
                "(e.g. overlap needs >= 3 row tiles of >= halo rows "
                "per shard); drop a pin or run without --autotune")
    measured = []
    for cfg in candidates:
        cfg = dict(cfg)
        try:
            res = measure_sharded_config(
                params, shape, boundary, dtype=dtype, reps=reps,
                n_devices=n_devices, steps=steps, **cfg)
        except Exception as e:  # unfittable slab, unsupported geometry...
            if verbose:
                print(f"{cfg}: FAIL ({type(e).__name__})")
            measured.append({**cfg, "error": type(e).__name__})
            continue
        if verbose:
            print(f"{cfg}: {res['gcells_per_sec']:.2f} Gcell/s "
                  f"({res['rank_metric']}; ran {res['engine']} "
                  f"mesh={res['mesh_rows']}x{res['mesh_cols']} "
                  f"tr={res['block_rows']} K={res['steps_per_call']})")
        measured.append(dict(res, gcells_per_sec=round(
            res["gcells_per_sec"], 3)))
    pool = [m for m in measured if "error" not in m]
    metrics = {m.get("rank_metric", "wall") for m in pool}
    if len(metrics) > 1:
        # mixed units (a trace failed even after retry): rank everything
        # on the wall rate — a noisier but consistent comparison beats a
        # device-vs-wall one that silently buries the fastest candidate
        for m in pool:
            m["gcells_per_sec"] = round(
                m.get("wall_gcells_per_sec", m["gcells_per_sec"]), 3)
            m["rank_metric"] = "wall"
        if verbose:
            print("sharded_autotune: a device-time trace failed; ranking "
                  "all candidates on wall clock for unit consistency")
    ranked = sorted(pool, key=lambda m: m["gcells_per_sec"], reverse=True)
    if not ranked:
        raise RuntimeError("no sharded autotune candidate ran successfully")

    def _persisted(m):
        return {k: v for k, v in m.items() if k != "rank_metric"}

    best = dict(_persisted(ranked[0]),
                candidates=[_persisted(m) for m in measured])
    if persist:
        store = cache.load_autotune()  # re-read: measuring took a while
        store[key] = best
        cache.save_autotune(store)
    return best


def sharded_lookup(params: Parameters, shape, boundary: str,
                   dtype: str = "float32", n_devices: int | None = None,
                   mesh_cols: int | None = None, engine: str | None = None,
                   overlap=None) -> dict | None:
    """Best known sharded config for this (topology, pins), if any
    (local store only: multi-chip verdicts are topology-specific, so
    nothing ships)."""
    import jax

    n = n_devices or len(jax.devices())
    return cache.load_autotune().get(
        sharded_key(params, shape, boundary, dtype, n, mesh_cols,
                    engine=engine, overlap=overlap))
