"""`pallas` backend: the fused temporal-blocked TPU kernel.

The TPU analog of the reference's whole optimized ladder — SIMD
(`autovec`/`manualvec`), cache blocking (`block`) and specialized GPU
pipelines (`gpu_specialized`) — see grayscott_tpu/ops/pallas_stencil.py.
Tunables (`--pallas-block-rows`, `--pallas-steps-per-call`) are the
runtime analog of the reference's SPIR-V specialization constants
(compute/gpu/specialized/src/args.rs:8-20): they re-specialize the compiled
kernel without touching the source. Defaults follow a VMEM budget heuristic
(the hwloc cache-size defaults analog, compute/block/src/default.rs).

On non-TPU platforms the kernel runs in Pallas interpreter mode (slow;
used by the test suite for numerics validation).
"""

from __future__ import annotations

import argparse
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import megakernel as mk
from ..ops import pallas_stencil as ps
from ..errors import UnsupportedConfigError
from ..params import Parameters
from .base import Simulation, env_default


@functools.partial(jax.jit, static_argnames=("r", "c", "ch"))
def _mega_result_view(v_pair, *, r: int, c: int, ch: int):
    """Fused crop + f32 upcast of the megakernel pair's V slot 0 — one
    V-sized device temporary instead of eager per-op materialization
    (module-level so the executable is traced once per shape)."""
    v = jax.lax.slice(
        v_pair, (0, mk.MEGA_STEPS, ch),
        (1, mk.MEGA_STEPS + r, ch + c),
    )[0]
    return v.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("r", "c", "ch", "h"))
def _pad_result_view(v_pad, *, r: int, c: int, ch: int, h: int):
    """Fused crop + f32 upcast of the windowed layout's V buffer (same
    rationale as :func:`_mega_result_view`)."""
    v = jax.lax.slice(v_pad, (h, ch), (h + r, ch + c))
    return v.astype(jnp.float32)


class PallasSimulation(Simulation):
    name = "pallas"

    MAX_STEPS_PER_CALL = 32

    #: measured optimum on v5e: 16 steps fused in VMEM per HBM round-trip
    DEFAULT_STEPS_PER_CALL = 16

    def __init__(
        self,
        params: Parameters,
        boundary: str = "naive",
        block_rows: int | None = None,
        block_cols: int | None = None,
        steps_per_call: int | None = None,
        interpret: bool | None = None,
        vmem_limit_bytes: int | None = None,
        dtype: str = "float32",
        runtime_params: bool = True,
        resident: str = "auto",
        fold: str | int = "auto",
        engine: str = "auto",
        pack: str = "auto",
        naive_fix: str = "select",
        tuned_lookup: bool = True,
        mega_depth: int | None = None,
        mega_specialize: bool | None = None,
        naive_fold: bool = False,
        **kwargs,
    ):
        self._explicit_k = steps_per_call is not None
        if steps_per_call is None:
            # deep blocking pays on hardware; in interpreter mode (tests)
            # the 16-step unrolled graph blows up XLA-CPU compile times
            on_tpu = jax.devices()[0].platform == "tpu"
            steps_per_call = self.DEFAULT_STEPS_PER_CALL if on_tpu else ps.HALO
        super().__init__(params, boundary)
        if not (1 <= steps_per_call <= self.MAX_STEPS_PER_CALL):
            raise ValueError(
                f"steps_per_call must be in [1, {self.MAX_STEPS_PER_CALL}], "
                f"got {steps_per_call}"
            )
        self.block_rows = block_rows
        self.block_cols = block_cols
        self.steps_per_call = steps_per_call
        # halo depth = steps rounded up to the 8-row alignment quantum
        self.halo = ps.halo_for_steps(steps_per_call)
        self.vmem_limit_bytes = vmem_limit_bytes  # None = auto per tile
        if interpret is None:
            interpret = jax.devices()[0].platform != "tpu"
        self.interpret = interpret
        if not interpret:
            # real hardware of a generation we never measured: geometry
            # falls back to VMEM-scaled heuristics (utils.device) — say
            # so once and point at --autotune
            from ..utils import device as _device

            _device.warn_uncalibrated_once()
        # runtime-parameter mode (default): the reaction scalars ride an
        # SMEM operand and the executable is keyed on the stencil weights
        # only, so feed/kill/dt changes (livesim sliders, parameter scans)
        # reuse the compiled kernel. Bit-identical to the static mode.
        self.runtime_params = runtime_params
        # VMEM-resident fast path for small domains (ops.pallas_stencil
        # .resident_multistep): 'auto' uses it on TPU f32 runs whose state
        # fits the budget, unless the user pinned tile geometry (pins mean
        # "I want THE windowed kernel with these tiles" — also what the
        # autotuner relies on)
        if resident not in ("auto", "on", "off"):
            raise ValueError(f"resident must be auto/on/off, got {resident!r}")
        self.resident = resident
        # lane-fold layout for narrow domains (see ops.pallas_stencil
        # "lane-fold layout"): an int pins the fold factor F; 'auto'
        # (default) folds only when a persisted autotune record measured
        # fold winning on this domain; 'off' never folds
        if isinstance(fold, str):
            if fold not in ("auto", "off"):
                raise ValueError(f"fold must be auto/off/int, got {fold!r}")
        elif not (isinstance(fold, int) and fold >= 1):
            raise ValueError(f"fold must be auto/off/int >= 1, got {fold!r}")
        self.fold = fold
        # engine selection: 'windowed' is the per-K-block pallas_call
        # pipeline (ops.pallas_stencil); 'mega' is the whole-run manual-DMA
        # kernel (ops.megakernel) that amortizes the measured ~0.42 ms
        # per-call fixed cost across the entire run; 'auto' picks mega on
        # TPU runs it supports (full-width or column-tiled windows, no
        # fold) and windowed otherwise
        if engine not in ("auto", "windowed", "mega"):
            raise ValueError(
                f"engine must be auto/windowed/mega, got {engine!r}"
            )
        if engine == "mega" and self._explicit_k and \
                steps_per_call != mk.MEGA_STEPS:
            # same contract as ShardedSimulation: the megakernel's halo
            # depth IS its time-block depth — silently running K=8 under
            # a different pin would mislabel any A/B measurement
            raise UnsupportedConfigError(
                "engine='mega' fixes steps-per-call at its halo depth "
                f"K={mk.MEGA_STEPS}; drop --pallas-steps-per-call"
            )
        self.engine = engine
        # species-packed layout (see ops.pallas_stencil "species-packed
        # layout"): x = [U | V] along lanes halves the diffusion op count
        # and doubles the op width. Zero boundary + separable plans only;
        # 'auto' packs only on a measured autotune verdict, 'on' forces
        if pack not in ("auto", "on", "off"):
            raise ValueError(f"pack must be auto/on/off, got {pack!r}")
        self.pack = pack
        # naive fix-up mechanism: 'select' = full-window masked selects
        # (the proven path); 'store' = narrow scratch-ref strip stores
        # (bit-identical values, hardware experiment — ROADMAP
        # "strip-store"). Windowed + mega engines, full-width only.
        if naive_fix not in ("select", "store", "slice"):
            raise ValueError(
                f"naive_fix must be select/store/slice, got {naive_fix!r}"
            )
        if naive_fix != "select" and boundary != "naive":
            raise UnsupportedConfigError(
                f"naive_fix={naive_fix!r} requires the naive boundary")
        self.naive_fix = naive_fix
        # opt-in bf16 STORAGE mode (beyond-reference capability): state
        # rides HBM in bf16 — half the memory traffic and footprint (wins
        # on memory-bound configs and doubles the max domain per chip) —
        # while the in-VMEM step loop still computes in f32 (the VPU has
        # 32-bit lanes; there is no packed-bf16 arithmetic to win). NOT
        # bit-compatible with the f32 reference semantics — results round
        # to bf16 once per K-step block. The reference is strictly f32
        # (data/src/lib.rs:11).
        if dtype in (None, "float32", "f32"):
            self.dtype = jnp.float32
            self._dtype_str = "float32"
        elif dtype in ("bfloat16", "bf16"):
            self.dtype = jnp.bfloat16
            self._dtype_str = "bfloat16"
        else:
            raise ValueError(f"unsupported dtype {dtype!r}")
        # an explicit resident pin is f32-only (the resident kernel keeps
        # the whole f32 state in VMEM) and contradicts a pinned lane fold
        # (build_storage would build folded storage and never attempt the
        # resident kernel) — reject the conflict like engine='mega' does
        # instead of silently running a different configuration
        if self.resident == "on":
            if self.dtype != jnp.float32:
                raise UnsupportedConfigError("resident='on' requires float32 storage")
            if naive_fix == "store":
                # the store mechanism needs fix-up scratch refs the
                # resident kernel does not carry; silently running the
                # select kernel would ignore the pin (review r5 #3).
                # slice IS plumbed into the resident kernel.
                raise UnsupportedConfigError(
                    "resident='on' and naive_fix='store' conflict; "
                    "pin at most one of them")
            if isinstance(self.fold, int) and self.fold > 1:
                raise UnsupportedConfigError(
                    "resident='on' and a pinned lane fold conflict; "
                    "pin at most one of them"
                )
            if self.engine != "auto":
                raise UnsupportedConfigError(
                    "resident='on' and an explicit engine pin conflict; "
                    "pin at most one of them"
                )
        # the autotuner measures candidates with tuned_lookup=False so a
        # persisted/shipped record can never hijack what a candidate pins
        # ('auto' modes then act as if no record exists)
        self.tuned_lookup = tuned_lookup
        # megakernel experiment knobs (VERDICT r3 #2/#3): DMA ring depth
        # (None = the kernel's default double buffer) and interior/edge
        # block specialization (None = per-boundary default, see
        # _mega_specialize_default). Both are A/B levers first; defaults
        # follow the measured verdicts.
        if mega_depth is not None and not (2 <= mega_depth <= 8):
            raise ValueError(f"mega_depth must be in [2, 8], got {mega_depth}")
        self.mega_depth = mega_depth
        if mega_specialize and naive_fix == "store":
            raise UnsupportedConfigError(
                "mega_specialize and naive_fix='store' conflict; "
                "pin at most one of them"
            )
        self.mega_specialize = mega_specialize
        # folded naive reaction (opt-in ulp mode, VERDICT r3 #3): the
        # naive update's u-linear terms (incl. the clamped-window
        # b_field correction) collapse into per-window coefficient
        # fields — near-zero-path op count under exact naive SEMANTICS,
        # at ulp-scale drift from the bit-frozen default rounding
        if naive_fold:
            if boundary != "naive":
                raise UnsupportedConfigError(
                    "naive_fold applies to the naive boundary")
            if naive_fix == "store":
                raise UnsupportedConfigError(
                    "naive_fold and naive_fix='store' conflict; "
                    "pin at most one of them")
            if isinstance(fold, int) and fold > 1:
                raise UnsupportedConfigError(
                    "naive_fold excludes the lane-fold layout")
            if resident == "on":
                raise UnsupportedConfigError(
                    "naive_fold runs on the windowed/mega engines only")
        self.naive_fold = naive_fold

    # -- storage: padded double buffers ------------------------------------

    _MISS = object()  # sentinel: "no record fetched yet"

    def _lookup_tuned(self, shape) -> dict | None:
        """The persisted autotune winner for this configuration, fetched
        ONCE per build_storage and threaded through the tile/K adoption
        below (three separate lookups each re-read the JSON store)."""
        if not self.tuned_lookup:
            return None
        from ..bench import autotune

        return autotune.lookup(
            self.params, shape, self.boundary, self._dtype_str
        )

    def _tr(self, shape, eff_c: int | None = None, tuned=_MISS,
            halo: int | None = None) -> int:
        r, c = shape
        tr = self.block_rows
        if tr is None:
            if tuned is self._MISS:
                tuned = self._lookup_tuned(shape)
            if tuned:
                tr = tuned["block_rows"]
        if tr is None:
            tr = ps.choose_block_rows(
                r, eff_c or c, halo=halo or self.halo,
                boundary=self.boundary,
            )
        rp = -(-r // 8) * 8
        while tr > 8 and tr > rp:
            tr -= 8
        return tr

    def _tiles(self, shape, tuned=_MISS,
               halo: int | None = None) -> Tuple[int, int | None, int]:
        """(tr, tc, chalo): row tile, optional column tile for very wide
        domains (see ops.pallas_stencil.choose_block_cols), column halo.
        ``halo`` is the species' halo depth (defaults to the sim's)."""
        r, c = shape
        halo = halo or self.halo
        if tuned is self._MISS:
            tuned = self._lookup_tuned(shape)
        tc = self.block_cols
        if tc is None:
            # persisted autotune winner may pin column tiling (or pin
            # full-width explicitly via block_cols=None in the record)
            if tuned and "block_cols" in tuned:
                tc = tuned["block_cols"]
            else:
                tc = ps.choose_block_cols(c, halo=halo)
        if tc is not None and tc >= c:
            tc = None
        chalo = ps.COL_HALO if tc is not None else 0
        tr = self._tr(
            shape, eff_c=None if tc is None else tc + 2 * chalo, tuned=tuned,
            halo=halo,
        )
        return tr, tc, chalo

    def _tuned_k(self, tuned) -> Tuple[int, int]:
        """(steps_per_call, halo) for one species: the sim defaults unless
        a persisted autotune winner pins a different depth (a user pin
        wins; interpreter mode keeps the small unroll). Returned — not
        written to self — because halo/K are per-species geometry: a
        second make_species with a different tuned depth must not change
        how the first species' padded buffers are sliced."""
        k = self.steps_per_call
        if not self._explicit_k and not self.interpret:
            tk = (tuned or {}).get("steps_per_call")
            if tk and 1 <= int(tk) <= self.MAX_STEPS_PER_CALL:
                k = int(tk)
        return k, ps.halo_for_steps(k)

    def _fold_factor(self, shape, tuned=_MISS) -> int:
        """Lane-fold factor F for this domain (1 = plain layout)."""
        r, c = shape
        if isinstance(self.fold, int):
            if self.fold > 1:
                if self.dtype != jnp.float32 or self.block_cols is not None:
                    raise UnsupportedConfigError(
                        "fold excludes bf16 storage and column tiling"
                    )
                if (self.boundary == "naive" and c % 128 != 0
                        and not self.interpret):
                    raise UnsupportedConfigError(
                        "naive fold on hardware needs the domain width "
                        "to be a multiple of 128 (panel strip extraction "
                        "is lane-tile aligned)"
                    )
            return self.fold
        if (
            self.fold == "off"
            or self.dtype != jnp.float32
            or (self.boundary == "naive" and c % 128 != 0)
            or self.block_cols is not None
            or self.interpret  # perf adoption; tests pin F explicitly
            or self.resident == "on"  # an explicit resident pin wins
            # naive_fold excludes the lane-fold layout (constructor rule
            # for pins); 'auto' must not re-adopt a folded record behind
            # the user's back — the folded run path has no fast_fold
            or self.naive_fold
        ):
            return 1
        # 'auto' folds ONLY on a measured autotune verdict — never on the
        # width heuristic alone: the hardware width-probe showed fold
        # LOSING at its heuristic geometry (30.3 vs 38.96 at 1080x1920),
        # so unmeasured folding is a foot-gun. choose_fold still picks
        # the F that autotune's fold candidates try.
        if tuned is self._MISS:
            tuned = self._lookup_tuned(shape)
        if tuned and "fold" in tuned:
            return int(tuned["fold"] or 1)  # the measured verdict
        return 1

    def _mega_specialize_resolved(self, tc) -> bool:
        """Interior/edge block specialization for this run. An explicit
        pin wins; the default is off until the hardware A/B adopts it
        (VERDICT r3 #3). Full-width two-species select-fix windows only:
        pinning it with naive_fix='store' is rejected at construction
        (the matrix rule, enforced by the megakernel too); column-tiled
        layouts silently decline — tiling is an auto decision, not a
        user contradiction."""
        if self.naive_fix == "store" or tc is not None:
            return False
        if self.mega_specialize is not None:
            return self.mega_specialize
        return False

    def _mega_tiles(self, shape, tuned=None) -> Tuple[int, int | None]:
        """(tr, tc) the megakernel would run with: explicit pins first,
        then an engine='mega' record's measured tiles, then the geometry
        heuristic (tc=None = full-width windows; a pinned tr alone also
        means full-width, the pre-column-tiling contract)."""
        strip = self.naive_fix == "store"
        tr, tc = self.block_rows, self.block_cols
        if tuned and tuned.get("engine") == "mega":
            if tr is None:
                tr = tuned.get("block_rows")
            if tc is None:
                tc = tuned.get("block_cols")
        if tc is not None and tc >= shape[1]:
            tc = None
        depth = self.mega_depth or 2
        if tr is None and tc is None:
            return mk.choose_mega_geometry(
                *shape, strip_store=strip, boundary=self.boundary,
                depth=depth,
                specialize=self._mega_specialize_resolved(None),
            )
        if tr is None:
            tr = mk.choose_mega_rows(
                *shape, strip_store=strip, tc=tc,
                chalo=ps.COL_HALO if tc is not None else 0,
                boundary=self.boundary, depth=depth,
                specialize=self._mega_specialize_resolved(tc),
            )
        return tr, tc

    def _use_mega(self, shape, tuned=_MISS) -> bool:
        if self.engine == "windowed":
            return False
        strip = self.naive_fix == "store"
        if self.engine == "mega":
            tr, tc = self._mega_tiles(shape)  # pins only: forced engine
            if (isinstance(self.fold, int) and self.fold > 1) or \
                    not mk.mega_ok(shape, tr, strip_store=strip, tc=tc,
                                   boundary=self.boundary,
                                   depth=self.mega_depth or 2,
                                   specialize=self._mega_specialize_resolved(tc)):
                raise UnsupportedConfigError(
                    "engine='mega' needs windows under the VMEM/compile "
                    f"ceilings (including the pinned mega_depth ring and "
                    f"mega_specialize graph) and no lane fold; unsupported "
                    f"for shape {shape} at tr={tr}, tc={tc}"
                )
            return True
        # auto: the megakernel is the TPU default for every domain it
        # supports (hardware-measured faster wherever the state exceeds
        # VMEM residency: the windowed kernel's per-call fixed cost is
        # gone) — except VMEM-resident-size domains, where the resident
        # kernel measured faster (43.3 vs 39.4 Gcell/s at 1080x1920). A
        # persisted autotune verdict overrides the static preference.
        # CPU/interpret runs keep the windowed path (tests pin
        # engine='mega' explicitly); explicit tile/K pins mean "I want
        # THE windowed kernel with these knobs" (also what persisted
        # windowed autotune records rely on).
        tr, tc = mk.choose_mega_geometry(
            *shape, strip_store=strip, boundary=self.boundary,
            depth=self.mega_depth or 2,
            specialize=self._mega_specialize_resolved(None),
        )
        if not (
            not (isinstance(self.fold, int) and self.fold > 1)
            and mk.mega_ok(shape, tr, strip_store=strip, tc=tc,
                           boundary=self.boundary,
                           depth=self.mega_depth or 2,
                           specialize=self._mega_specialize_resolved(tc))
            and not self.interpret
            and not self._explicit_k
            and self.block_rows is None
            and self.block_cols is None
            and self.resident != "on"
            and self._fold_factor(shape, tuned) == 1
        ):
            return False
        if tuned is self._MISS:
            tuned = self._lookup_tuned(shape)
        verdict = (tuned or {}).get("engine")
        if verdict:
            return verdict == "mega"
        if self.dtype != jnp.float32:
            # bf16's static default stays the windowed kernel (its +4.6%
            # deep-K result was measured there); mega+bf16 runs behind an
            # explicit engine pin or a measured per-dtype verdict
            return False
        # no measured verdict: static preference declines mega where the
        # resident kernel fits (hardware: 43.3 vs 39.4 Gcell/s at
        # 1080x1920) and on domains whose best window geometry still
        # carries high halo redundancy (windowed column tiling is the
        # right tool there)
        r, c = shape
        return (
            mk.mega_window_cells(r, c, tr, tc) <= 1.3 * r * c
            and not (self.resident == "auto" and ps.resident_ok(shape))
        )

    def _use_resident(self, shape, tuned=_MISS) -> bool:
        if self.resident == "on":
            return True
        if not (
            self.resident == "auto"
            and self.engine == "auto"  # an engine pin names its kernel
            and not self.interpret  # keep CPU/test runs on the windowed path
            and not self.naive_fold  # the resident kernel has no fold mode
            and self.naive_fix != "store"  # store is windowed/mega-only
            and self.dtype == jnp.float32
            and ps.resident_ok(shape)
            and self.block_rows is None
            and self.block_cols is None
            and not self._explicit_k
        ):
            return False
        if tuned is self._MISS:
            tuned = self._lookup_tuned(shape)
        verdict = (tuned or {}).get("engine")
        return verdict in (None, "resident")

    def _use_pack(self, shape, tuned=_MISS) -> bool:
        """Whether the species-packed layout handles this run."""
        if self.pack == "off":
            return False
        supported = (
            self.boundary == "zero"
            and self.dtype == jnp.float32
            and self.block_cols is None
            and not (isinstance(self.fold, int) and self.fold > 1)
            and self.params.separable_plan()[0] == "separable"
        )
        if self.pack == "on":
            if not supported:
                raise UnsupportedConfigError(
                    "pack requires the zero boundary, f32 storage, a "
                    "separable stencil plan, and no fold/column tiling"
                )
            return True
        # 'auto': like fold, pack only on a measured autotune verdict —
        # hardware must confirm the op-count win before it becomes the
        # default for a shape. Explicit tile/K pins mean "I want THE
        # windowed kernel with these knobs" (same contract as
        # _use_mega/_use_resident): a packed record must not hijack them
        if (
            not supported
            or self.interpret
            or self.block_rows is not None
            or self._explicit_k
        ):
            return False
        if tuned is self._MISS:
            tuned = self._lookup_tuned(shape)
        if tuned and "pack" in tuned:
            return bool(tuned["pack"])
        return False

    def _build_packed(self, u: np.ndarray, v: np.ndarray, tuned):
        """Packed storage: pick the sub-engine (resident / mega /
        windowed) mirroring the unpacked ladder's selection."""
        r, c = u.shape
        pk = tuned if tuned and tuned.get("pack") else None
        verdict = (pk or {}).get("engine")
        # packed-resident liveness envelope is unvalidated: only an
        # explicit pin or a measured verdict selects it — and a verdict
        # never overrides an explicit engine pin (the constructor rejects
        # resident='on' combined with an engine pin)
        if self.resident == "on" or \
                (self.engine == "auto" and verdict == "resident"):
            x = ps.pack_state(u, v, tr=8, halo=0, cquant=128,
                              dtype=np.float32)
            return ("respack", jnp.asarray(x))
        tr = self.block_rows
        if tr is None and pk:
            tr = pk.get("block_rows")
        if self.engine == "mega" and \
                not mk.mega_ok((r, 2 * c), tr, species=1):
            # same contract as the unpacked _use_mega: a forced engine
            # the domain can't support is an immediate error, not a
            # compile-time VMEM failure or remote-compile hang
            raise UnsupportedConfigError(
                "engine='mega' with pack needs full-width windows under "
                f"the VMEM/compile ceilings; unsupported for shape "
                f"{(r, c)} packed to {(r, 2 * c)}"
            )
        use_mega = self.engine == "mega" or (
            self.engine == "auto"
            and verdict in (None, "mega")
            and not self._explicit_k
            and self.block_rows is None
            and mk.mega_ok((r, 2 * c), tr, species=1)
        )
        if use_mega:
            tr = tr or mk.choose_mega_rows(r, 2 * c, species=1)
            x_pair = mk.mega_pack_state(u, v, tr)
            return ("megapack", jnp.asarray(x_pair), tr)
        k, halo = self._tuned_k(pk)
        if tr is None:
            tr = ps.choose_block_rows(r, 2 * c, halo=halo, boundary="zero",
                                      species=1)
        x = ps.pack_state(u, v, tr, halo, dtype=np.float32)
        return ("packed", jnp.asarray(x), tr, halo, k)

    def build_storage(self, u: np.ndarray, v: np.ndarray):
        tuned = self._lookup_tuned(u.shape)
        if self._use_pack(u.shape, tuned):
            return self._build_packed(u, v, tuned)
        if tuned and tuned.get("pack"):
            # a packed record's engine verdict and tiles were measured at
            # the doubled width — meaningless for the unpacked layouts
            # (pack is disabled here): fall back to heuristics
            tuned = None
        if self._use_mega(u.shape, tuned):
            tr, tc = self._mega_tiles(u.shape, tuned)
            strip = self.naive_fix == "store"
            if not mk.mega_ok(u.shape, tr, strip_store=strip, tc=tc,
                              boundary=self.boundary,
                              depth=self.mega_depth or 2,
                              specialize=self._mega_specialize_resolved(tc)):
                # a tuned record's tiles were measured at the default
                # double-buffer/single-stepper envelope; under a deeper
                # mega_depth ring or a specialize pin they can exceed the
                # VMEM/compile budgets the record never saw — re-derive
                # the geometry for the pinned envelope instead
                tr, tc = self._mega_tiles(u.shape)
            u_pair, v_pair = mk.mega_pad_state(u, v, tr, dtype=self.dtype,
                                               tc=tc)
            return ("mega", jnp.asarray(u_pair), jnp.asarray(v_pair),
                    tr, tc)
        f = self._fold_factor(u.shape, tuned)
        if f > 1:
            r, c = u.shape
            fold_tuned = tuned if tuned and tuned.get("fold") == f else None
            k, halo = self._tuned_k(fold_tuned)
            tr = self.block_rows
            if tr is None and fold_tuned:
                tr = fold_tuned["block_rows"]
            if tr is None:
                tr = ps.choose_block_rows(
                    -(-r // f), f * c, halo=halo, boundary=self.boundary
                )
            rp = ps.fold_geometry(r, f, tr)
            if rp < halo:
                raise UnsupportedConfigError(
                    f"fold={f} on a {r}-row domain leaves panels of "
                    f"{rp} rows < the {halo}-row halo; use a smaller "
                    "fold factor"
                )
            u_pad, v_pad = ps.fold_state(u, v, f, tr, halo)
            return ("folded", jnp.asarray(u_pad), jnp.asarray(v_pad),
                    tr, halo, k, f, rp)
        if tuned and int(tuned.get("fold") or 1) > 1:
            # a fold-layout record's tiles are meaningless for the plain
            # layout (the user forced fold off): fall back to heuristics
            tuned = None
        if self._use_resident(u.shape, tuned):
            rp = -(-u.shape[0] // 8) * 8
            cp = -(-u.shape[1] // 128) * 128
            out = []
            for x in (u, v):
                buf = np.zeros((rp, cp), dtype=np.float32)
                buf[: u.shape[0], : u.shape[1]] = x
                out.append(jnp.asarray(buf))
            return ("resident", out[0], out[1])
        if tuned and tuned.get("engine") not in (None, "windowed"):
            # an alternative-engine verdict carries no windowed tiles —
            # don't let a mega record's block_rows masquerade as a tile
            tuned = None
        k, halo = self._tuned_k(tuned)
        tr, tc, chalo = self._tiles(u.shape, tuned, halo)
        u_pad, v_pad = ps.pad_state(u, v, tr, halo, chalo, tc,
                                    dtype=self.dtype)
        # every storage tuple leads with its engine tag: dispatching on
        # `storage[0] == "mega"` with an untagged (array-first) tuple only
        # worked because jax Arrays defer __eq__ on strings — a hazard,
        # not a contract
        return ("windowed", jnp.asarray(u_pad), jnp.asarray(v_pad), tr, tc,
                chalo, halo, k)

    def extract_uv(self, storage, shape) -> Tuple[jax.Array, jax.Array]:
        r, c = shape
        if storage[0] == "megapack":
            _, x_pair, _ = storage
            h = mk.MEGA_STEPS
            cd = x_pair.shape[2] // 2
            return x_pair[0, h : h + r, :c], x_pair[0, h : h + r, cd : cd + c]
        if storage[0] == "respack":
            return ps.unpack_state(storage[1], 0, r, c)
        if storage[0] == "packed":
            _, x_pad, _, halo, _ = storage
            return ps.unpack_state(x_pad, halo, r, c)
        if storage[0] == "mega":
            _, u_pair, v_pair, _, tc = storage
            h = mk.MEGA_STEPS
            ch = ps.COL_HALO if tc is not None else 0
            u = u_pair[0, h : h + r, ch : ch + c]
            v = v_pair[0, h : h + r, ch : ch + c]
            if self.dtype != jnp.float32:  # host views are f32
                u, v = u.astype(jnp.float32), v.astype(jnp.float32)
            return u, v
        if storage[0] == "folded":
            _, u_pad, v_pad, _, halo, _, f, _ = storage
            return (ps.unfold_state(u_pad, halo, f, c, r),
                    ps.unfold_state(v_pad, halo, f, c, r))
        if storage[0] == "resident":
            _, u_res, v_res = storage
            return u_res[:r, :c], v_res[:r, :c]
        _, u_pad, v_pad, _, _, chalo, h, _ = storage
        u = u_pad[h : h + r, chalo : chalo + c]
        v = v_pad[h : h + r, chalo : chalo + c]
        if self.dtype != jnp.float32:  # consumers (HDF5, views) expect f32
            u, v = u.astype(jnp.float32), v.astype(jnp.float32)
        return u, v

    def extract_result(self, storage, shape):
        """V's input concentration only. The base extract_uv()[1] would
        ALSO materialize U's cropped f32 view eagerly, and at HBM-scale
        domains (32768^2 bf16: 8.1 GB of pairs) those two extra device
        temporaries are the difference between fitting and
        ResourceExhausted — so the HBM-scale layouts (mega, windowed,
        folded) build only V's view here, jit-fusing crop + upcast into
        one V-sized output. The packed/resident layouts only run on
        VMEM-scale domains; the base path is fine there."""
        r, c = shape
        if storage[0] == "mega":
            _, _, v_pair, _, tc = storage
            ch = ps.COL_HALO if tc is not None else 0
            return _mega_result_view(v_pair, r=r, c=c, ch=ch)
        if storage[0] == "windowed":
            _, _, v_pad, _, _, chalo, h, _ = storage
            return _pad_result_view(v_pad, r=r, c=c, ch=chalo, h=h)
        if storage[0] == "folded":
            _, _, v_pad, _, halo, _, f, _ = storage
            return ps.unfold_state(v_pad, halo, f, c, r)
        return super().extract_result(storage, shape)

    # -- stepping ------------------------------------------------------------

    def _vmem_limit(self, tr: int, tc, chalo: int, c: int, halo: int,
                    dtype_bytes: int) -> int:
        """Scoped-VMEM limit for Mosaic. The kernel's stack liveness scales
        with the window footprint: compiler-reported 67.61 MB at a
        (288, 4096) f32 window (tr=256, K=16). Scale from that anchor
        with headroom, quantized to hardware-validated tiers and capped
        below the 128 MB physical VMEM (pipeline buffers need the rest)."""
        if self.vmem_limit_bytes is not None:
            return self.vmem_limit_bytes
        w_cols = (tc + 2 * chalo) if tc else c
        return ps.choose_vmem_limit(
            tr, halo, w_cols, dtype_bytes, self.boundary,
            strip_store=self.naive_fix == "store" and tc is None,
        )

    def _reaction(self):
        """(kernel_params, reaction operand, dt_is_one) per the mode."""
        return ps.reaction_mode(self.params, self.runtime_params)

    def run_steps(self, storage, shape, steps: int):
        r, c = shape
        # runtime mode (every engine below): the executable is keyed on
        # the stencil weights plus ONE predicate (is dt exactly 1.0, the
        # default — worth 2 folded multiplies per step); the reaction
        # scalars ride a traced SMEM operand, so f/k/Du/Dv changes never
        # recompile and a dt change recompiles once
        kernel_params, reaction, dt_is_one = self._reaction()
        if storage[0] == "megapack":
            _, x, tr = storage
            common = dict(
                tr=tr, r=r, params=kernel_params,
                interpret=self.interpret, dt_is_one=dt_is_one,
                vmem_limit_bytes=self.vmem_limit_bytes,
            )
            n_full, rem = divmod(steps, mk.MEGA_STEPS)
            if n_full:
                x = mk.packed_megastep(
                    x, jnp.int32(n_full), reaction,
                    steps=mk.MEGA_STEPS, **common,
                )
            if rem:
                x = mk.packed_megastep(
                    x, jnp.int32(1), reaction, steps=rem, **common,
                )
            return ("megapack", x, tr)
        if storage[0] == "respack":
            _, x = storage
            x = ps.packed_resident_multistep(
                x, jnp.int32(steps), reaction,
                r=r, c=c, params=kernel_params,
                interpret=self.interpret, dt_is_one=dt_is_one,
                vmem_limit_bytes=self.vmem_limit_bytes,
                unroll=1 if self.interpret else ps.resident_unroll(
                    x.shape[0], x.shape[1], "zero"
                ),
            )
            return ("respack", x)
        if storage[0] == "packed":
            _, x, tr, halo, k = storage
            common = dict(
                tr=tr, r=r, c=c, params=kernel_params, halo=halo,
                interpret=self.interpret, dt_is_one=dt_is_one,
                vmem_limit_bytes=self.vmem_limit_bytes
                or ps.choose_vmem_limit(tr, halo, 2 * c, 4, "zero"),
            )
            n_full, rem = divmod(steps, k)
            if n_full:
                x = ps.packed_run_blocks(
                    x, jnp.int32(n_full), reaction, steps=k, **common,
                )
            if rem:
                x = ps.packed_multistep(x, reaction, steps=rem, **common)
            return ("packed", x, tr, halo, k)
        if storage[0] == "mega":
            _, u, v, tr, tc = storage
            common = dict(
                tr=tr, r=r, params=kernel_params, boundary=self.boundary,
                interpret=self.interpret, dt_is_one=dt_is_one,
                vmem_limit_bytes=self.vmem_limit_bytes,
                strip_store=self.naive_fix == "store",
                slice_taps=self.naive_fix == "slice",
                tc=tc, c_dom=c if tc is not None else None,
                depth=self.mega_depth or 2,
                specialize=self._mega_specialize_resolved(tc),
                fast_fold=self.naive_fold,
            )
            n_full, rem = divmod(steps, mk.MEGA_STEPS)
            if n_full:
                u, v = mk.megastep(
                    u, v, jnp.int32(n_full), reaction,
                    steps=mk.MEGA_STEPS, **common,
                )
            if rem:
                u, v = mk.megastep(
                    u, v, jnp.int32(1), reaction, steps=rem, **common,
                )
            return ("mega", u, v, tr, tc)
        if storage[0] == "folded":
            _, u, v, tr, halo, k, f, rp = storage
            common = dict(
                tr=tr, params=kernel_params, boundary=self.boundary,
                halo=halo, interpret=self.interpret,
                dt_is_one=dt_is_one,
                slice_taps=self.naive_fix == "slice",
                fold=(f, c, rp),
                vmem_limit_bytes=self.vmem_limit_bytes
                or ps.choose_vmem_limit(tr, halo, f * c, 4, self.boundary,
                                        fold=True),
            )
            n_full, rem = divmod(steps, k)
            if n_full:
                u, v = ps.run_blocks(
                    u, v, -halo, r, jnp.int32(n_full), reaction=reaction,
                    steps=k, **common,
                )
            if rem:
                # the remainder block still needs its halo refresh first,
                # so it runs through the same folded block loop
                u, v = ps.run_blocks(
                    u, v, -halo, r, jnp.int32(1), reaction=reaction,
                    steps=rem, **common,
                )
            return ("folded", u, v, tr, halo, k, f, rp)
        if storage[0] == "resident":
            _, u, v = storage
            u, v = ps.resident_multistep(
                u, v, jnp.int32(steps), reaction,
                r=r, c=c, params=kernel_params, boundary=self.boundary,
                interpret=self.interpret, dt_is_one=dt_is_one,
                slice_taps=self.naive_fix == "slice",
                vmem_limit_bytes=self.vmem_limit_bytes,
                # amortize the in-kernel fori back-edge (compile-ceiling
                # capped); interpreter keeps the small graph
                unroll=1 if self.interpret else ps.resident_unroll(
                    u.shape[0], u.shape[1], self.boundary
                ),
            )
            return ("resident", u, v)
        _, u, v, tr, tc, chalo, halo, k = storage
        n_full, rem = divmod(steps, k)
        common = dict(
            tr=tr, tc=tc, chalo=chalo, params=kernel_params,
            boundary=self.boundary, halo=halo,
            interpret=self.interpret,
            reaction=reaction, dt_is_one=dt_is_one,
            # mask out-of-domain window cells on load instead of re-zeroing
            # the HBM padding rows with 4 host-graph updates per call
            # (bit-identical; saves per-call fixed cost on small domains)
            sanitize=True,
            strip_store=self.naive_fix == "store" and tc is None,
            slice_taps=self.naive_fix == "slice",
            fast_fold=self.naive_fold,
            # liveness scales with the f32 compute copies even when HBM
            # storage is bf16, so always budget at 4 bytes/element
            vmem_limit_bytes=self._vmem_limit(tr, tc, chalo, c, halo, 4),
        )
        # column-tiled storage carries real column padding; tell the kernel
        # where global column 0 sits and how wide the true domain is
        pos = (-halo, r) if chalo == 0 else (-halo, r, -chalo, c)
        if n_full:
            # one device dispatch for all full K-step blocks
            u, v = ps.run_blocks(
                u, v, *pos[:2], jnp.int32(n_full), *pos[2:],
                steps=k, **common,
            )
        if rem:
            u, v = ps.multistep(u, v, *pos, steps=rem, **common)
        return ("windowed", u, v, tr, tc, chalo, halo, k)

    # -- CLI ----------------------------------------------------------------

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser) -> None:
        parser.add_argument(
            "--pallas-block-rows", type=int,
            default=env_default("GRAYSCOTT_PALLAS_BLOCK_ROWS", None, int),
            help="Row-tile size of the Pallas kernel (multiple of 8; "
            "default: VMEM budget heuristic)",
        )
        parser.add_argument(
            "--pallas-block-cols", type=int,
            default=env_default("GRAYSCOTT_PALLAS_BLOCK_COLS", None, int),
            help="Column-tile size (multiple of 128) for very wide domains; "
            "default: full width unless the window would exceed VMEM. "
            "With --pallas-engine mega, pins the megakernel's column tile",
        )
        parser.add_argument(
            "--pallas-dtype", choices=["float32", "bfloat16"],
            default=env_default("GRAYSCOTT_PALLAS_DTYPE", "float32",
                                choices=["float32", "bfloat16"]),
            help="Storage precision: bfloat16 is an opt-in fast mode "
            "(halved HBM traffic and footprint; compute stays f32 in "
            "VMEM) that is NOT bit-compatible with the f32 reference "
            "semantics",
        )
        parser.add_argument(
            "--pallas-resident", choices=["auto", "on", "off"],
            default=env_default("GRAYSCOTT_PALLAS_RESIDENT", "auto",
                                choices=["auto", "on", "off"]),
            help="VMEM-resident whole-domain fast path for small domains "
            "(auto: on TPU when the f32 state fits and no tile is pinned)",
        )
        parser.add_argument(
            "--pallas-fold", type=cls._parse_fold,
            default=env_default("GRAYSCOTT_PALLAS_FOLD", "auto"),
            help="Lane-fold layout for narrow domains: an integer F "
            "computes F row-panels side by side along lanes; 'auto' "
            "(default) folds only when the autotuner measured fold "
            "winning on this domain; 'off' never folds",
        )
        parser.add_argument(
            "--pallas-pack", choices=["auto", "on", "off"],
            default=env_default("GRAYSCOTT_PALLAS_PACK", "auto",
                                choices=["auto", "on", "off"]),
            help="Species-packed layout: U and V side by side along "
            "lanes in one array (halves the diffusion op count; zero "
            "boundary only). 'auto' (default) packs only when the "
            "autotuner measured pack winning on this domain",
        )
        parser.add_argument(
            "--pallas-naive-fix", choices=["select", "store", "slice"],
            default=env_default("GRAYSCOTT_NAIVE_FIX", "select",
                                choices=["select", "store", "slice"]),
            help="Naive-boundary fix-up mechanism: 'select' (default, "
            "bit-frozen) patches the quirk strips with full-window "
            "masked selects; 'store' uses narrow scratch-ref stores "
            "(perf experiment, measured slower); 'slice' feeds the "
            "top-row strip from the laplacian's own shifted tensors — "
            "measured +4.0% on-chip at 4096^2 naive, at ulp-scale drift "
            "from the frozen default (the naive_fold budget class)",
        )
        parser.add_argument(
            "--pallas-naive-fold", choices=["on", "off"],
            default=env_default("GRAYSCOTT_NAIVE_FOLD", "off",
                                choices=["on", "off"]),
            help="Folded naive reaction (opt-in fast mode): the naive "
            "update's u-linear terms, including the clamped-window "
            "boundary correction, collapse into per-window coefficient "
            "fields — near zero-path op count under exact naive "
            "SEMANTICS, at ulp-scale drift from the bit-frozen default "
            "rounding (same budget class as fold/pack/bf16)",
        )
        parser.add_argument(
            "--pallas-engine", choices=["auto", "windowed", "mega"],
            default=env_default("GRAYSCOTT_PALLAS_ENGINE", "auto",
                                choices=["auto", "windowed", "mega"]),
            help="Kernel engine: 'mega' runs the whole step loop in one "
            "manual-DMA kernel launch (amortizes the per-call fixed "
            "cost); 'windowed' is the per-K-block pipeline; 'auto' "
            "(default) picks mega on TPU f32 runs it supports",
        )
        parser.add_argument(
            "--pallas-runtime-params",
            choices=["on", "off"],
            default=env_default("GRAYSCOTT_PALLAS_RUNTIME_PARAMS", "on",
                                choices=["on", "off"]),
            help="Pass the reaction scalars (Du, Dv, f, -(f+k), dt) as a "
            "traced SMEM operand so parameter changes reuse the compiled "
            "kernel (default on; bit-identical to 'off', which folds them "
            "at compile time like the reference's default stencil)",
        )
        parser.add_argument(
            "--pallas-steps-per-call", type=int,
            # None = auto (TPU default 16, interpret 8, autotune winner
            # adoptable); an explicit value pins the depth
            default=env_default("GRAYSCOTT_PALLAS_STEPS_PER_CALL", None, int),
            help=f"Temporal blocking depth (1..{cls.MAX_STEPS_PER_CALL} "
            f"steps fused in VMEM; default {cls.DEFAULT_STEPS_PER_CALL} on "
            "TPU, autotuner may adjust)",
        )

    @classmethod
    def args_from_namespace(cls, ns: argparse.Namespace):
        return {
            "block_rows": getattr(ns, "pallas_block_rows", None),
            "block_cols": getattr(ns, "pallas_block_cols", None),
            "steps_per_call": getattr(ns, "pallas_steps_per_call", None),
            "dtype": getattr(ns, "pallas_dtype", "float32"),
            "runtime_params": getattr(
                ns, "pallas_runtime_params", "on") != "off",
            "resident": getattr(ns, "pallas_resident", "auto"),
            "fold": cls._parse_fold(getattr(ns, "pallas_fold", "auto")),
            "engine": getattr(ns, "pallas_engine", "auto"),
            "pack": getattr(ns, "pallas_pack", "auto"),
            "naive_fix": getattr(ns, "pallas_naive_fix", "select"),
            "naive_fold": getattr(ns, "pallas_naive_fold", "off") == "on",
        }

    @staticmethod
    def _parse_fold(value):
        if isinstance(value, str) and value not in ("auto", "off"):
            try:
                return int(value)
            except ValueError:
                raise argparse.ArgumentTypeError(
                    f"expected 'auto', 'off' or an integer, got {value!r}"
                ) from None
        return value
