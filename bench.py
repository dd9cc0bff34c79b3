"""Headline benchmark: Gray-Scott throughput at 4096^2, 1000 steps.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Gcell/s", "vs_baseline": N}

``value`` is cell-updates per second (the reference's criterion throughput
unit, compute/shared/src/benchmark.rs:59) on the best available backend.
``vs_baseline`` is the fraction of the single-chip HBM-bandwidth roofline
(~51.2 Gcell/s on a ~819 GB/s v5e at 16 B/cell/step; see BASELINE.md) —
1.0 means the memory-bound speed of light for a non-temporal-blocked
solver; temporal blocking can exceed it.

Timing methodology: the whole 1000-step run is a handful of device
dispatches (the steps loop lives on device); synchronization is a tiny
data-dependent readback, because full-frame transfers through the tunneled
TPU are slow and block_until_ready is unreliable there.

The headline is a STEADY-STATE rate, measured the way the reference's own
criterion harness samples (one sample = N iterations timed together,
total/iters — compute/shared/src/benchmark.rs:77-83): five 1000-step runs
enqueued back-to-back with ONE final sync. Through this installation's
tunneled TPU, every sync costs a constant ~22-30 ms round trip REGARDLESS
of payload (BENCHMARKS.md "tunnel-overhead floor" — rtt_probe.py shows
even a 4-byte blocking readback pays it); batching amortizes that single
mandatory RTT over 5x the work, so the steady-state number tracks what the
chip sustains (and what a local-host TPU user would measure) instead of
the tunnel's per-round-trip latency. The single-run wall rate (one run,
one sync — the rounds 1-3 headline definition) is still measured and
printed on stderr for continuity.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


ROOFLINE_GCELLS = 51.2  # 819 GB/s / 16 B per cell-update (BASELINE.md)


def measure(r=4096, c=4096, steps=1000, backend=None, boundary="zero"):
    """Flagship throughput. Boundary defaults to the zero-border semantics
    of the reference's own fastest backend (gpu_specialized,
    compute/gpu/naive/src/main.comp) — the apples-to-apples headline; the
    reference-CPU `naive` semantics measures ~10% lower (edge strip work)
    and is what the parity tests use."""
    from grayscott_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from grayscott_tpu.backends import best_backend_name, get_backend
    from grayscott_tpu.params import Parameters

    name = backend or best_backend_name(shape=(r, c))
    if name == "sharded" and len(jax.devices()) == 1:
        name = "pallas"
    sim = get_backend(name)(Parameters(), boundary=boundary)
    species = sim.make_species((r, c))

    def sync():
        return float(np.asarray(jnp.sum(species.result()[:8, :128])))

    # warm up BOTH executables the measured run will use: the K-step block
    # loop and (if steps % K != 0) the remainder kernel — a cold remainder
    # compile inside the timed region once cost 3 orders of magnitude
    k = getattr(sim, "steps_per_call", 8)
    sim.prepare_steps(species, 2 * k + steps % k)
    sync()
    # best-of-5 (bench/harness.py now samples 5 like criterion): the
    # tunneled dispatch path adds run-to-run noise — and occasionally a
    # DEGRADED-LINK window where every sync RTT runs 3-4x the ~25 ms
    # floor (observed r3). A short pause between samples gives a
    # congested link a chance to drain; the best sample is the honest
    # kernel+link floor either way.
    dt = float("inf")
    for i in range(5):
        t0 = time.time()
        sim.prepare_steps(species, steps)
        sync()
        dt = min(dt, time.time() - t0)
        if i < 4:
            time.sleep(1.0)
    single = r * c * steps / dt / 1e9
    # steady-state headline: BATCH back-to-back runs, one sync —
    # criterion's sample model (total time / iters). Best of 3 samples.
    batch = 5
    bt = float("inf")
    for i in range(3):
        t0 = time.time()
        for _ in range(batch):
            sim.prepare_steps(species, steps)
        sync()
        bt = min(bt, time.time() - t0)
        if i < 2:
            time.sleep(1.0)
    steady = r * c * steps * batch / bt / 1e9
    return name, steady, single, batch


def measure_boundary(boundary: str):
    """measure() with the robust pure-XLA fallback: the fused backend runs
    everywhere — but say WHY on stderr first, or a TPU-side regression
    reads as a silent ~10x throughput collapse with nothing to debug (the
    JSON line still names backend=fused, the honest label for what ran)."""
    try:
        return measure(boundary=boundary)
    except Exception:
        import traceback

        print(f"bench.py: primary backend failed ({boundary} boundary), "
              "falling back to fused:", file=sys.stderr)
        traceback.print_exc()
        return measure(backend="fused", boundary=boundary)


def main() -> int:
    # best-effort wait for the tunneled TPU (multi-hour outages observed);
    # bench still runs on any platform via the fused-backend fallback
    from grayscott_tpu.utils.runtime import wait_for_device

    wait_for_device()
    name, gcells, single, batch = measure_boundary("zero")
    print(f"bench.py: zero boundary: single-run wall (1 run, 1 sync): "
          f"{single:.2f} Gcell/s; steady-state ({batch} runs, 1 sync): "
          f"{gcells:.2f}", file=sys.stderr)
    # second tracked row: the CLI DEFAULT semantics (--boundary naive,
    # reference-CPU edge handling) so a regression on the default path
    # moves a recorded number, not just the zero-border headline —
    # the reference's sweep exists for the same reason
    # (compute/shared/src/benchmark.rs:50-72)
    nname, ngcells, nsingle, _ = measure_boundary("naive")
    print(f"bench.py: naive boundary: single-run wall {nsingle:.2f} "
          f"Gcell/s; steady-state {ngcells:.2f}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": (
                    f"Gcell-updates/s steady-state, 4096^2 x 1000 steps "
                    f"x{batch} back-to-back runs with one sync "
                    f"(criterion-style total/iters), backend={name}, "
                    "zero-border semantics (reference gpu_specialized "
                    "parity); value_* keys carry both methodologies and "
                    "naive_* the CLI-default boundary semantics"
                ),
                # headline (zero boundary, steady-state) — same definition
                # as BENCH_r04.json; the explicit keys below keep the two
                # methodologies from ever being conflated in a trend
                "value": round(gcells, 3),
                "unit": "Gcell/s",
                "vs_baseline": round(gcells / ROOFLINE_GCELLS, 4),
                "value_steady_state": round(gcells, 3),
                "value_single_run": round(single, 3),
                "naive_steady_state": round(ngcells, 3),
                "naive_single_run": round(nsingle, 3),
                "naive_vs_baseline": round(ngcells / ROOFLINE_GCELLS, 4),
                "naive_backend": nname,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
