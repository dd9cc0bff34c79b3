"""Device-time throughput: what the chip actually sustains, without the
tunnel's per-dispatch/sync latency.

The jax.profiler trace (working — see trace_ops.py) shows the XLA
module's device_duration directly. Wall-clock benches through the
tunneled TPU carry a roughly constant per-measurement overhead
(dispatch request + data-dependent sync readback RTTs) that deflates
small-domain numbers: at 1080x1920 the wall measurement is ~49 ms for
1024 steps of which only ~21 ms is device time. This script measures
the device rate per configuration: warm up (pays the per-process
executable load), then trace ONE timed dispatch and report the TPU
plane's module duration.

Usage::

    nohup python -u scripts/device_rate.py [configs.json] > .devrate.log 2>&1 &

With no argument the default CONFIGS below run; a JSON argument is a
list of dicts with keys shape (required), label, engine, pack,
boundary, dtype, steps.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grayscott_tpu.utils import xplane  # noqa: E402

CONFIGS = [
    # the reference-default family: is 1080p actually slow on-chip?
    {"shape": (1080, 1920), "label": "1080p auto(resident)"},
    {"shape": (1080, 1920), "engine": "mega", "label": "1080p mega"},
    {"shape": (1080, 1920), "pack": "on", "engine": "mega",
     "label": "1080p packed-mega"},
    # the headline
    {"shape": (4096, 4096), "engine": "mega", "label": "4096 mega"},
    {"shape": (2048, 2048), "engine": "mega", "pack": "off",
     "label": "2048 mega"},
    {"shape": (2048, 2048), "engine": "mega", "pack": "on",
     "label": "2048 packed-mega"},
    {"shape": (4096, 4096), "engine": "mega", "boundary": "naive",
     "label": "4096 mega naive"},
]

STEPS = 1024


module_device_ms = xplane.module_device_ms


def main(argv=None) -> int:
    from grayscott_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = argv if argv is not None else sys.argv[1:]
    configs = CONFIGS
    if args:
        with open(args[0]) as f:
            configs = json.load(f)
    results = []
    for cfg in configs:
        try:
            _run_one(cfg, results)
        except Exception as e:  # keep later configs alive past one OOM
            print("RESULT " + json.dumps(
                {"label": cfg.get("label"), "error":
                 f"{type(e).__name__}: {e}"[:300]}), flush=True)
    print("DONE", flush=True)
    return 0


def _run_one(cfg, results) -> None:
    import jax

    from grayscott_tpu.backends.pallas import PallasSimulation
    from grayscott_tpu.params import Parameters

    shape = tuple(cfg["shape"])
    label = cfg.get("label") or "_".join(
        str(cfg.get(k, "")) for k in
        ("shape", "engine", "pack", "boundary", "dtype") if cfg.get(k)
    )
    steps = int(cfg.get("steps", STEPS))
    sim = PallasSimulation(
        Parameters(), boundary=cfg.get("boundary", "zero"),
        engine=cfg.get("engine", "auto"), pack=cfg.get("pack", "auto"),
        dtype=cfg.get("dtype", "float32"),
        block_rows=cfg.get("tr"), block_cols=cfg.get("tc"),
        mega_depth=cfg.get("depth"), mega_specialize=cfg.get("spec"),
        naive_fold=cfg.get("nfold", False),
        vmem_limit_bytes=cfg.get("limit"),
    )
    sp = sim.make_species(shape)
    # warm: compile/load every executable the timed run will use
    sim.perform_steps(sp, steps)
    sp.result_host()
    tdir = "/tmp/devrate/" + "".join(
        c if c.isalnum() else "_" for c in label
    )
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    try:
        sim.perform_steps(sp, steps)
        sp.result_host()
    finally:
        # an exception inside the trace window (transfer error, OOM)
        # must still close the profiler session, or every later
        # config's start_trace fails with "profiler already started" —
        # defeating main()'s keep-configs-alive handler
        jax.profiler.stop_trace()
    dev_ms = module_device_ms(tdir)
    cells = shape[0] * shape[1]
    rate = cells * steps / (dev_ms * 1e-3) / 1e9 if dev_ms else 0.0
    row = {"label": label, "steps": steps, "device_ms": round(dev_ms, 3),
           "device_gcells_per_sec": round(rate, 2)}
    results.append(row)
    print("RESULT " + json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
