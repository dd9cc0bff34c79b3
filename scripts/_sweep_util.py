"""Shared harness for hardware A/B sweeps: one subprocess per config with
a hard timeout, because a pathological Mosaic compile can block on the
remote compile service for tens of minutes (measured: tr=384 at 4096 cols
never returned within 25 min at any scoped-VMEM limit)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, __REPO__)
from grayscott_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.bench.harness import run_one
from grayscott_tpu.params import Parameters
cfg = json.loads(__CFG__)
shape = tuple(cfg.get("shape", (4096, 4096)))
sim = PallasSimulation(
    Parameters(), boundary=cfg.get("boundary", "zero"),
    block_rows=cfg.get("tr"), steps_per_call=cfg.get("k"),
    block_cols=cfg.get("tc"),
    dtype=cfg.get("dtype", "float32"),
    vmem_limit_bytes=cfg.get("limit"),
    runtime_params=cfg.get("rt", True),
    resident=cfg.get("resident", "auto"),
    fold=cfg.get("fold", "off"),
    engine=cfg.get("engine", "auto"),
    pack=cfg.get("pack", "auto"),
    naive_fix=cfg.get("fix", "select"),
    mega_depth=cfg.get("depth"),
    mega_specialize=cfg.get("spec"),
    naive_fold=cfg.get("nfold", False),
)
steps = cfg.get("steps", max(64 * cfg.get("k", 16), 256))
res = run_one(sim, shape, steps, "compute", reps=5)
out = {"config": cfg, **res.to_json()}
import jax
if jax.devices()[0].platform == "tpu":
    # on-chip module time rides along so adopt_sweep can gate against
    # the r3 device-ranked records in the SAME unit (wall carries a
    # ~25 ms constant tunnel RTT the chip never sees)
    try:
        dres = run_one(sim, shape, steps, "device", reps=2)
        out["device_gcells_per_sec"] = round(dres.gcells_per_sec, 3)
    except Exception as e:
        print("device-rate trace failed: %r" % (e,), file=sys.stderr)
print("RESULT " + json.dumps(out), flush=True)
"""


def wait_for_tpu(retry_s: int = 120, max_wait_s: int = 6 * 3600) -> bool:
    """Block until the tunneled TPU initializes in a fresh subprocess
    (grayscott_tpu.utils.runtime.wait_for_device, require_tpu)."""
    sys.path.insert(0, REPO)
    from grayscott_tpu.utils.runtime import wait_for_device

    return wait_for_device(
        require_tpu=True, max_wait_s=max_wait_s, retry_s=retry_s
    )


def run_configs(configs, timeout: int | None = None) -> None:
    timeout = timeout or int(os.environ.get("SWEEP_TIMEOUT", "1500"))
    for cfg in configs:
        if not wait_for_tpu():
            print(json.dumps({"config": cfg,
                              "error": "TPU unavailable (gave up)"}),
                  flush=True)
            continue
        print(f"config {cfg} compiling/measuring...", flush=True)
        code = CHILD.replace("__REPO__", repr(REPO)).replace(
            "__CFG__", repr(json.dumps(cfg))
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-u", "-c", code],
                capture_output=True, text=True, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            print(json.dumps({"config": cfg,
                              "error": f"timeout after {timeout}s"}),
                  flush=True)
            continue
        hit = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if hit:
            print(hit[-1][len("RESULT "):], flush=True)
        else:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-12:]
            print(json.dumps({"config": cfg,
                              "error": " | ".join(tail)[-500:]}),
                  flush=True)
    print("DONE", flush=True)
