"""Parameterized hardware A/B sweep driver (consolidates the former
bench_ab*.py one-offs; their configurations and results are indexed in
SWEEPS.md).

Each configuration runs in its own subprocess with a hard timeout
(scripts/_sweep_util.py), because a config past the Mosaic compile
ceiling can block on the remote compile service for tens of minutes.
The remote compiler also pays a full compile/load on each process's
FIRST execution of a kernel regardless of the client-side persistent
cache, so expect ~10-20 min per new configuration.

Examples::

    # tile-geometry sweep at the reference-default domain
    nohup python -u scripts/sweep.py --shape 1080x1920 --boundary naive \
        --configs 360,16 216,16 272,16 > .sweep_geom.log 2>&1 &

    # full per-config dicts (any keys of the child protocol:
    # tr, k, tc, shape, boundary, dtype, limit, steps, runtime_params)
    python scripts/sweep.py --json '[{"tr": 256, "k": 16, "dtype": "bfloat16"}]'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_util import run_configs  # noqa: E402


def parse_shape(s: str) -> list[int]:
    r, c = s.lower().split("x")
    return [int(r), int(c)]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--shape", type=parse_shape, default=[4096, 4096],
                   help="domain RxC (default 4096x4096)")
    p.add_argument("--boundary", default="zero", choices=["zero", "naive"])
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--steps", type=int, default=None,
                   help="steps per measurement (default 64*K, min 256)")
    p.add_argument("--timeout", type=int, default=None,
                   help="per-config subprocess timeout seconds "
                   "(default $SWEEP_TIMEOUT or 1500)")
    p.add_argument("--configs", nargs="*", default=[],
                   metavar="TR,K[,TC]",
                   help="tile configs as tr,k or tr,k,tc triples")
    p.add_argument("--json", default=None,
                   help="JSON list of full config dicts (a path or inline); "
                   "merged after --configs")
    args = p.parse_args(argv)

    base = {"shape": args.shape, "boundary": args.boundary}
    if args.dtype:
        base["dtype"] = args.dtype
    if args.steps:
        base["steps"] = args.steps
    configs = []
    for spec in args.configs:
        parts = [int(x) for x in spec.split(",")]
        cfg = dict(base, tr=parts[0], k=parts[1])
        if len(parts) > 2:
            cfg["tc"] = parts[2]
        configs.append(cfg)
    if args.json:
        raw = args.json
        if os.path.exists(raw):
            with open(raw) as f:
                raw = f.read()
        for extra in json.loads(raw):
            configs.append(dict(base, **extra))
    if not configs:
        p.error("no configurations given (--configs or --json)")
    run_configs(configs, timeout=args.timeout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
