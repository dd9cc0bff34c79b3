"""Device-op attribution from a jax.profiler trace (xplane.pb).

`jax.profiler.start_trace`/`stop_trace` works on the tunneled TPU (it
was long misdiagnosed as hanging — the wait was the per-process remote
compile in the warmup step, see BENCHMARKS.md "profiling"). The parser
lives in ``grayscott_tpu.utils.xplane`` (no tensorflow in this image);
this CLI prints per-line device-op time, the data the round-1 VERDICT's
#1 lever was blocked on.

Usage::

    python scripts/profile_trace.py ...   # capture (writes /tmp/grayscott_trace)
    python scripts/trace_ops.py /tmp/grayscott_trace  # attribute

Pass either a trace directory (the newest plugins/profile/*/ run is
used) or an xplane.pb path directly.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grayscott_tpu.utils import xplane  # noqa: E402


def main(argv=None) -> int:
    args = (argv or sys.argv[1:]) or ["/tmp/grayscott_trace"]
    path = xplane.find_xplane(args[0])
    print(f"# {path}")
    for plane in xplane.device_planes(path):
        print(f"\n== plane: {plane['name']}")
        names = plane["event_names"]
        for lname, events in plane["lines"]:
            if not events:
                continue
            per_op = defaultdict(lambda: [0, 0])
            for mid, dur, occ in events:
                agg = per_op[names.get(mid, f"id{mid}")]
                agg[0] += dur
                agg[1] += occ
            total = sum(d for d, _ in per_op.values())
            print(f"-- line: {lname} (total {total / 1e9:.3f} ms)")
            for op, (dur, occ) in sorted(
                per_op.items(), key=lambda kv: -kv[1][0]
            )[:20]:
                print(f"   {dur / 1e9:10.3f} ms  x{occ:<6} {op[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
