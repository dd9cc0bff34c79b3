"""Device-op attribution from a jax.profiler trace (xplane.pb).

`jax.profiler.start_trace`/`stop_trace` works on the tunneled TPU (it
was long misdiagnosed as hanging — the wait was the per-process remote
compile in the warmup step, see BENCHMARKS.md "profiling"), but no
xplane parser ships in this image (no tensorflow; the installed xprof
wheel carries no xplane_pb2). This is a minimal protobuf wire-format
reader for the XSpace schema (tensorflow/core/profiler/protobuf/
xplane.proto) that prints per-line device-op time, the data the
round-1 VERDICT's #1 lever was blocked on.

Usage::

    python scripts/profile_trace.py ...   # capture (writes /tmp/gs_trace)
    python scripts/trace_ops.py /tmp/gs_trace   # attribute

Pass either a trace directory (the newest plugins/profile/*/ run is
used) or an xplane.pb path directly.
"""

from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's bytes.
    Length-delimited values are returned as bytes; varints as ints."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at {i}")
        yield field, wt, val


def _parse_event_metadata(buf: bytes) -> tuple[int, str]:
    eid, name = 0, ""
    for f, _, v in _fields(buf):
        if f == 1:
            eid = v
        elif f == 2:
            name = v.decode("utf-8", "replace")
    return eid, name


def _parse_event(buf: bytes) -> tuple[int, int, int]:
    """(metadata_id, duration_ps, occurrences)."""
    mid = dur = 0
    occ = 1
    for f, _, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 3:
            dur = v
        elif f == 5:
            occ = v
    return mid, dur, occ


def _parse_line(buf: bytes) -> tuple[str, list]:
    name = ""
    events = []
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 11 and not name:
            name = v.decode("utf-8", "replace")
        elif f == 4:
            events.append(_parse_event(v))
    return name, events


def parse_plane(buf: bytes) -> dict:
    name = ""
    lines = []
    meta = {}
    for f, _, v in _fields(buf):
        if f == 2:
            name = v.decode("utf-8", "replace")
        elif f == 3:
            lines.append(_parse_line(v))
        elif f == 4:  # map<int64, XEventMetadata> entry {1: key, 2: value}
            key = None
            val = b""
            for mf, _, mv in _fields(v):
                if mf == 1:
                    key = mv
                elif mf == 2:
                    val = mv
            eid, ename = _parse_event_metadata(val)
            meta[key if key is not None else eid] = ename
    return {"name": name, "lines": lines, "event_names": meta}


def parse_xspace(path: str) -> list[dict]:
    buf = open(path, "rb").read()
    return [parse_plane(v) for f, _, v in _fields(buf) if f == 1]


def find_xplane(arg: str) -> str:
    if os.path.isfile(arg):
        return arg
    hits = sorted(glob.glob(os.path.join(arg, "plugins/profile/*/*.xplane.pb")))
    if not hits:
        raise SystemExit(f"no xplane.pb under {arg}")
    return hits[-1]


def main(argv=None) -> int:
    args = (argv or sys.argv[1:]) or ["/tmp/gs_trace"]
    path = find_xplane(args[0])
    print(f"# {path}")
    for plane in parse_xspace(path):
        # device planes are the interesting ones; skip python/host noise
        if not ("TPU" in plane["name"] or "GPU" in plane["name"]
                or "Device" in plane["name"]):
            continue
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
