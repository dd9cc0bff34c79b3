"""Minimal xplane.pb reader: device-op attribution without TensorFlow.

``jax.profiler`` writes XSpace protos (tensorflow/core/profiler/protobuf/
xplane.proto), but neither tensorflow nor an xplane_pb2 module ships in
this image, so this is a hand-rolled protobuf wire-format reader for the
fields the framework needs: plane/line names, event metadata names, and
per-event device durations. It powers

- ``scripts/trace_ops.py`` — per-op device-time attribution (the working
  substitute for the reference's ``gpu-debug-utils`` + GPU profiler
  story, SURVEY.md section 5);
- the bench harness's ``device`` workload — device-time throughput,
  excluding the tunneled TPU's ~25-30 ms per-measurement dispatch+sync
  overhead that deflates small-domain wall-clock numbers.
"""

from __future__ import annotations

import glob
import os
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
    """An xplane.pb path from either a direct path or a trace dir (the
    newest ``plugins/profile/<run>/`` capture wins)."""
    if os.path.isfile(arg):
        return arg
    hits = sorted(glob.glob(os.path.join(arg, "plugins/profile/*/*.xplane.pb")))
    if not hits:
        raise FileNotFoundError(f"no xplane.pb under {arg}")
    return hits[-1]


def device_planes(path: str) -> list[dict]:
    return [p for p in parse_xspace(path)
            if "TPU" in p["name"] or "GPU" in p["name"]]


def module_device_ms(trace_dir: str) -> float:
    """Total XLA-module device time (ms) across device planes — the pure
    on-chip cost of everything dispatched inside the trace window."""
    total = 0
    for plane in device_planes(find_xplane(trace_dir)):
        for lname, events in plane["lines"]:
            if lname != "XLA Modules":
                continue
            for _, dur, _ in events:
                total += dur
    return total / 1e9


def op_summary(trace_dir: str, line: str = "XLA Ops") -> dict[str, tuple]:
    """{op name: (total_ms, occurrences)} for one device-plane line."""
    per_op: dict[str, list] = defaultdict(lambda: [0, 0])
    for plane in device_planes(find_xplane(trace_dir)):
        names = plane["event_names"]
        for lname, events in plane["lines"]:
            if lname != line:
                continue
            for mid, dur, occ in events:
                agg = per_op[names.get(mid, f"id{mid}")]
                agg[0] += dur
                agg[1] += occ
    return {k: (d / 1e9, o) for k, (d, o) in per_op.items()}
