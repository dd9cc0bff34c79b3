"""The minimal xplane.pb wire-format reader (grayscott_tpu.utils.xplane,
CLI in scripts/trace_ops.py) used for device-op attribution: exercised
against a synthetic XSpace built with the same wire format, since no
xplane_pb2 ships in this image."""

import os
import sys

import pytest

from grayscott_tpu.utils import xplane

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes | int) -> bytes:
    key = _varint(num << 3 | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _build_xspace() -> bytes:
    # XEventMetadata {id: 7, name: "fused_multiply"}
    emeta = _field(1, 0, 7) + _field(2, 2, b"fused_multiply")
    # map entry {key: 7, value: emeta}
    entry = _field(1, 0, 7) + _field(2, 2, emeta)
    # two XEvents {metadata_id: 7, duration_ps: ...}
    ev1 = _field(1, 0, 7) + _field(3, 0, 1500)
    ev2 = _field(1, 0, 7) + _field(3, 0, 500)
    # XLine {name: "XLA Modules", events: [ev1, ev2]}
    line = (_field(2, 2, b"XLA Modules")
            + _field(4, 2, ev1) + _field(4, 2, ev2))
    # XPlane {name: "/device:TPU:0", lines: [line], event_metadata: entry}
    plane = (_field(2, 2, b"/device:TPU:0") + _field(3, 2, line)
             + _field(4, 2, entry))
    # XSpace {planes: [plane, host plane]}
    host = _field(2, 2, b"/host:CPU")
    return _field(1, 2, plane) + _field(1, 2, host)


def test_parse_synthetic_xspace(tmp_path):
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(_build_xspace())
    planes = xplane.parse_xspace(str(path))
    assert [p["name"] for p in planes] == ["/device:TPU:0", "/host:CPU"]
    plane = planes[0]
    assert plane["event_names"] == {7: "fused_multiply"}
    (lname, events), = plane["lines"]
    assert lname == "XLA Modules"
    assert [(m, d) for m, d, _ in events] == [(7, 1500), (7, 500)]
    # host planes are excluded from device summaries
    assert [p["name"] for p in xplane.device_planes(str(path))] == [
        "/device:TPU:0"
    ]


def test_find_xplane_prefers_file_and_dir_layout(tmp_path):
    run = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    run.mkdir(parents=True)
    pb = run / "host.xplane.pb"
    pb.write_bytes(_build_xspace())
    assert xplane.find_xplane(str(tmp_path)) == str(pb)
    assert xplane.find_xplane(str(pb)) == str(pb)
    with pytest.raises(FileNotFoundError):
        xplane.find_xplane(str(tmp_path / "nope"))


def test_module_device_ms_and_op_summary(tmp_path):
    run = tmp_path / "plugins" / "profile" / "r1"
    run.mkdir(parents=True)
    (run / "vm.xplane.pb").write_bytes(_build_xspace())
    # 1500 + 500 ps on the XLA Modules line of the TPU plane
    assert xplane.module_device_ms(str(tmp_path)) == (1500 + 500) / 1e9
    ops = xplane.op_summary(str(tmp_path), line="XLA Modules")
    assert ops == {"fused_multiply": ((1500 + 500) / 1e9, 2)}


def test_device_workload_needs_device_plane():
    """The bench 'device' workload fails with a clear message on CPU
    (host-only traces carry no XLA-module device time)."""
    from grayscott_tpu.backends import get_backend
    from grayscott_tpu.bench.harness import run_one
    from grayscott_tpu.params import Parameters

    sim = get_backend("fused")(Parameters())
    with pytest.raises(RuntimeError, match="device-plane"):
        run_one(sim, (16, 32), 2, workload="device", reps=1)


def test_trace_ops_cli(tmp_path, capsys):
    run = tmp_path / "plugins" / "profile" / "r1"
    run.mkdir(parents=True)
    (run / "vm.xplane.pb").write_bytes(_build_xspace())
    import trace_ops

    assert trace_ops.main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "/device:TPU:0" in out and "fused_multiply" in out
