"""The minimal xplane.pb wire-format reader (scripts/trace_ops.py) used
for device-op attribution: exercised against a synthetic XSpace built
with the same wire format, since no xplane_pb2 ships in this image."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import trace_ops  # noqa: E402


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
    # XSpace {planes: [plane]}
    return _field(1, 2, plane)


def test_parse_synthetic_xspace(tmp_path):
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(_build_xspace())
    planes = trace_ops.parse_xspace(str(path))
    assert len(planes) == 1
    plane = planes[0]
    assert plane["name"] == "/device:TPU:0"
    assert plane["event_names"] == {7: "fused_multiply"}
    (lname, events), = plane["lines"]
    assert lname == "XLA Modules"
    assert [(m, d) for m, d, _ in events] == [(7, 1500), (7, 500)]


def test_find_xplane_prefers_file_and_dir_layout(tmp_path):
    run = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    run.mkdir(parents=True)
    pb = run / "host.xplane.pb"
    pb.write_bytes(_build_xspace())
    assert trace_ops.find_xplane(str(tmp_path)) == str(pb)
    assert trace_ops.find_xplane(str(pb)) == str(pb)


def test_module_device_ms():
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import device_rate

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        run = os.path.join(d, "plugins", "profile", "r1")
        os.makedirs(run)
        with open(os.path.join(run, "vm.xplane.pb"), "wb") as f:
            f.write(_build_xspace())
        # 1500 + 500 ps on the XLA Modules line of the TPU plane
        assert device_rate.module_device_ms(d) == (1500 + 500) / 1e9
