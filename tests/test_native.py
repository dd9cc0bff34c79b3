import numpy as np
import pytest

from grayscott_tpu import native
from grayscott_tpu.utils.palette import AMPLITUDE_SCALE, colorize, inferno_lut


def numpy_colorize(values, scale=AMPLITUDE_SCALE):
    lut = inferno_lut().astype(np.float32)
    t = np.clip(values * np.float32(scale), 0.0, 1.0).astype(np.float32)
    x = t * 255.0
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, 255)
    frac = (x - lo)[..., None]
    rgb = lut[lo] * (1.0 - frac) + lut[hi] * frac
    return (rgb + 0.5).astype(np.uint8)


def test_native_builds_and_matches_numpy(rng):
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    v = rng.uniform(-0.2, 1.2, (250, 333)).astype(np.float32)
    got = native.colorize(v, inferno_lut(), AMPLITUDE_SCALE)
    expected = numpy_colorize(v)
    np.testing.assert_array_equal(got, expected)


def test_native_multithreaded_consistency(rng):
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    v = rng.uniform(0, 1, (600, 700)).astype(np.float32)  # > threshold
    a = native.colorize(v, inferno_lut(), 2.0, num_threads=1)
    b = native.colorize(v, inferno_lut(), 2.0, num_threads=8)
    np.testing.assert_array_equal(a, b)


def test_colorize_dispatch(rng):
    """Public colorize() output matches the NumPy reference either way."""
    v = rng.uniform(0, 0.6, (40, 50)).astype(np.float32)
    np.testing.assert_array_equal(colorize(v), numpy_colorize(v))


def test_colorize_nan_safe(rng, monkeypatch):
    """A diverged simulation writes NaN snapshots (e.g. dt too large);
    colorize must map them to palette index 0, not index out of the LUT
    (round-2 review regression: the native clamp propagated NaN and
    segfaulted data-to-pics; the NumPy fallback raised IndexError)."""
    v = rng.uniform(0, 0.6, (40, 50)).astype(np.float32)
    v[3, 7] = np.nan
    v[10:12, :] = np.nan
    lut = inferno_lut()

    def check(got):
        np.testing.assert_array_equal(got[3, 7], lut[0])
        np.testing.assert_array_equal(
            got[10], np.broadcast_to(lut[0], (50, 3))
        )
        # non-NaN cells are untouched
        np.testing.assert_array_equal(got[0], numpy_colorize(v[:1])[0])

    if native.load() is not None:
        check(native.colorize(v, lut, AMPLITUDE_SCALE))
    # the NumPy fallback path, forced
    monkeypatch.setattr(native, "colorize", lambda *a, **k: None)
    check(colorize(v))


def test_png_encode_roundtrip(rng):
    """Native PNG stream decodes (via PIL) to the exact input pixels."""
    if native.load() is None:
        import pytest

        pytest.skip("no native toolchain")
    import io

    from PIL import Image

    rgb = rng.randint(0, 256, (37, 53, 3)).astype("uint8")
    data = native.png_encode(rgb)
    assert data is not None and data[:8] == b"\x89PNG\r\n\x1a\n"
    back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)


def test_png_encode_levels(rng):
    if native.load() is None:
        import pytest

        pytest.skip("no native toolchain")
    import io

    from PIL import Image

    # smooth gradient (the realistic INFERNO-field case) compresses
    v = np.linspace(0, 255, 64 * 96 * 3).astype("uint8").reshape(64, 96, 3)
    fast = native.png_encode(v, level=1)
    small = native.png_encode(v, level=9)
    assert fast and small and len(small) <= len(fast)
    for data in (fast, small):
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(back, v)


def test_stale_library_rebuilt(tmp_path, monkeypatch):
    """A library that passes the mtime freshness check but fails the ABI
    gate (e.g. a committed binary restored by git checkout, mtime newer
    than the source) must trigger one rebuild attempt, not permanently
    disable the native path."""
    import subprocess

    try:
        ok = subprocess.run(
            ["g++", "--version"], capture_output=True
        ).returncode == 0
    except OSError:
        ok = False
    if not ok:
        pytest.skip("no C++ toolchain available")
    stale_src = tmp_path / "stale.cpp"
    stale_src.write_text(
        'extern "C" int gs_native_abi_version() { return 1; }\n'
    )
    stale_lib = tmp_path / "stale.so"
    subprocess.run(
        ["g++", "-O0", "-shared", "-fPIC", str(stale_src), "-o",
         str(stale_lib)],
        check=True,
    )
    lib_path = tmp_path / "_gs_native.so"
    lib_path.write_bytes(stale_lib.read_bytes())
    monkeypatch.setattr(native, "_LIB_PATH", str(lib_path))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    # make the stale library pass the freshness check
    import os

    os.utime(lib_path, None)
    lib = native.load()
    assert lib is not None, "ABI-mismatched library was not rebuilt"
    assert lib.gs_native_abi_version() == 4


def test_colorize_out_recycling(rng):
    """colorize(out=...) writes into the recycled buffer and matches the
    allocating path bit-for-bit (native and NumPy fallback)."""
    from grayscott_tpu.utils.palette import colorize

    v = rng.uniform(-0.1, 1.1, (45, 67)).astype(np.float32)
    fresh = colorize(v)
    buf = np.zeros_like(fresh)
    got = colorize(v, out=buf)
    assert got is buf
    np.testing.assert_array_equal(got, fresh)
    # mismatched recycled buffer is ignored, not corrupted
    bad = np.zeros((3, 3, 3), np.uint8)
    got2 = colorize(v, out=bad)
    assert got2 is not bad
    np.testing.assert_array_equal(got2, fresh)
