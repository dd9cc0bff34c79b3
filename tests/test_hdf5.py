import numpy as np
import h5py

from grayscott_tpu.io.hdf5 import Reader, Writer


def test_roundtrip(tmp_path, rng):
    path = tmp_path / "out.h5"
    imgs = [rng.rand(12, 17).astype(np.float32) for _ in range(5)]
    with Writer(path, (12, 17), 5) as w:
        for img in imgs:
            w.write(img)
    with Reader(path) as r:
        assert r.num_images == 5
        assert r.image_shape == (12, 17)
        got = list(r)
    assert len(got) == 5
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)


def test_layout_matches_reference(tmp_path):
    """Dataset 'matrix', shape [n, rows, cols] f32, chunks [1, rows, cols]
    (reference: data/src/hdf5.rs:36-54, :24)."""
    path = tmp_path / "out.h5"
    with Writer(path, (8, 9), 3) as w:
        for _ in range(3):
            w.write(np.zeros((8, 9), np.float32))
    with h5py.File(path, "r") as f:
        ds = f["matrix"]
        assert ds.shape == (3, 8, 9)
        assert ds.dtype == np.float32
        assert ds.chunks == (1, 8, 9)


def test_reader_rejects_wrong_rank(tmp_path):
    path = tmp_path / "bad.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("matrix", data=np.zeros((4, 5), np.float32))
    import pytest

    with pytest.raises(ValueError):
        Reader(path)


def test_reader_recycled_buffer(tmp_path):
    """Reader.read(out=...) decodes into the recycled buffer."""
    import numpy as np

    from grayscott_tpu.io.hdf5 import Reader, Writer

    path = tmp_path / "r.h5"
    imgs = [np.full((4, 6), i, np.float32) for i in range(3)]
    with Writer(path, (4, 6), 3) as w:
        for im in imgs:
            w.write(im)
    with Reader(path) as r:
        buf = np.empty((4, 6), np.float32)
        first = r.read(out=buf)
        assert first is buf
        np.testing.assert_array_equal(first, imgs[0])
        # wrong-shape recycled buffer falls back to allocation
        out = r.read(out=np.empty((2, 2), np.float32))
        np.testing.assert_array_equal(out, imgs[1])
        np.testing.assert_array_equal(r.read(), imgs[2])
        assert r.read() is None


def test_chunk_cap_for_giant_domains(tmp_path):
    """HDF5 refuses chunks >= 4 GiB; the writer keeps the reference's
    one-chunk-per-image layout for every size where it can exist and
    halves the chunk's row dimension where it cannot (round-2 review
    regression: simulate -r 32768 -c 32768 aborted at Writer creation)."""
    from grayscott_tpu.io.hdf5 import _chunk_shape

    assert _chunk_shape(1080, 1920, 4) == (1, 1080, 1920)
    assert _chunk_shape(16384, 16384, 4) == (1, 16384, 16384)  # 1 GiB: fine
    ch = _chunk_shape(32768, 32768, 4)
    assert ch[0] == 1 and ch[2] == 32768
    assert ch[1] * 32768 * 4 < 1 << 32
    # dataset creation itself must succeed (lazily allocated: tiny file)
    w = Writer(tmp_path / "giant.h5", (32768, 32768), 2)
    assert w._dataset.chunks == ch
    w.close()
