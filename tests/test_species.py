import numpy as np

from grayscott_tpu.species import initial_uv


def test_initial_uv_1080p():
    # reference: data/src/concentration/mod.rs:36-59; defaults 1080x1920
    u, v = initial_uv((1080, 1920))
    assert u.dtype == np.float32 and v.dtype == np.float32
    # box rows [7*1080/16 - 4, 8*1080/16 - 4) = [468, 536)
    # box cols [7*1920/16, 8*1920/16) = [840, 960)
    assert (v[468:536, 840:960] == 1.0).all()
    assert (u[468:536, 840:960] == 0.0).all()
    v_box = np.zeros_like(v)
    v_box[468:536, 840:960] = 1.0
    np.testing.assert_array_equal(v, v_box)
    assert (u + v == 1.0).all()


def test_initial_uv_saturating_sub():
    # tiny grids: start index saturates at 0 rather than going negative
    u, v = initial_uv((8, 8))
    # rows: 8*7//16 - 4 = 0 (saturated from -1? 3-4 -> saturating 0), end 8*8//16-4 = 0
    # -> empty row range; entire grid stays U=1, V=0
    assert (u == 1.0).all() and (v == 0.0).all()


def test_initial_uv_256x384():
    # the BASELINE parity config
    u, v = initial_uv((256, 384))
    r0 = 256 * 7 // 16 - 4
    r1 = 256 * 8 // 16 - 4
    c0 = 384 * 7 // 16
    c1 = 384 * 8 // 16
    assert (v[r0:r1, c0:c1] == 1.0).all()
    assert v.sum() == (r1 - r0) * (c1 - c0)
