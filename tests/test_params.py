import numpy as np
import pytest

from grayscott_tpu.params import (
    DEFAULT_STENCIL,
    Parameters,
    STENCILS,
    STENCIL_OFFSET,
)


def test_defaults_match_reference():
    # reference: data/src/parameters.rs:72-83
    p = Parameters()
    assert p.diffusion_rate_u == 0.1
    assert p.diffusion_rate_v == 0.05
    assert p.feed_rate == 0.014
    assert p.kill_rate == 0.054
    assert p.time_step == 1.0
    assert p.weights == STENCILS["oono-puri"]
    assert DEFAULT_STENCIL == "oono-puri"


def test_stencils():
    w = np.asarray(STENCILS["oono-puri"])
    assert w.sum() == 3.0
    assert w[1, 1] == 0.0
    assert (w == w.T).all()
    assert np.asarray(STENCILS["pretty"]).sum() == 9.0
    assert np.asarray(STENCILS["5points"]).sum() == 4.0
    pk = np.asarray(STENCILS["patra-karttunen"])
    np.testing.assert_allclose(pk.sum(), 20.0 / 6.0, rtol=1e-6)


def test_corrected_weights():
    # reference: data/src/parameters.rs:57-63
    for name in STENCILS:
        p = Parameters.with_stencil(name)
        w = p.weights_array()
        wc = p.corrected_weights()
        expected_center = np.float32(w[STENCIL_OFFSET]) - np.float32(w.sum())
        np.testing.assert_allclose(wc[STENCIL_OFFSET], expected_center, rtol=1e-6)
        off = wc.copy()
        off[STENCIL_OFFSET] = w[STENCIL_OFFSET]
        np.testing.assert_array_equal(off, w)


def test_min_feed_kill():
    p = Parameters()
    np.testing.assert_allclose(p.min_feed_kill(), -(0.014 + 0.054), rtol=1e-6)


def test_separable_plan():
    for name in ("oono-puri", "pretty", "patra-karttunen"):
        p = Parameters.with_stencil(name)
        kind, h, alpha = p.separable_plan()
        assert kind == "separable"
        # outer(h, h) must reproduce the off-center weights and
        # alpha = h1^2 - center + sum(w)
        w = p.weights_array().astype(np.float64)
        hh = np.outer(h, h)
        mask = np.ones((3, 3), bool)
        mask[1, 1] = False
        np.testing.assert_allclose(hh[mask], w[mask], rtol=1e-6)
        np.testing.assert_allclose(alpha, h[1] ** 2 - w[1, 1] + w.sum(), rtol=1e-6)
    kind, wc = Parameters.with_stencil("5points").separable_plan()
    assert kind == "direct"


def test_unknown_stencil():
    with pytest.raises(ValueError):
        Parameters.with_stencil("nope")


def test_hashable_static():
    assert hash(Parameters()) == hash(Parameters())
    assert Parameters() == Parameters()


def test_presets():
    """Named (feed, kill) presets: construction, override contract, and
    the liveness property the PRESETS docstring promises — every preset
    produces a live, structured, finite V field in this discretization
    (spot-checked at 1500 steps here; the full 4000-step probe ran at
    selection time)."""
    from grayscott_tpu.params import PRESETS

    p = Parameters.with_preset("coral")
    assert (p.feed_rate, p.kill_rate) == PRESETS["coral"]
    assert p.weights == Parameters().weights
    # explicit rates override the preset pair (the CLI -f/-k contract)
    q = Parameters.with_preset("coral", feed_rate=0.02)
    assert q.feed_rate == 0.02 and q.kill_rate == PRESETS["coral"][1]
    assert Parameters.with_preset("maze", stencil="5points").weights == \
        Parameters.with_stencil("5points").weights
    with pytest.raises(ValueError):
        Parameters.with_preset("nope")
    # "reference" is exactly the reference's shipped default pair
    assert Parameters.with_preset("reference") == Parameters()

    from grayscott_tpu.backends import get_backend

    for name in ("solitons", "maze", "chaos"):
        sim = get_backend("fused")(Parameters.with_preset(name))
        sp = sim.make_species((96, 96))
        sim.perform_steps(sp, 1500)
        v = sp.result_host()
        assert np.isfinite(v).all(), name
        assert v.max() > 0.1 and v.std() > 0.01, name  # alive + structured
