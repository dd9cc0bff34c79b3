"""Species-packed layout (x = [U | V] along lanes) numerics validation.

The packed step reuses the unpacked zero kernel's scalars and multiply
orders per lane half (see ops/pallas_stencil.py "species-packed
layout"), but its graph shape gives the compiler different
FMA-contraction freedom — so besides the oracle parity checks these
tests assert ulp-scale closeness (not bit equality) against the
unpacked pallas path, the same budget the fold layout uses.
"""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.params import Parameters, STENCILS

from conftest import random_uv


def run_pallas(u, v, params, steps, **kw):
    sim = PallasSimulation(params, boundary="zero", interpret=True, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("shape", [(24, 16), (19, 16)])
@pytest.mark.parametrize("steps", [1, 3, 11])
def test_packed_windowed_parity(rng, params, shape, steps):
    """Packed windowed engine == oracle, incl. unaligned rows and a
    remainder call (steps=11, K=4)."""
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, steps, "zero")
    gu, gv = run_pallas(u, v, params, steps, pack="on", engine="windowed",
                        block_rows=8, steps_per_call=4)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


@pytest.mark.parametrize("shape", [(24, 16), (17, 23)])
def test_packed_resident_parity(rng, params, shape):
    """Packed VMEM-resident engine == oracle (incl. row AND per-panel
    lane padding from the 128-column quantum)."""
    u, v = random_uv(rng, shape)
    ou, ov = oracle.run(u, v, params, 7, "zero")
    gu, gv = run_pallas(u, v, params, 7, pack="on", resident="on")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_packed_mega_parity(rng, params):
    """Packed megakernel == oracle (multiple row blocks, odd block
    count exercising the HBM parity copy)."""
    u, v = random_uv(rng, (24, 16))
    ou, ov = oracle.run(u, v, params, 24, "zero")
    gu, gv = run_pallas(u, v, params, 24, pack="on", engine="mega",
                        block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_packed_mega_remainder(rng, params):
    """steps not a multiple of MEGA_STEPS: the remainder runs as one
    partial-depth megakernel call."""
    u, v = random_uv(rng, (24, 16))
    ou, ov = oracle.run(u, v, params, 20, "zero")
    gu, gv = run_pallas(u, v, params, 20, pack="on", engine="mega",
                        block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_packed_ulp_close_to_unpacked(rng, params):
    """The packed step uses the same per-lane scalars and multiply
    orders as the unpacked zero kernel; the U half matches bitwise, the
    V half's add chain differs in graph shape (the extra +Evec add)
    which gives the compiler different FMA-contraction freedom — same
    ulp-scale budget as the fold layout (tests/test_fold.py)."""
    u, v = random_uv(rng, (24, 16))
    ru, rv = run_pallas(u, v, params, 8, pack="off", block_rows=8)
    pu, pv = run_pallas(u, v, params, 8, pack="on", engine="windowed",
                        block_rows=8)
    np.testing.assert_allclose(pu, ru, rtol=0, atol=3e-7)
    np.testing.assert_allclose(pv, rv, rtol=0, atol=3e-7)


@pytest.mark.parametrize("stencil", list(STENCILS))
def test_packed_all_separable_stencils(rng, stencil):
    """Every stencil with a separable plan runs packed; non-separable
    plans are rejected by validation."""
    params = Parameters.with_stencil(stencil)
    u, v = random_uv(rng, (16, 16))
    if params.separable_plan()[0] != "separable":
        with pytest.raises(ValueError, match="pack"):
            run_pallas(u, v, params, 4, pack="on", engine="windowed",
                       block_rows=8)
        return
    ou, ov = oracle.run(u, v, params, 4, "zero")
    gu, gv = run_pallas(u, v, params, 4, pack="on", engine="windowed",
                        block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_packed_runtime_params(rng, params):
    """Runtime reaction scalars ride SMEM in packed mode too."""
    u, v = random_uv(rng, (16, 16))
    ou, ov = oracle.run(u, v, params, 4, "zero")
    gu, gv = run_pallas(u, v, params, 4, pack="on", engine="windowed",
                        block_rows=8, runtime_params=True)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_pack_rejects_naive_boundary(rng, params):
    sim = PallasSimulation(params, boundary="naive", interpret=True,
                           pack="on")
    u, v = random_uv(rng, (16, 16))
    with pytest.raises(ValueError, match="pack"):
        sim.build_storage(u, v)

def test_packed_random_geometry_fuzz(rng, params):
    """Randomized shapes/steps across all three packed engines vs the
    oracle — the corner cases live where row round-up, panel lane
    padding and remainder calls meet."""
    for _ in range(6):
        r = int(rng.randint(9, 40))
        c = int(rng.randint(10, 36) // 2 * 2)
        steps = int(rng.randint(1, 18))
        u, v = random_uv(rng, (r, c))
        ou, ov = oracle.run(u, v, params, steps, "zero")
        for kw in (dict(engine="windowed", block_rows=8,
                        steps_per_call=4),
                   dict(resident="on"),
                   dict(engine="mega", block_rows=8)):
            gu, gv = run_pallas(u, v, params, steps, pack="on", **kw)
            np.testing.assert_allclose(
                gu, ou, rtol=0, atol=1e-6,
                err_msg=f"shape=({r},{c}) steps={steps} {kw}")
            np.testing.assert_allclose(
                gv, ov, rtol=0, atol=1e-6,
                err_msg=f"shape=({r},{c}) steps={steps} {kw}")


def test_pack_rejects_bad_value(params):
    with pytest.raises(ValueError, match="pack"):
        PallasSimulation(params, interpret=True, pack="maybe")


def test_pack_autotune_candidates(params):
    """Pack candidates: zero boundary + f32 + separable only; the
    packed-resident sub-engine is gated on the DOUBLED-width array
    fitting the validated liveness envelope (1080p packs only via
    mega/windowed — its 16.7 MB packed array would OOM scoped VMEM
    like the equal-cell 544x3840 probe did)."""
    from grayscott_tpu.bench import autotune

    assert autotune._pack_candidates(
        (1080, 1920), "naive", "float32", params) == []
    assert autotune._pack_candidates(
        (1080, 1920), "zero", "bfloat16", params) == []
    cands = autotune._pack_candidates((1080, 1920), "zero", "float32",
                                      params)
    assert any(c.get("engine") == "mega" for c in cands)
    assert not any(c.get("resident") == "on" for c in cands)
    small = autotune._pack_candidates((256, 512), "zero", "float32",
                                      params)
    assert any(c.get("resident") == "on" for c in small)
    for c in cands + small:
        assert c["pack"] == "on"
        assert autotune._guard_ok(c, (1080, 1920) if c in cands
                                  else (256, 512), "zero")
    non_sep = Parameters.with_stencil("5points")
    assert non_sep.separable_plan()[0] != "separable"
    assert autotune._pack_candidates(
        (256, 512), "zero", "float32", non_sep) == []


def test_pack_tuned_verdict_adopted(monkeypatch, tmp_path, rng, params):
    """pack='auto' follows the persisted tuner verdict: a pack=True
    record selects the packed storage, pack=False keeps it off."""
    import jax

    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    shape = (24, 16)
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                         ps.KERNEL_VERSION)
    u, v = random_uv(rng, shape)
    c.save_autotune({key: {
        "pack": True, "engine": "windowed", "block_rows": 8,
        "steps_per_call": 8, "block_cols": None, "fold": 1,
    }})
    # interpret mode never auto-packs (the verdict is a hardware
    # ranking); pin interpret=False to exercise the adoption path
    sim = PallasSimulation(params, boundary="zero", interpret=False)
    assert sim._use_pack(shape)
    storage = sim.build_storage(u, v)
    assert storage[0] == "packed"
    c.save_autotune({key: {
        "pack": False, "engine": "windowed", "block_rows": 8,
        "steps_per_call": 8, "block_cols": None, "fold": 1,
    }})
    sim2 = PallasSimulation(params, boundary="zero", interpret=False)
    assert not sim2._use_pack(shape)
    assert PallasSimulation(params, boundary="zero")._use_pack(shape) \
        is False


def test_pack_record_tiles_never_leak_unpacked(monkeypatch, tmp_path,
                                               rng, params):
    """A pack=True record's tiles were measured at the doubled width;
    with packing disabled the unpacked path must fall back to
    heuristics, not adopt them."""
    import jax

    from grayscott_tpu.ops import pallas_stencil as ps
    from grayscott_tpu.utils import cache as c

    monkeypatch.setattr(c, "CACHE_DIR", str(tmp_path))
    shape = (64, 128)
    platform = jax.devices()[0].platform
    key = c.autotune_key(platform, shape, "zero", params.stencil_name(),
                         ps.KERNEL_VERSION)
    c.save_autotune({key: {
        "pack": True, "engine": "windowed", "block_rows": 8,
        "steps_per_call": 4, "block_cols": None, "fold": 1,
    }})
    u, v = random_uv(rng, shape)
    sim = PallasSimulation(params, boundary="zero", interpret=True,
                           pack="off")
    storage = sim.build_storage(u, v)
    assert storage[0] == "windowed"
    tr = storage[3]
    assert tr != 8  # heuristic tile, not the packed record's
    assert tr == ps.choose_block_rows(64, 128, halo=storage[6],
                                      boundary="zero")


def test_pack_forced_mega_validates_domain(params):
    """engine='mega' + pack on an unsupported (compile-ceiling) domain
    raises immediately instead of hanging the remote compiler."""
    sim = PallasSimulation(params, boundary="zero", interpret=True,
                           pack="on", engine="mega")
    u = np.zeros((64, 60000), np.float32)
    v = np.ones_like(u)
    with pytest.raises(ValueError, match="mega"):
        sim.build_storage(u, v)
