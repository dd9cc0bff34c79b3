"""Naive slice-taps fix-ups (``--pallas-naive-fix slice``): the top-row
quirk strip slices its column-shifted taps from the SAME full-window
shifted tensors the laplacian consumes (bitwise-equal tap values — lane
shifts commute with row extraction), replacing the per-step narrow
(1, C) lane rotates + mask rebuilds. Measured r5: +4.0% on-chip at
4096^2 naive (BENCHMARKS.md).

NOT the bit-frozen default: making the shift tensors multi-consumer
changes the compiler's fusion/FMA-contraction choices, drifting ~1 ulp
per step from the select path (the same budget class as fold/pack/
store/naive_fold) — and, under XLA:CPU, differently per parameter mode,
which is exactly the modes-bit-identical contract the default keeps."""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.errors import UnsupportedConfigError
from grayscott_tpu.params import Parameters, STENCILS

from conftest import random_uv


def run(u, v, params, steps, boundary="naive", **kw):
    sim = PallasSimulation(params, boundary=boundary, interpret=True,
                           tuned_lookup=False, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("shape", [(24, 16), (19, 23)])
def test_slice_ulp_close_windowed(rng, params, shape):
    u, v = random_uv(rng, shape)
    su, sv = run(u, v, params, 8, block_rows=8)
    tu, tv = run(u, v, params, 8, block_rows=8, naive_fix="slice")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_slice_ulp_close_mega(rng, params):
    u, v = random_uv(rng, (24, 16))
    su, sv = run(u, v, params, 16, engine="mega", block_rows=8)
    tu, tv = run(u, v, params, 16, engine="mega", block_rows=8,
                 naive_fix="slice")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_slice_oracle_exact(rng, params):
    """The sliced taps keep the reference-CPU naive semantics."""
    u, v = random_uv(rng, (17, 16))
    ou, ov = oracle.run(u, v, params, 5, "naive")
    gu, gv = run(u, v, params, 5, block_rows=8, naive_fix="slice")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


@pytest.mark.parametrize("stencil", list(STENCILS))
def test_slice_all_stencils(rng, stencil):
    """Every stencil, including the direct (non-separable) 5-point
    plan, agrees with the select path to the ulp budget."""
    params = Parameters.with_stencil(stencil)
    u, v = random_uv(rng, (16, 16))
    su, sv = run(u, v, params, 4, block_rows=8)
    tu, tv = run(u, v, params, 4, block_rows=8, naive_fix="slice")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_slice_column_tiled(rng, params):
    """Column-tiled windows (where global column 0 sits at chalo) keep
    oracle agreement under sliced taps."""
    u, v = random_uv(rng, (24, 256))
    ou, ov = oracle.run(u, v, params, 3, "naive")
    gu, gv = run(u, v, params, 3, block_rows=8, block_cols=128,
                 naive_fix="slice")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_slice_composes_with_naive_fold(rng, params):
    """slice + naive_fold (both ulp-budget modes) compose: the slice
    contribution stays within its own budget of the naive_fold baseline
    (each mode carries ~1 ulp/step; their sum can graze past a single
    budget, so the comparison isolates one mode)."""
    u, v = random_uv(rng, (24, 16))
    fu, fv = run(u, v, params, 8, block_rows=8, naive_fold=True)
    tu, tv = run(u, v, params, 8, block_rows=8, naive_fix="slice",
                 naive_fold=True)
    np.testing.assert_allclose(tu, fu, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, fv, rtol=0, atol=3e-7)


def test_slice_resident_ulp_close(rng, params):
    """The VMEM-resident kernel carries slice too (the 1080p-class
    small-domain engine): ulp-budget agreement with its select form."""
    u, v = random_uv(rng, (24, 32))
    su, sv = run(u, v, params, 9, resident="on")
    tu, tv = run(u, v, params, 9, resident="on", naive_fix="slice")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_slice_rejected_off_naive():
    with pytest.raises(UnsupportedConfigError, match="naive"):
        PallasSimulation(Parameters(), boundary="zero", interpret=True,
                         naive_fix="slice")


def test_slice_never_auto_adopted(tmp_path, monkeypatch, rng, params):
    """naive_fix is a user pin only: no autotune candidate generates it,
    so a persisted record can never flip the bit-frozen default (the
    strip-store adoption rule, scripts/adopt_sweep.py)."""
    from grayscott_tpu.bench import autotune

    for cands in (autotune.DEFAULT_CANDIDATES,
                  autotune._fallback_candidates((64, 128), "naive")):
        for c in cands:
            assert "naive_fix" not in dict(c)


def test_slice_rides_resident_auto(rng, params):
    """resident='auto' keeps the resident engine under a slice pin (the
    kernel carries it); the store pin still forces windowed/mega."""
    sim = PallasSimulation(params, boundary="naive", interpret=False,
                           naive_fix="slice", tuned_lookup=False)
    assert sim._use_resident((32, 256))
    sim2 = PallasSimulation(params, boundary="naive", interpret=False,
                            naive_fix="store", tuned_lookup=False)
    assert not sim2._use_resident((32, 256))
