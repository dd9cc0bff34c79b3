"""Lane-fold layout validation (interpreter mode on CPU) against the
NumPy oracle.

The fold layout (ops/pallas_stencil.py "lane-fold layout") computes F
row-panels of a narrow domain side by side along lanes, with inter-panel
halo rows refreshed every K-step block — the sharded backend's halo
exchange, but across lane space within one chip. These tests cover the
refresh cadence (steps spanning several K-blocks), uneven panel
partitions (dead rows in the last panel), remainder blocks, and the
fold/unfold round trip.
"""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.params import Parameters

from conftest import random_uv


def run_folded(u, v, params, steps, fold, boundary="zero", **kw):
    sim = PallasSimulation(params, boundary=boundary, interpret=True,
                           fold=fold, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    assert species.storage[0] == "folded"
    sim.perform_steps(species, steps)
    return species.uv_host()


def test_fold_state_round_trip(rng):
    u, v = random_uv(rng, (37, 24))
    uf, vf = ps.fold_state(u, v, 3, 8, halo=8)
    rp = ps.fold_geometry(37, 3, 8)
    assert uf.shape == (8 + rp + 8, 3 * 24)
    back = ps.unfold_state(uf, 8, 3, 24, 37)
    np.testing.assert_array_equal(np.asarray(back), u)
    np.testing.assert_array_equal(
        np.asarray(ps.unfold_state(vf, 8, 3, 24, 37)), v
    )


@pytest.mark.parametrize("steps", [1, 8, 19])
def test_folded_parity_even_panels(rng, params, steps):
    """F=2 over 32 rows: panels partition evenly; 19 steps = 2 full
    K=8 blocks + remainder 3, so the inter-panel refresh runs mid-run."""
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, steps, "zero")
    gu, gv = run_folded(u, v, params, steps, fold=2, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_folded_parity_uneven_panels(rng, params):
    """R=37, F=3 => Rp=16 with dead rows past R in the last panel; the
    fold mask must keep them (and panel 0's top halo) zero."""
    u, v = random_uv(rng, (37, 24))
    ou, ov = oracle.run(u, v, params, 9, "zero")
    gu, gv = run_folded(u, v, params, 9, fold=3, block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_folded_matches_unfolded(rng, params):
    """Folding only changes op geometry, not the math: the fold and
    plain paths run the same op chain, so they agree to within FMA
    contraction — the v4 zero-path linear fold's 3-term chains leave
    the compiler free to contract mul+add differently per kernel
    specialization (probed: K=1/K=2 specializations are bitwise, K=8
    rounds 1 ulp apart on ~2% of cells after 8 steps; under kernel v3
    F=1 happened to be bitwise). Both F=1 and F=2 are therefore held to
    the same tight ulp-scale budget rather than bit equality."""
    u, v = random_uv(rng, (48, 16))

    def plain(tr):
        sim = PallasSimulation(params, boundary="zero", interpret=True,
                               block_rows=tr)
        species = sim.make_species(u.shape)
        species.storage = sim.build_storage(u, v)
        sim.perform_steps(species, 8)
        return species.uv_host()

    wu, wv = plain(8)
    fu1 = ps.fold_state(u, v, 1, 8, 8)
    ou, ov = ps.run_blocks(
        np.asarray(fu1[0]), np.asarray(fu1[1]), -8, 48, 1,
        steps=8, tr=8, params=params, boundary="zero", halo=8,
        interpret=True, fold=(1, 16, 48),
    )
    np.testing.assert_allclose(
        ps.unfold_state(np.asarray(ou), 8, 1, 16, 48), wu,
        rtol=0, atol=3e-7,
    )
    np.testing.assert_allclose(
        ps.unfold_state(np.asarray(ov), 8, 1, 16, 48), wv,
        rtol=0, atol=3e-7,
    )
    pu, pv = run_folded(u, v, params, 8, fold=2, block_rows=8)
    np.testing.assert_allclose(pu, wu, rtol=0, atol=3e-7)
    np.testing.assert_allclose(pv, wv, rtol=0, atol=3e-7)


def test_folded_runtime_params(rng):
    """The runtime-parameter SMEM operand composes with fold."""
    params = Parameters(feed_rate=0.03, kill_rate=0.059)
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, 6, "zero")
    gu, gv = run_folded(u, v, params, 6, fold=2, block_rows=8,
                        runtime_params=True)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


@pytest.mark.parametrize("steps", [1, 8, 19])
def test_folded_naive_parity(rng, params, steps):
    """Naive (reference-CPU clamped-window) semantics under fold: every
    panel owns a copy of the global column-0 quirk strip; the top-row
    strip and b_field edge tests go panel-local."""
    u, v = random_uv(rng, (32, 16))
    ou, ov = oracle.run(u, v, params, steps, "naive")
    gu, gv = run_folded(u, v, params, steps, fold=2, boundary="naive",
                        block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_folded_naive_uneven_panels(rng, params):
    """Dead rows + the bottom domain row's clamped stencil must coexist:
    R=37, F=3 puts the true bottom edge (g=36) mid-panel."""
    u, v = random_uv(rng, (37, 24))
    ou, ov = oracle.run(u, v, params, 9, "naive")
    gu, gv = run_folded(u, v, params, 9, fold=3, boundary="naive",
                        block_rows=8)
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


def test_choose_fold_heuristic():
    # reference default 1080x1920 -> F=2 (3840 lanes)
    assert ps.choose_fold(1080, 1920) == 2
    # already wide: no fold
    assert ps.choose_fold(4096, 4096) == 1
    # 2048^2 -> F=2 (4096 lanes)
    assert ps.choose_fold(2048, 2048) == 2
    # too short to amortize the halo redundancy: no fold
    assert ps.choose_fold(128, 256) == 1


@pytest.mark.parametrize("stencil", ["oono-puri", "pretty", "5points"])
def test_folded_all_stencils(rng, stencil):
    """Fold composes with both laplacian plans (separable and full-tap)
    and both boundaries across stencils."""
    from grayscott_tpu.params import Parameters as P

    params = P.with_stencil(stencil)
    u, v = random_uv(rng, (32, 16))
    for boundary in ("zero", "naive"):
        ou, ov = oracle.run(u, v, params, 5, boundary)
        gu, gv = run_folded(u, v, params, 5, fold=2, boundary=boundary,
                            block_rows=8)
        np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
        np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)
