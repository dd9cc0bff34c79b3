"""Physics property tests — invariants no reference output is needed for."""

import numpy as np
import pytest

from grayscott_tpu.backends import get_backend
from grayscott_tpu.params import Parameters


@pytest.mark.parametrize("backend", ["naive", "fused", "conv"])
@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_uniform_state_is_fixed_point(params, backend, boundary):
    """U=1, V=0 everywhere is an exact fixed point: the diffusion gradient
    vanishes (even at edges, since all taps equal the center... except the
    zero border, where full_u = -sum(w_used) * 1 * Du contributes — so the
    fixed point is only exact in the interior for `zero`; for `naive` the
    clamped window makes it exact everywhere)."""
    sim = get_backend(backend)(params, boundary=boundary)
    species = sim.make_species((16, 24))
    u = np.ones((16, 24), np.float32)
    v = np.zeros((16, 24), np.float32)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 5)
    gu, gv = species.uv_host()
    if boundary == "naive":
        np.testing.assert_allclose(gu, 1.0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(gv, 0.0, rtol=0, atol=1e-6)
    else:
        # zero border drains U at the edges; the perturbation propagates
        # one cell per step, so depth > steps is still exactly fixed
        np.testing.assert_allclose(gu[6:-6, 6:-6], 1.0, rtol=0, atol=1e-6)
        np.testing.assert_allclose(gv, 0.0, rtol=0, atol=1e-6)
        assert gu[0, 5] < 1.0  # edge cells genuinely drain


def test_mirror_symmetry_preserved(params):
    """A left-right symmetric initial condition evolves symmetrically
    (zero-border semantics; the naive anchoring quirk deliberately breaks
    this symmetry at the edges, mirroring the reference)."""
    rng = np.random.RandomState(7)
    half = rng.uniform(0, 1, (24, 16)).astype(np.float32)
    u = np.concatenate([half, half[:, ::-1]], axis=1)
    v = u[::-1, :].copy()  # any symmetric-in-the-same-way field
    v = np.concatenate([v[:, :16], v[:, :16][:, ::-1]], axis=1)
    sim = get_backend("fused")(params, boundary="zero")
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 20)
    gu, gv = species.uv_host()
    np.testing.assert_allclose(gu, gu[:, ::-1], rtol=0, atol=1e-5)
    np.testing.assert_allclose(gv, gv[:, ::-1], rtol=0, atol=1e-5)


def test_naive_quirk_breaks_symmetry(params):
    """Regression guard for the anchoring quirk: under `naive` semantics a
    symmetric field does NOT stay exactly symmetric at the edges — the
    asymmetric weight anchoring (compute/regular/src/lib.rs:174-179) is a
    real, intentional property of the reference."""
    rng = np.random.RandomState(8)
    half = rng.uniform(0.2, 0.8, (16, 8)).astype(np.float32)
    u = np.concatenate([half, half[:, ::-1]], axis=1)
    v = np.concatenate([half, half[:, ::-1]], axis=1) * np.float32(0.5)
    sim = get_backend("fused")(params, boundary="naive")
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, 5)
    gu, _ = species.uv_host()
    assert np.abs(gu - gu[:, ::-1]).max() > 1e-6
