"""Validate the vectorized NumPy oracle against a direct per-pixel
transcription of the reference naive loop (compute/naive/src/lib.rs:43-82).
"""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.params import Parameters, Precision, STENCILS

from conftest import random_uv


def brute_force_step(u, v, params, boundary):
    """Per-pixel transcription of the naive update rule, windows and all."""
    rows, cols = u.shape
    w = params.weights_array()
    out_u = np.zeros_like(u)
    out_v = np.zeros_like(v)
    f = Precision(params.feed_rate)
    k = Precision(params.kill_rate)
    for r in range(rows):
        for c in range(cols):
            uc, vc = u[r, c], v[r, c]
            full_u = Precision(0.0)
            full_v = Precision(0.0)
            if boundary == "naive":
                # window clamped to the domain; weights indexed relative to
                # the window's top-left corner (the anchoring quirk)
                r0, r1 = max(r - 1, 0), min(r + 2, rows)
                c0, c1 = max(c - 1, 0), min(c + 2, cols)
                for rr in range(r0, r1):
                    for cc in range(c0, c1):
                        weight = Precision(w[rr - r0, cc - c0])
                        full_u = Precision(full_u + weight * Precision(u[rr, cc] - uc))
                        full_v = Precision(full_v + weight * Precision(v[rr, cc] - vc))
            else:
                for i in range(3):
                    for j in range(3):
                        rr, cc = r + i - 1, c + j - 1
                        tu = u[rr, cc] if 0 <= rr < rows and 0 <= cc < cols else Precision(0.0)
                        tv = v[rr, cc] if 0 <= rr < rows and 0 <= cc < cols else Precision(0.0)
                        weight = Precision(w[i, j])
                        full_u = Precision(full_u + weight * Precision(tu - uc))
                        full_v = Precision(full_v + weight * Precision(tv - vc))
            uv2 = Precision(Precision(uc * vc) * vc)
            du = Precision(
                Precision(Precision(params.diffusion_rate_u) * full_u - uv2)
                + Precision(params.feed_rate) * Precision(Precision(1.0) - uc)
            )
            dv = Precision(
                Precision(Precision(params.diffusion_rate_v) * full_v + uv2)
                - Precision(f + k) * vc
            )
            out_u[r, c] = Precision(uc + du * Precision(params.time_step))
            out_v[r, c] = Precision(vc + dv * Precision(params.time_step))
    return out_u, out_v


@pytest.mark.parametrize("stencil", list(STENCILS))
@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_oracle_matches_brute_force(rng, stencil, boundary):
    params = Parameters.with_stencil(stencil)
    u, v = random_uv(rng, (8, 11))
    bu, bv = brute_force_step(u, v, params, boundary)
    ou, ov = oracle.step(u, v, params, boundary)
    np.testing.assert_array_equal(ou, bu)
    np.testing.assert_array_equal(ov, bv)


def test_boundaries_differ_only_on_edges(rng, params):
    u, v = random_uv(rng, (12, 13))
    nu, _ = oracle.step(u, v, params, "naive")
    zu, _ = oracle.step(u, v, params, "zero")
    np.testing.assert_array_equal(nu[1:-1, 1:-1], zu[1:-1, 1:-1])
    assert np.abs(nu - zu)[0].max() > 0


def test_run_stays_finite(params):
    from grayscott_tpu.species import initial_uv

    u, v = initial_uv((32, 48))
    u, v = oracle.run(u, v, params, 50)
    assert np.isfinite(u).all() and np.isfinite(v).all()
    assert u.max() <= 1.0 + 1e-3 and v.min() >= -1e-3
