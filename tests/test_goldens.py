"""Golden-file regression tests.

The fixtures in tests/goldens/ were generated once by the NumPy oracle
(the bit-faithful transcription of the reference update rule) and are
committed to the repository — the golden-HDF5 methodology SURVEY.md section
4 calls for, anchored to the oracle since no Rust toolchain exists in this
image to run the reference itself. They freeze the numerics across future
refactors: the oracle must reproduce them bit-for-bit, the optimized
backends within the f32 drift budget.
"""

import os

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends import get_backend
from grayscott_tpu.params import Parameters
from grayscott_tpu.species import initial_uv

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CONFIGS = [
    ("naive_oono_64x96_100", (64, 96), "oono-puri", "naive", 100, {}),
    ("zero_oono_48x64_64", (48, 64), "oono-puri", "zero", 64, {}),
    ("naive_pk_32x32_50", (32, 32), "patra-karttunen", "naive", 50, {}),
    ("naive_oono_fk_40x56_80", (40, 56), "oono-puri", "naive", 80,
     dict(feed_rate=0.03, kill_rate=0.062)),
]


def _load(name):
    data = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    return data["u"], data["v"]


@pytest.mark.parametrize("name,shape,stencil,boundary,steps,kw", CONFIGS)
def test_oracle_reproduces_goldens(name, shape, stencil, boundary, steps, kw):
    params = Parameters.with_stencil(stencil, **kw)
    u, v = initial_uv(shape)
    u, v = oracle.run(u, v, params, steps, boundary)
    gu, gv = _load(name)
    np.testing.assert_array_equal(u, gu)
    np.testing.assert_array_equal(v, gv)


@pytest.mark.parametrize("name,shape,stencil,boundary,steps,kw", CONFIGS)
def test_fused_matches_goldens(name, shape, stencil, boundary, steps, kw):
    params = Parameters.with_stencil(stencil, **kw)
    sim = get_backend("fused")(params, boundary=boundary)
    species = sim.make_species(shape)
    sim.perform_steps(species, steps)
    u, v = species.uv_host()
    gu, gv = _load(name)
    np.testing.assert_allclose(u, gu, rtol=0, atol=2e-5)
    np.testing.assert_allclose(v, gv, rtol=0, atol=2e-5)
