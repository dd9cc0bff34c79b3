"""Naive strip-STORE fix-ups (narrow scratch-ref stores instead of
full-window selects, ops/pallas_stencil._fix_naive_store).

The strip expressions and overwrite order match the select path exactly,
but the scratch-ref round trip MATERIALIZES the diffusion gradient,
changing the compiler's FMA-contraction choices — measured ~1 ulp drift
on ~30% of cells after 8 steps (the same effect as the fold and pack
layouts). The select path stays the bit-frozen default; store mode is an
opt-in perf experiment asserted to the standard ulp budget."""

import numpy as np
import pytest

from grayscott_tpu import oracle
from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.params import Parameters, STENCILS

from conftest import random_uv


def run(u, v, params, steps, **kw):
    sim = PallasSimulation(params, boundary="naive", interpret=True, **kw)
    species = sim.make_species(u.shape)
    species.storage = sim.build_storage(u, v)
    sim.perform_steps(species, steps)
    return species.uv_host()


@pytest.mark.parametrize("shape", [(24, 16), (19, 23)])
def test_store_ulp_close_windowed(rng, params, shape):
    u, v = random_uv(rng, shape)
    su, sv = run(u, v, params, 8, block_rows=8)
    tu, tv = run(u, v, params, 8, block_rows=8, naive_fix="store")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_store_ulp_close_mega(rng, params):
    u, v = random_uv(rng, (24, 16))
    su, sv = run(u, v, params, 16, engine="mega", block_rows=8)
    tu, tv = run(u, v, params, 16, engine="mega", block_rows=8,
                 naive_fix="store")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_store_oracle_exact(rng, params):
    """The store path keeps the bit-frozen reference-CPU semantics."""
    u, v = random_uv(rng, (17, 16))
    ou, ov = oracle.run(u, v, params, 5, "naive")
    gu, gv = run(u, v, params, 5, block_rows=8, naive_fix="store")
    np.testing.assert_allclose(gu, ou, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gv, ov, rtol=0, atol=1e-6)


@pytest.mark.parametrize("stencil", list(STENCILS))
def test_store_all_stencils(rng, stencil):
    params = Parameters.with_stencil(stencil)
    u, v = random_uv(rng, (16, 16))
    su, sv = run(u, v, params, 4, block_rows=8)
    tu, tv = run(u, v, params, 4, block_rows=8, naive_fix="store")
    np.testing.assert_allclose(tu, su, rtol=0, atol=3e-7)
    np.testing.assert_allclose(tv, sv, rtol=0, atol=3e-7)


def test_store_requires_naive():
    with pytest.raises(ValueError, match="naive"):
        PallasSimulation(Parameters(), boundary="zero", interpret=True,
                         naive_fix="store")
    with pytest.raises(ValueError, match="naive_fix"):
        PallasSimulation(Parameters(), boundary="naive", interpret=True,
                         naive_fix="bogus")


def test_store_lowers_for_tpu():
    """Both strip-store kernels (windowed run_blocks and the megakernel)
    must lower to Mosaic — the @pl.when-gated (1, C) top-row store and
    the (W, 1) column store are new kernel graph shapes."""
    import jax
    import jax.numpy as jnp

    from grayscott_tpu.ops import megakernel as mk
    from grayscott_tpu.ops import pallas_stencil as ps

    params = Parameters()
    r, c, tr = 64, 256, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    u_pad, v_pad = ps.pad_state(u0, v0, tr)

    def fn(u_pad, v_pad):
        return ps.run_blocks(
            u_pad, v_pad, -ps.HALO, r, jnp.int32(2),
            reaction=ps.reaction_operand(params),
            steps=8, tr=tr, params=params.structure_only(),
            boundary="naive", sanitize=True, dt_is_one=True,
            strip_store=True,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pad), jnp.asarray(v_pad)
    )
    assert "tpu_custom_call" in exp.mlir_module()

    u_pair, v_pair = mk.mega_pad_state(u0, v0, tr)

    def fn_mega(u, v):
        return mk.megastep_impl(
            u, v, jnp.int32(3), ps.reaction_operand(params),
            steps=8, tr=tr, r=r, params=params.structure_only(),
            boundary="naive", dt_is_one=True, strip_store=True,
        )

    exp = jax.export.export(jax.jit(fn_mega), platforms=["tpu"])(
        jnp.asarray(u_pair), jnp.asarray(v_pair)
    )
    assert "tpu_custom_call" in exp.mlir_module()
