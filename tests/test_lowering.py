"""TPU-lowerability gate: the Pallas kernel must lower to Mosaic.

``jax.export`` cross-platform lowering runs the full Pallas->Mosaic
pass client-side, on CPU, in seconds — no TPU needed. This is the gate
that catches "unimplemented primitive in Pallas TPU lowering" failures
(e.g. jnp .at[].set -> scatter, narrow patches -> dynamic_update_slice,
both probed NotImplemented in round 2) in CI instead of twenty minutes
into a hardware run. Interpreter-mode numerics tests cannot catch these:
the interpreter never lowers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grayscott_tpu.ops import pallas_stencil as ps
from grayscott_tpu.params import Parameters


def _export_multistep(boundary: str, runtime: bool, tc=None, chalo=0,
                      dtype=jnp.float32):
    params = Parameters()
    r, c, tr = 64, 256, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    u_pad, v_pad = ps.pad_state(u0, v0, tr, chalo=chalo, tc=tc, dtype=dtype)
    reaction = ps.reaction_operand(params) if runtime else None
    kernel_params = params.structure_only() if runtime else params

    def fn(u_pad, v_pad):
        return ps.multistep_impl(
            u_pad, v_pad, -ps.HALO, r, -chalo if chalo else 0,
            c if chalo else None, reaction,
            steps=8, tr=tr, params=kernel_params, boundary=boundary,
            tc=tc, chalo=chalo,
        )

    return jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pad), jnp.asarray(v_pad)
    )


@pytest.mark.parametrize("runtime", [True, False])
@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_multistep_lowers_for_tpu(boundary, runtime):
    exp = _export_multistep(boundary, runtime)
    assert "tpu_custom_call" in exp.mlir_module()


def test_column_tiled_lowers_for_tpu():
    exp = _export_multistep("naive", True, tc=128, chalo=128)
    assert "tpu_custom_call" in exp.mlir_module()


def test_bf16_storage_lowers_for_tpu():
    exp = _export_multistep("zero", True, dtype=jnp.bfloat16)
    assert "tpu_custom_call" in exp.mlir_module()


@pytest.mark.parametrize("boundary", ["zero", "naive"])
@pytest.mark.parametrize("runtime", [True, False])
def test_folded_lowers_for_tpu(boundary, runtime):
    """The lane-fold layout (panel-seam column masks + panel-dependent
    row mask + inter-panel refresh; for naive also the per-panel
    lane-offset strip extraction) must lower to Mosaic — at the real
    1080x1920 F=2 production geometry, through run_blocks (refresh
    included)."""
    params = Parameters()
    r, c, f, tr = 1080, 1920, 2, 272
    rp = ps.fold_geometry(r, f, tr)
    wr = 16 + rp + 16
    u = jnp.zeros((wr, f * c), jnp.float32)
    v = jnp.ones_like(u)
    reaction = ps.reaction_operand(params) if runtime else None
    kernel_params = params.structure_only() if runtime else params

    def fn(u, v):
        return ps.run_blocks(
            u, v, -16, r, jnp.int32(2), reaction=reaction,
            steps=16, tr=tr, params=kernel_params, boundary=boundary,
            halo=16, fold=(f, c, rp), dt_is_one=runtime,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(u, v)
    assert "tpu_custom_call" in exp.mlir_module()


@pytest.mark.parametrize("boundary", ["naive", "zero"])
def test_resident_kernel_lowers_for_tpu(boundary):
    """The VMEM-resident kernel (in-kernel fori_loop, zero-filled row
    shifts) must lower to Mosaic, for exact-fit and padded domains."""
    params = Parameters()
    for r, c in ((64, 256), (60, 250)):
        rp, cp = -(-r // 8) * 8, -(-c // 128) * 128
        u = jnp.zeros((rp, cp), jnp.float32)
        v = jnp.ones_like(u)

        def fn(u, v):
            return ps.resident_multistep_impl(
                u, v, jnp.int32(32), ps.reaction_operand(params),
                r=r, c=c, params=params.structure_only(),
                boundary=boundary, dt_is_one=True,
            )

        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(u, v)
        assert "tpu_custom_call" in exp.mlir_module()


@pytest.mark.parametrize("boundary", ["zero", "naive"])
@pytest.mark.parametrize("runtime", [True, False])
def test_megakernel_lowers_for_tpu(boundary, runtime):
    """The whole-run manual-DMA megakernel (traced pair-slot DMA indices,
    semaphore waits, HBM->HBM parity copy, input/output aliasing) must
    lower to Mosaic."""
    from grayscott_tpu.ops import megakernel as mk

    params = Parameters()
    r, c, tr = 64, 256, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    u_pair, v_pair = mk.mega_pad_state(u0, v0, tr)
    reaction = ps.reaction_operand(params) if runtime else None
    kernel_params = params.structure_only() if runtime else params

    def fn(u, v):
        return mk.megastep_impl(
            u, v, jnp.int32(3), reaction,
            steps=8, tr=tr, r=r, params=kernel_params, boundary=boundary,
            dt_is_one=runtime,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pair), jnp.asarray(v_pair)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_megakernel_production_geometry_lowers_for_tpu():
    """The real production geometries (B=2 at 1080x1920, B>2 at 4096^2
    with the slot-reuse wait branch) lower to Mosaic."""
    from grayscott_tpu.ops import megakernel as mk

    params = Parameters()
    for r, c in ((1080, 1920), (4096, 4096)):
        tr = mk.choose_mega_rows(r, c)
        rp = -(-r // tr) * tr
        u = jnp.zeros((2, 8 + rp + 8, c), jnp.float32)
        v = jnp.ones_like(u)

        def fn(u, v):
            return mk.megastep_impl(
                u, v, jnp.int32(4), ps.reaction_operand(params),
                steps=8, tr=tr, r=r, params=params.structure_only(),
                boundary="naive", dt_is_one=True,
            )

        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(u, v)
        assert "tpu_custom_call" in exp.mlir_module()


@pytest.mark.parametrize("runtime", [True, False])
def test_packed_kernels_lower_for_tpu(runtime):
    """The species-packed layout's three sub-engines (windowed K-block,
    VMEM-resident, megakernel) must lower to Mosaic — the lane roll
    over the species seam and the per-lane coefficient selects are new
    kernel graph shapes."""
    from grayscott_tpu.ops import megakernel as mk

    params = Parameters()
    r, c, tr, halo = 64, 256, 16, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    reaction = ps.reaction_operand(params) if runtime else None
    kernel_params = params.structure_only() if runtime else params

    x = jnp.asarray(ps.pack_state(u0, v0, tr, halo, dtype=np.float32))

    def fn_win(x):
        return ps.packed_run_blocks(
            x, jnp.int32(2), reaction, steps=8, tr=tr, r=r, c=c,
            params=kernel_params, halo=halo, dt_is_one=runtime,
        )

    exp = jax.export.export(jax.jit(fn_win), platforms=["tpu"])(x)
    assert "tpu_custom_call" in exp.mlir_module()

    xr = jnp.asarray(
        ps.pack_state(u0, v0, tr=8, halo=0, cquant=128, dtype=np.float32)
    )

    def fn_res(x):
        return ps.packed_resident_multistep_impl(
            x, jnp.int32(32), reaction, r=r, c=c,
            params=kernel_params, dt_is_one=runtime, unroll=4,
        )

    exp = jax.export.export(jax.jit(fn_res), platforms=["tpu"])(xr)
    assert "tpu_custom_call" in exp.mlir_module()

    xp = jnp.asarray(mk.mega_pack_state(u0, v0, tr))

    def fn_mega(x):
        return mk.packed_megastep_impl(
            x, jnp.int32(3), reaction, steps=8, tr=tr, r=r,
            params=kernel_params, dt_is_one=runtime,
        )

    exp = jax.export.export(jax.jit(fn_mega), platforms=["tpu"])(xp)
    assert "tpu_custom_call" in exp.mlir_module()


def test_sanitize_and_resident_unroll_lower_for_tpu():
    """The sanitize-on-load select and the unrolled resident fori body
    are new kernel graph shapes: gate their Mosaic lowering."""
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
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pad), jnp.asarray(v_pad)
    )
    assert "tpu_custom_call" in exp.mlir_module()

    u = jnp.zeros((64, 256), jnp.float32)
    v = jnp.ones_like(u)

    def fn_res(u, v):
        return ps.resident_multistep_impl(
            u, v, jnp.int32(37), ps.reaction_operand(params),
            r=60, c=250, params=params.structure_only(),
            boundary="zero", dt_is_one=True, unroll=8,
        )

    exp = jax.export.export(jax.jit(fn_res), platforms=["tpu"])(u, v)
    assert "tpu_custom_call" in exp.mlir_module()


@pytest.mark.parametrize("boundary", ["zero", "naive"])
def test_megakernel_column_tiled_lowers_for_tpu(boundary):
    """The column-tiled megakernel's new Mosaic surfaces — column-sliced
    (strided) HBM window DMAs at traced 128-lane offsets, the (W, Wc)
    column-joined domain mask, per-window traced gcol — must lower."""
    from grayscott_tpu.ops import megakernel as mk

    params = Parameters()
    r, c, tr, tc = 64, 640, 16, 256
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    u_pair, v_pair = mk.mega_pad_state(u0, v0, tr, tc=tc)

    def fn(u, v):
        return mk.megastep_impl(
            u, v, jnp.int32(3), ps.reaction_operand(params),
            steps=8, tr=tr, r=r, params=params.structure_only(),
            boundary=boundary, dt_is_one=True, tc=tc, c_dom=c,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pair), jnp.asarray(v_pair)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_megakernel_bf16_lowers_for_tpu():
    """bf16-storage megakernel: bf16 window DMA + in-kernel f32 upcast
    and per-block bf16 rounding must lower to Mosaic."""
    from grayscott_tpu.ops import megakernel as mk

    params = Parameters()
    r, c, tr = 64, 256, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    u_pair, v_pair = mk.mega_pad_state(u0, v0, tr, dtype=jnp.bfloat16)
    reaction = ps.reaction_operand(params)

    def fn(u_pair, v_pair):
        return mk.megastep_impl(
            u_pair, v_pair, jnp.int32(2), reaction, steps=8, tr=tr, r=r,
            params=params.structure_only(), boundary="zero",
            dt_is_one=True,
        )

    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
        jnp.asarray(u_pair), jnp.asarray(v_pair)
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_naive_fold_and_depth_lower_for_tpu():
    """Round-3 megakernel modes must pass the Mosaic cross-lowering
    gate: the folded naive stepper (fast_fold), the D-slot DMA ring,
    and the interior/edge cond specialization."""
    import numpy as np

    from grayscott_tpu.ops import megakernel as mk
    from grayscott_tpu.params import Parameters

    params = Parameters()
    r, c, tr = 64, 256, 16
    u0 = np.zeros((r, c), np.float32)
    v0 = np.ones((r, c), np.float32)
    reaction = ps.reaction_operand(params)
    kp = params.structure_only()
    up, vp = mk.mega_pad_state(u0, v0, tr)

    for kw in (dict(boundary="naive", fast_fold=True),
               dict(boundary="zero", depth=3),
               dict(boundary="naive", specialize=True)):
        def fn(u_pair, v_pair, kw=kw):
            return mk.megastep_impl(
                u_pair, v_pair, jnp.int32(2), reaction,
                steps=8, tr=tr, r=r, params=kp, dt_is_one=True, **kw,
            )

        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
            jnp.asarray(up), jnp.asarray(vp))
        assert "tpu_custom_call" in exp.mlir_module(), kw

    # windowed fast_fold too
    upw, vpw = ps.pad_state(u0, v0, tr)

    def fn_w(u_pad, v_pad):
        return ps.multistep_impl(
            u_pad, v_pad, -ps.HALO, r, 0, None, reaction,
            steps=8, tr=tr, params=kp, boundary="naive", fast_fold=True,
        )

    exp = jax.export.export(jax.jit(fn_w), platforms=["tpu"])(
        jnp.asarray(upw), jnp.asarray(vpw))
    assert "tpu_custom_call" in exp.mlir_module()
