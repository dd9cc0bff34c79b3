"""Multi-chip spatial decomposition: shard_map + ppermute halo exchange.

This is the TPU replacement for the reference's shared-memory fork-join
parallelism (``compute/parallel/src/lib.rs:29-121``). The reference splits
the grid across rayon worker threads with halo-overlapped input views
(``SimulateCpu::split_grid``, compute/shared/src/cpu.rs:112-154) — because
memory is shared, halos are implicit overlapping reads. Across TPU chips
the halo must be explicit: each device owns a contiguous row slab and, once
per K-step block, exchanges its HALO boundary rows with both neighbors via
``lax.ppermute`` over ICI, writing them into the padding rows of the local
kernel buffer. Devices at the ends of the (non-wrapped) permutation receive
zeros — exactly the zero-border condition of the global domain.

K-deep halos amortize exchange latency over K fused steps (the tuning knob
anticipated in SURVEY.md section 5 "long-context analog"), and the whole
``n_blocks`` loop runs in ONE executable per device (no host round-trips).

Each shard's state layout is identical to the single-chip Pallas layout
(``(HALO + R_loc + HALO, C)`` with padding rows), so the same kernel runs
unchanged — only its ``origin`` scalar differs per shard, which also makes
the reference-naive edge semantics exact across shard boundaries.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import pallas_stencil as ps
from ..params import Parameters

AXIS = "rows"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (AXIS,))


def _exchange(x, r_loc: int):
    """Fill the HALO padding rows of a local (Hp, C) block from neighbors.

    ppermute semantics: a device with no inbound edge receives zeros, which
    implements the global zero border at the top and bottom shards.
    """
    h = ps.HALO
    n = jax.lax.axis_size(AXIS)
    down = [(i, i + 1) for i in range(n - 1)]  # my bottom rows -> next shard
    up = [(i + 1, i) for i in range(n - 1)]    # my top rows -> previous shard
    top_halo = jax.lax.ppermute(x[h + r_loc - h : h + r_loc], AXIS, down)
    bot_halo = jax.lax.ppermute(x[h : h + h], AXIS, up)
    return jax.lax.concatenate([top_halo, x[h : h + r_loc], bot_halo], 0)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "r_total", "steps", "tr", "params", "boundary",
                     "interpret"),
    donate_argnames=("u", "v", "us", "vs"),
)
def sharded_run_blocks(
    u, v, us, vs, n_blocks, *,
    mesh: Mesh, r_total: int, steps: int, tr: int,
    params: Parameters, boundary: str, interpret: bool = False,
):
    """Run ``n_blocks`` K-step kernel blocks on row-sharded state.

    State arrays have shape (n_shards, HALO + R_loc + HALO, C), sharded on
    axis 0. Between blocks, HALO rows are exchanged over ICI.
    """
    n_shards = mesh.devices.size
    hp = u.shape[1]
    r_loc = hp - 2 * ps.HALO

    def local(u, v, us, vs, n_blocks):
        u, v, us, vs = u[0], v[0], us[0], vs[0]
        row_start = jax.lax.axis_index(AXIS).astype(jnp.int32) * r_loc
        origin = row_start - ps.HALO

        def body(_, carry):
            a, b, sa, sb = carry
            a = _exchange(a, r_loc)
            b = _exchange(b, r_loc)
            na, nb = ps.multistep_impl(
                a, b, sa, sb, origin, r_total,
                steps=steps, tr=tr, params=params, boundary=boundary,
                interpret=interpret,
            )
            return (na, nb, a, b)

        out = jax.lax.fori_loop(0, n_blocks, body, (u, v, us, vs))
        return tuple(x[None] for x in out)

    spec = P(AXIS, None, None)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P()),
        out_specs=(spec, spec, spec, spec),
        # pallas_call inside shard_map cannot declare varying-mesh-axes
        # metadata on its outputs yet; skip the vma check.
        check_vma=False,
    )(u, v, us, vs, n_blocks)


def shard_state(
    u: np.ndarray, v: np.ndarray, mesh: Mesh, tr: int
) -> Tuple[jax.Array, jax.Array, int]:
    """Pack (R, C) host state into per-shard padded blocks on the mesh."""
    r, c = u.shape
    n = mesh.devices.size
    if r % n != 0:
        raise ValueError(f"rows {r} not divisible by {n} shards")
    r_loc = r // n
    if r_loc % tr != 0:
        raise ValueError(f"local rows {r_loc} not divisible by tile {tr}")
    h = ps.HALO
    out = []
    for x in (u, v):
        blocks = np.zeros((n, h + r_loc + h, c), dtype=np.float32)
        blocks[:, h : h + r_loc, :] = x.reshape(n, r_loc, c)
        out.append(
            jax.device_put(blocks, NamedSharding(mesh, P(AXIS, None, None)))
        )
    return out[0], out[1], r_loc


def unshard_result(blocks, shape) -> jax.Array:
    """Interior rows of all shards, reassembled to (R, C)."""
    r, c = shape
    h = ps.HALO
    n = blocks.shape[0]
    return blocks[:, h : h + r // n, :].reshape(r, c)
