"""`regular` backend: vectorized shift-form step, one jit call per step.

Analog of ``compute/regular`` (compute/regular/src/lib.rs:49-202): the
reference splits the domain into a fast center (corrected weights,
``fast_grid_iter``) and general edge slabs. On TPU that split is expressed
as whole-array shift algebra plus O(R+C) edge strips (see
grayscott_tpu/ops/stencil.py), all fused by XLA into one pass — including
the reference's documented edge anchoring quirk
(compute/regular/src/lib.rs:174-179) when ``boundary="naive"``.

Unlike `fused`, each step is a separate device dispatch (the reference's
``SimulateStep`` loop, compute/shared/src/cpu.rs:30-42).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil
from ..params import Parameters
from .base import Simulation


class RegularSimulation(Simulation):
    name = "regular"

    def __init__(self, params: Parameters, boundary: str = "naive", **kwargs):
        super().__init__(params, boundary)

        @jax.jit
        def _one_step(u, v):
            return stencil.step(u, v, params, boundary)

        self._one_step = _one_step

    def build_storage(self, u: np.ndarray, v: np.ndarray):
        return (jnp.asarray(u), jnp.asarray(v))

    def extract_uv(self, storage, shape) -> Tuple[jax.Array, jax.Array]:
        return storage

    def run_steps(self, storage, shape, steps: int):
        u, v = storage
        for _ in range(steps):
            u, v = self._one_step(u, v)
        return (u, v)
