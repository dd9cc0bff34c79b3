"""`naive` backend: the readable jnp reference implementation.

Analog of ``compute/naive`` (compute/naive/src/lib.rs:43-82): plain scalar
storage, one jitted step per call from the host, exact reference-naive
boundary semantics via the gather formulation (sequential term accumulation
for bit-faithfulness to the reference fold). This backend is the in-repo
numerics oracle that every optimized backend is tested against.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import stencil
from ..params import Parameters
from .base import Simulation


class NaiveSimulation(Simulation):
    name = "naive"

    def __init__(self, params: Parameters, boundary: str = "naive", **kwargs):
        super().__init__(params, boundary)

        @jax.jit
        def _one_step(u, v):
            return stencil.step(u, v, params, boundary, exact=(boundary == "naive"))

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
