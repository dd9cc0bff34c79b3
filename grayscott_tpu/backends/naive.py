"""`naive` backend: the readable jnp reference implementation.

Analog of ``compute/naive`` (compute/naive/src/lib.rs:43-82): plain scalar
storage, one jitted step per call from the host, exact reference-naive
boundary semantics via the gather formulation (sequential term accumulation
for bit-faithfulness to the reference fold). This backend is the in-repo
numerics oracle's twin that every optimized backend is tested against.
"""

from __future__ import annotations

from .base import StepwiseSimulation


class NaiveSimulation(StepwiseSimulation):
    name = "naive"
    exact = True
