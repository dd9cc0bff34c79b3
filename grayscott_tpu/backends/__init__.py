"""Backend registry and auto-selection.

Analog of ``compute/selector`` (compute/selector/src/lib.rs:4-59): the
reference picks the best enabled backend at compile time via a cfg_if
priority chain; here the choice is at runtime via :func:`best_backend`
(overridable with the ``GRAYSCOTT_BACKEND`` env var or ``--backend``).

Priority (best first), gated on platform:
  TPU : pallas > fused > regular > naive
  CPU : fused > regular > naive   (pallas runs in interpreter mode on CPU —
        available explicitly, never auto-selected)
The multi-chip `sharded` backend is auto-selected when more than one device
is visible.
"""

from __future__ import annotations

import os
from typing import Dict, Type

from .base import Simulation
from .naive import NaiveSimulation
from .regular import RegularSimulation
from .fused import FusedSimulation
from .conv import ConvSimulation

BACKENDS: Dict[str, Type[Simulation]] = {}


def register(cls: Type[Simulation]) -> None:
    BACKENDS[cls.name] = cls


register(NaiveSimulation)
register(RegularSimulation)
register(FusedSimulation)
register(ConvSimulation)

# Pallas / sharded backends import jax.experimental; register lazily but
# eagerly enough to appear in --help.
try:  # pragma: no cover - import guard
    from .pallas import PallasSimulation

    register(PallasSimulation)
except ImportError:  # pragma: no cover
    PallasSimulation = None

try:  # pragma: no cover - import guard
    from .sharded import ShardedSimulation

    register(ShardedSimulation)
except ImportError:  # pragma: no cover
    ShardedSimulation = None


def get_backend(name: str) -> Type[Simulation]:
    if name not in BACKENDS:
        raise ValueError(f"unknown backend {name!r}; available: {sorted(BACKENDS)}")
    return BACKENDS[name]


def best_backend_name() -> str:
    """Best available backend for the current platform (selector analog)."""
    forced = os.environ.get("GRAYSCOTT_BACKEND")
    if forced:
        return forced
    import jax

    devices = jax.devices()
    platform = devices[0].platform
    if len(devices) > 1 and "sharded" in BACKENDS:
        return "sharded"
    if platform == "tpu" and "pallas" in BACKENDS:
        return "pallas"
    return "fused"


def best_backend() -> Type[Simulation]:
    return get_backend(best_backend_name())
