"""Backend abstraction: the `Simulate*` trait analog.

Re-design of the reference's trait stack (``compute/shared/src/lib.rs:19-58``):

- ``SimulateBase::make_species``  -> :meth:`Simulation.make_species`
- ``SimulateCreate::new``         -> ``Simulation(params, **args)``
- ``Simulate::perform_steps``     -> :meth:`Simulation.perform_steps`
- ``SimulateGpu::prepare_steps``  -> :meth:`Simulation.prepare_steps`
  (JAX dispatch is asynchronous by construction, so the "one submission,
  no host round-trip" property of the reference's GPU path
  (compute/gpu/naive/src/lib.rs:99-128) is the default here; synchronization
  happens only when a result is fetched.)
- ``SimulateBase::CliArgs``       -> :meth:`Simulation.add_cli_args` /
  ``from_args`` (clap flatten analog; every arg has a default and an env-var
  fallback, mirroring ``#[arg(long, env)]`` in compute/block/src/args.rs:65).
"""

from __future__ import annotations

import abc
import argparse
import os
from typing import Any, Dict, Tuple

import numpy as np

from ..params import Parameters
from ..species import Species, initial_uv


def env_default(name: str, fallback, cast=None, choices=None):
    """CLI default with GRAYSCOTT_* env-var fallback (clap env analog).

    ``choices``: argparse validates only values typed on the command
    line, NOT string defaults — so an env value like ``true`` for an
    on/off flag would flow through silently and compare unequal to
    "on" downstream (the feature quietly off while the user believes
    it's on). Pass the flag's choices here to fail loudly instead."""
    raw = os.environ.get(name)
    if raw is None:
        return fallback
    if choices is not None and raw not in choices:
        raise SystemExit(
            f"{name}={raw!r}: expected one of {list(choices)}"
        )
    return (cast or type(fallback))(raw)


class Simulation(abc.ABC):
    """One rung of the backend ladder (compute/{naive,...} crate analog)."""

    #: registry name, e.g. "naive"
    name: str = "?"

    def __init__(self, params: Parameters, boundary: str = "naive", **kwargs):
        if boundary not in ("naive", "zero"):
            raise ValueError(f"unknown boundary semantics {boundary!r}")
        self.params = params
        self.boundary = boundary

    # -- species ---------------------------------------------------------------

    def make_species(self, shape: Tuple[int, int]) -> Species:
        """Allocate + initialize species state in this backend's layout
        (SimulateBase::make_species analog, compute/shared/src/lib.rs:31-34)."""
        u, v = initial_uv(shape)
        return Species(shape, self.build_storage(u, v), self)

    @abc.abstractmethod
    def build_storage(self, u: np.ndarray, v: np.ndarray) -> Any:
        """Pack host (R, C) concentrations into backend storage."""

    @abc.abstractmethod
    def extract_uv(self, storage: Any, shape) -> Tuple[Any, Any]:
        """Unpack storage into (u, v) device arrays of ``shape``."""

    def extract_result(self, storage: Any, shape):
        """V's input concentration (the simulation result)."""
        return self.extract_uv(storage, shape)[1]

    # -- stepping ----------------------------------------------------------------

    @abc.abstractmethod
    def run_steps(self, storage: Any, shape, steps: int) -> Any:
        """Advance the storage by ``steps`` steps (asynchronously dispatched)."""

    def perform_steps(self, species: Species, steps: int) -> None:
        """Synchronous stepping (Simulate::perform_steps analog)."""
        self.prepare_steps(species, steps)
        self.block_until_ready(species)

    def prepare_steps(self, species: Species, steps: int) -> None:
        """Asynchronous stepping (SimulateGpu::prepare_steps analog): returns
        as soon as the work is enqueued on the device."""
        species.storage = self.run_steps(species.storage, species.shape, steps)
        species.steps_performed += steps

    def block_until_ready(self, species: Species) -> None:
        import jax

        jax.block_until_ready(species.storage)

    # -- CLI (CliArgs analog) -----------------------------------------------------

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser) -> None:
        """Contribute backend-specific CLI arguments (clap flatten analog)."""

    @classmethod
    def args_from_namespace(cls, ns: argparse.Namespace) -> Dict[str, Any]:
        """Extract this backend's kwargs from parsed CLI args."""
        return {}


class StepwiseSimulation(Simulation):
    """Shared base for the one-jitted-step-per-host-call rungs (the
    reference's blanket ``SimulateStep`` loop, compute/shared/src/cpu.rs:
    30-42): plain (u, v) device storage, stepping via ops.stencil.step.
    Subclasses choose the formulation with :attr:`exact`."""

    #: use the bit-faithful gather formulation for the naive boundary
    #: (the oracle's twin) instead of the fused shift algebra
    exact = False

    def __init__(self, params: Parameters, boundary: str = "naive",
                 **kwargs):
        super().__init__(params, boundary)
        import jax

        from ..ops import stencil

        exact = self.exact and boundary == "naive"

        @jax.jit
        def _one_step(u, v):
            return stencil.step(u, v, params, boundary, exact=exact)

        self._one_step = _one_step

    def build_storage(self, u: np.ndarray, v: np.ndarray):
        import jax.numpy as jnp

        return (jnp.asarray(u), jnp.asarray(v))

    def extract_uv(self, storage: Any, shape) -> Tuple[Any, Any]:
        return storage

    def run_steps(self, storage: Any, shape, steps: int):
        u, v = storage
        for _ in range(steps):
            u, v = self._one_step(u, v)
        return (u, v)
