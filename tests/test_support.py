"""The kernel-engine support matrix contract (VERDICT r2 weak #7):
every REJECTED combination raises the one uniform error type
(UnsupportedConfigError, a ValueError), and every supported/auto cell
constructs and runs. One parametrized sweep — the single enforcement
surface for grayscott_tpu/support.py's table.
"""

from __future__ import annotations

import numpy as np
import pytest

from grayscott_tpu.backends.pallas import PallasSimulation
from grayscott_tpu.backends.sharded import ShardedSimulation
from grayscott_tpu.errors import UnsupportedConfigError
from grayscott_tpu.params import Parameters
from grayscott_tpu import support


@pytest.fixture
def params():
    return Parameters()


# (kwargs for PallasSimulation, shape or None for ctor-time rejection)
REJECTED_PALLAS = [
    # pack rules
    (dict(pack="on", boundary="naive"), (32, 32)),
    (dict(pack="on", dtype="bfloat16", boundary="zero"), (32, 32)),
    (dict(pack="on", fold=2, boundary="zero"), (32, 32)),
    (dict(pack="on", block_cols=128, boundary="zero"), (512, 512)),
    # resident rules
    (dict(resident="on", dtype="bfloat16"), None),
    (dict(resident="on", fold=2), None),
    (dict(resident="on", engine="mega"), None),
    # fold rules
    (dict(fold=2, dtype="bfloat16"), (64, 32)),
    (dict(fold=2, block_cols=128), (64, 512)),
    # naive_fix=store rules
    (dict(naive_fix="store", boundary="zero"), None),
    (dict(naive_fix="store", boundary="naive", mega_specialize=True),
     None),
    # engine=mega pins
    (dict(engine="mega", steps_per_call=4), None),
]

REJECTED_SHARDED = [
    (dict(engine="mega", overlap=True), None),
    (dict(engine="mega", steps_per_call=4), None),
    (dict(block_cols=128), None),  # windowed sharded derives its own
]

SUPPORTED_PALLAS = [
    dict(),                                       # windowed/auto
    dict(engine="mega", boundary="zero"),
    dict(engine="mega", boundary="naive"),
    dict(engine="mega", dtype="bfloat16", boundary="zero"),
    dict(engine="mega", mega_specialize=True, boundary="naive"),
    dict(engine="mega", mega_depth=3, boundary="zero"),
    dict(pack="on", boundary="zero"),
    dict(fold=2, boundary="zero"),
    dict(naive_fix="store", boundary="naive"),
    dict(resident="on"),
]


@pytest.mark.parametrize("kwargs,shape", REJECTED_PALLAS)
def test_rejected_pallas_combinations(params, kwargs, shape):
    kwargs = dict(kwargs)
    boundary = kwargs.pop("boundary", "naive")
    if shape is None:
        with pytest.raises(UnsupportedConfigError):
            PallasSimulation(params, boundary=boundary, interpret=True,
                             **kwargs)
        return
    sim = PallasSimulation(params, boundary=boundary, interpret=True,
                           **kwargs)
    rng = np.random.RandomState(0)
    u = rng.rand(*shape).astype(np.float32)
    v = rng.rand(*shape).astype(np.float32)
    with pytest.raises(UnsupportedConfigError):
        sim.build_storage(u, v)


@pytest.mark.parametrize("kwargs,shape", REJECTED_SHARDED)
def test_rejected_sharded_combinations(params, kwargs, shape):
    with pytest.raises(UnsupportedConfigError):
        ShardedSimulation(params, interpret=True, **kwargs)


@pytest.mark.parametrize("kwargs", SUPPORTED_PALLAS)
def test_supported_pallas_combinations(params, kwargs):
    kwargs = dict(kwargs)
    boundary = kwargs.pop("boundary", "naive")
    sim = PallasSimulation(params, boundary=boundary, interpret=True,
                           block_rows=kwargs.pop("block_rows", 8),
                           **kwargs)
    species = sim.make_species((32, 32))
    sim.perform_steps(species, 2)
    v = species.result_host()
    assert np.isfinite(v).all()


def test_uniform_error_type_is_valueerror_subclass():
    assert issubclass(UnsupportedConfigError, ValueError)


def test_matrix_renders_both_formats():
    md = support.render("markdown")
    txt = support.render("text")
    assert md.startswith("| configuration |")
    assert "UnsupportedConfigError" in txt
    assert len(support.MATRIX) >= 10


def test_matrix_in_readme_and_help():
    """The README table block and the CLI --help epilog both come from
    support.py — drift between surfaces fails here."""
    import argparse

    from grayscott_tpu.cli import shared

    readme = open("README.md").read()
    begin = readme.index("<!-- support-matrix:begin")
    end = readme.index("<!-- support-matrix:end -->")
    block = readme[begin:end]
    for combo, status, _ in support.MATRIX:
        assert combo in block, f"README matrix missing: {combo}"
        assert f"| {combo} | {status} |" in block

    parser = argparse.ArgumentParser()
    shared.add_shared_args(parser)
    assert parser.epilog and "support matrix" in parser.epilog
    for combo, _, _ in support.MATRIX:
        assert combo in parser.epilog
