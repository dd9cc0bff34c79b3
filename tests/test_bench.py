import json

from grayscott_tpu.bench.harness import (
    Result,
    default_domains,
    default_step_counts,
    run_one,
    sweep,
)
from grayscott_tpu.backends import get_backend
from grayscott_tpu.params import Parameters


def test_default_sweep_grid_matches_reference():
    # domains [2^s, 2^{s+1}] s=3..11 and steps 2^0..2^8
    # (compute/shared/src/benchmark.rs:50-56)
    doms = default_domains()
    assert doms[0] == (8, 16) and doms[-1] == (2048, 4096)
    steps = default_step_counts()
    assert steps[0] == 1 and steps[-1] == 256 and len(steps) == 9


def test_run_one_workloads(tmp_path):
    sim = get_backend("fused")(Parameters())
    for workload in ("compute", "full_sync", "full_future"):
        res = run_one(sim, (16, 32), 4, workload, reps=1)
        assert res.gcells_per_sec > 0
        assert res.shape == (16, 32)


def test_sweep_writes_json(tmp_path):
    out = tmp_path / "r.json"
    results = sweep(
        ["fused"], domains=[(8, 16)], step_counts=[2],
        workloads=("compute",), reps=1, out_path=str(out), verbose=False,
    )
    assert len(results) == 1
    data = json.loads(out.read_text())
    assert data[0]["backend"] == "fused"
