"""Multi-device scaling regression: the sharded epoch must stay efficient.

Complements tests/test_multichip.py (correctness of sharded programs) with
a *performance-shape* assertion: at fixed TOTAL walkers, partitioning the
epoch over all 8 virtual devices must not blow up the wall clock.  On this
single-CPU container every virtual device timeshares one core, so the
meaningful bound is generous — it catches structural regressions (a
collective inserted per step, records gathered per step, resharding inside
the scan), not real-chip efficiency, which scripts/measure_scaling.py
quantifies and docs/distributed.md records.
"""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "measure_scaling",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "measure_scaling.py"),
)
measure_scaling = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(measure_scaling)


def test_fixed_total_sharding_overhead_band():
    """8-way sharding at fixed total walkers stays within 2.5x of the
    1-device wall on one timeshared core (measured 1.14x at this size;
    real chips see ~1.0x because per-device work truly parallelizes).

    The epoch must be big enough that per-device dispatch overhead does
    not dominate (at dim 16 / 2048 walkers the 1-device epoch is ~0.09 s
    and the ratio balloons to ~4.6x from fixed costs alone)."""
    kw = dict(kind="mcmc", dim=32, epochs=3, steps_per_epoch=256)
    one = measure_scaling.run_case(devices=1, n_chains=8192, **kw)
    many = measure_scaling.run_case(devices=8, n_chains=8192, **kw)
    ratio = many["epoch_wall_s"] / one["epoch_wall_s"]
    assert ratio < 2.5, (one, many)


def test_weak_scaling_epoch_executes_at_every_width():
    """Weak-scaling ladder: the sharded epoch runs at 1/2/4/8 devices with
    per-device walker count fixed (the production multi-chip regime)."""
    for d in (1, 2, 4, 8):
        r = measure_scaling.run_case(
            kind="mcmc", devices=d, n_chains=256 * d, dim=8, epochs=1,
            steps_per_epoch=64)
        assert r["devices"] == d and r["epoch_wall_s"] > 0
