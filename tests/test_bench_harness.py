"""Bench harness behavior: incremental emission, budget math, row order.

The round-4 driver artifact was lost because the old harness printed its
JSON only after ALL rows finished; these tests pin the properties that make
the artifact land regardless of where a wall-clock kill hits.
"""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    # import bench.py as a module with the partial-rows file redirected
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_row_order_is_fastest_first(bench):
    assert bench.ROW_ORDER == ["hmc", "mcmc", "cosmo", "cosmo-hmc"]
    # every orderable kind has a setup estimate
    assert set(bench.SETUP_EST_S) == set(bench.ROW_ORDER)


def test_setup_estimate_env_override(bench, monkeypatch):
    monkeypatch.setenv("BENCH_SETUP_EST_COSMO_HMC", "123.5")
    assert bench._setup_estimate("cosmo-hmc") == 123.5
    monkeypatch.delenv("BENCH_SETUP_EST_COSMO_HMC")
    assert bench._setup_estimate("cosmo") == bench.SETUP_EST_S["cosmo"]


def test_emit_writes_partial_rows_and_prints_cumulative(bench, tmp_path,
                                                        monkeypatch, capsys):
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path), raising=True)
    rows = [{"metric": "m1", "value": 10.0, "unit": "u",
             "vs_baseline": 2.0, "sampler": "hmc"}]
    bench._emit(rows, [])
    out1 = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out1)["value"] == 10.0
    rows.append({"metric": "m2", "value": 50.0, "unit": "u",
                 "vs_baseline": 7.0, "sampler": "mcmc"})
    skipped = [{"sampler": "cosmo", "reason": "insufficient budget"}]
    bench._emit(rows, skipped, final=True)
    out2 = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out2)
    # headline = best row; all rows + skip reasons ride along
    assert parsed["value"] == 50.0 and parsed["metric"] == "m2"
    assert len(parsed["rows"]) == 2
    assert parsed["skipped"] == skipped
    saved = json.load(open(tmp_path / "bench_rows_partial.json"))
    assert saved["final"] and len(saved["rows"]) == 2


def test_emit_with_no_rows_prints_nothing(bench, tmp_path, monkeypatch,
                                          capsys):
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path), raising=True)
    bench._emit([], [{"sampler": "hmc", "reason": "failed"}])
    assert capsys.readouterr().out == ""  # no misleading empty headline


def test_budget_skips_rows_that_cannot_fit(tmp_path):
    """End-to-end: a tiny budget must skip every row with a logged reason
    and exit nonzero (no rows), still writing the partial file."""
    env = dict(os.environ, BENCH_BUDGET_S="1",
               PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120)
    assert proc.returncode != 0
    assert "SKIP" in proc.stderr
    saved = json.load(open(os.path.join(REPO, "bench_rows_partial.json")))
    assert saved["final"] and not saved["rows"]
    # default set excludes cosmo-hmc (backend-fault risk, docs/performance.md)
    assert [s["sampler"] for s in saved["skipped"]] == ["hmc", "mcmc",
                                                        "cosmo"]
    assert all("insufficient budget" in s["reason"] for s in saved["skipped"])
    os.remove(os.path.join(REPO, "bench_rows_partial.json"))
