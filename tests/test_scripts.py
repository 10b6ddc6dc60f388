"""CLI entry points end-to-end (subprocess), mirroring tests/test_scripts.py
of the reference."""

import os
import subprocess
import sys

import numpy as np
import pytest

ENV = dict(
    os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
)

YAML = """
params:
  a:
    prior: [0, 1]
    ref: 0.5
    proposal: 0.05
likelihood:
  gaussian_mixture:
    means: [[0.5]]
    covs: [[[0.01]]]
    input_params: [a]
sampler:
  mcmc:
    seed: 1
    n_chains: 8
    max_samples: 120
    output_chains: 1
output: {prefix}
"""


def _run(args, cwd=None):
    return subprocess.run(
        [sys.executable, "-m", "cobaya_tpu", *args],
        capture_output=True, text=True, env=ENV, cwd=cwd, timeout=300,
    )


def test_cli_run(tmp_path):
    prefix = str(tmp_path / "chains" / "c")
    infile = tmp_path / "in.yaml"
    infile.write_text(YAML.format(prefix=prefix))
    result = _run(["run", str(infile)])
    assert result.returncode == 0, result.stdout + result.stderr
    assert os.path.exists(prefix + ".1.txt")
    assert os.path.exists(prefix + ".updated.yaml")
    # resume via CLI
    result = _run(["run", str(infile), "--resume"])
    assert result.returncode == 0, result.stdout + result.stderr


def test_cli_bare_input_file(tmp_path):
    """`python -m cobaya_tpu input.yaml` implies `run` (ref __main__.py:44)."""
    prefix = str(tmp_path / "chains" / "b")
    infile = tmp_path / "bare.yaml"
    infile.write_text(YAML.format(prefix=prefix))
    result = _run([str(infile)])
    assert result.returncode == 0, result.stdout + result.stderr
    assert os.path.exists(prefix + ".1.txt")


def test_cli_run_test_flag(tmp_path):
    prefix = str(tmp_path / "chains" / "t")
    infile = tmp_path / "in.yaml"
    infile.write_text(YAML.format(prefix=prefix))
    result = _run(["run", str(infile), "--test"])
    assert result.returncode == 0, result.stdout + result.stderr
    assert "Test initialization successful" in (result.stdout
                                                + result.stderr)
    assert not os.path.exists(prefix + ".1.txt")


def test_cli_doc_and_bib():
    result = _run(["doc", "mcmc"])
    assert result.returncode == 0 and "proposal_scale" in result.stdout
    result = _run(["doc"])
    assert "gaussian_mixture" in result.stdout
    result = _run(["bib", "mcmc"])
    assert result.returncode == 0


def test_cli_unknown_command():
    # reference __main__.py:44: ANY unknown non-flag first token is treated
    # as a run input file (load_input reports the missing file); unknown
    # flags still error with the command list
    result = _run(["frobnicate"])
    assert result.returncode != 0
    assert "Input file not found" in result.stdout + result.stderr
    result = _run(["--frobnicate"])
    assert result.returncode == 1
    assert "Unknown option" in result.stdout
    # commands are case-insensitive (reference lowercases the command)
    result = _run(["DOC", "mcmc"])
    assert result.returncode == 0 and "proposal_scale" in result.stdout


def test_examples_initialize(tmp_path):
    """Every example input at least passes --test initialization."""
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(ENV, PYTHONPATH=repo)
    for path in sorted(glob.glob(os.path.join(repo, "examples", "*.yaml"))):
        if "benchmark" in path:
            continue  # illustrative shape only
        result = subprocess.run(
            [sys.executable, "-m", "cobaya_tpu", "run", path, "--test"],
            capture_output=True, text=True, env=env, timeout=300,
            cwd=str(tmp_path),  # relative output prefixes land here
        )
        text = result.stdout + result.stderr
        if result.returncode != 0 and (
                "not installed" in text or "NotInstalled" in text
                or "No module named" in text):
            continue  # cosmology example needing external codes/data
        assert result.returncode == 0, (path, text)
