"""Minimize sampler: MAP and maximum-likelihood recovery."""

import numpy as np
import pytest

from cobaya_tpu.run import run

mean = np.array([0.3, 0.6])
cov = np.array([[0.01, -0.002], [-0.002, 0.005]])


def _info(**mods):
    info = {
        "params": {
            "a": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
            "b": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [mean.tolist()], "covs": [cov.tolist()],
            "input_params": ["a", "b"],
        }},
        "sampler": {"minimize": {"seed": 1, "best_of": 4, **mods}},
    }
    return info


def test_minimize_maxlike():
    info = _info(ignore_prior=True)
    _, sampler = run(info)
    x = sampler.result["x"]
    assert np.allclose(x, mean, atol=2e-4), x
    # -loglike at max = -log(norm const)
    expected = -np.log((2 * np.pi) ** -1 * np.linalg.det(cov) ** -0.5)
    assert np.isclose(sampler.result["fun"], expected, atol=1e-3)


def test_minimize_map_with_prior():
    """A narrow extra prior shifts the MAP predictably."""
    info = _info(ignore_prior=False)
    info["prior"] = {"pull": "lambda a: -0.5 * ((a - 0.4) / 0.05)**2"}
    _, sampler = run(info)
    x = sampler.result["x"]
    # analytic MAP of product of gaussians along 'a' (cov not diagonal, but
    # b adjusts; use full 2D: max of N(mean,cov) * N_a(0.4, 0.05^2))
    prec = np.linalg.inv(cov)
    prec_new = prec + np.diag([1 / 0.05**2, 0])
    mean_new = np.linalg.solve(prec_new, prec @ mean + [0.4 / 0.05**2, 0])
    assert np.allclose(x, mean_new, atol=5e-4), (x, mean_new)


def test_minimize_scipy_fallback():
    info = _info(ignore_prior=True, method="scipy", best_of=2)
    _, sampler = run(info)
    assert np.allclose(sampler.result["x"], mean, atol=1e-3)


def test_minimize_output_files(tmp_path):
    prefix = str(tmp_path / "min" / "m")
    info = _info(ignore_prior=True)
    info["output"] = prefix
    run(info)
    import os

    assert os.path.exists(prefix + ".minimum.txt")
    assert os.path.exists(prefix + ".minimum")


def test_run_minimize_flag():
    """run(..., minimize=True) overrides the sampler block."""
    info = _info()
    info["sampler"] = {"mcmc": {"max_samples": 10}}
    _, sampler = run(info, minimize=True)
    assert hasattr(sampler, "minimum")


def test_minimize_after_chain_starts_from_map(tmp_path):
    """run --minimize on existing chains reuses their MAP as a start."""
    prefix = str(tmp_path / "m2" / "run")
    info = _info(ignore_prior=True)
    info["output"] = prefix
    info["sampler"] = {"mcmc": {"seed": 2, "n_chains": 32,
                                "max_samples": 2000,
                                "Rminus1_stop": 0.05,
                                "Rminus1_cl_stop": 1.0,
                                "output_chains": 2}}
    from cobaya_tpu.run import run as _run

    _run(info)
    info["sampler"] = {"minimize": {"seed": 1, "best_of": 2,
                                    "ignore_prior": True}}
    _, sampler = _run(info, minimize=True)
    assert np.allclose(sampler.result["x"], mean, atol=5e-4)
    import os

    assert os.path.exists(prefix + ".minimum.txt")
    # the sampler resume check must not complain about the sampler swap


def test_minimize_external_method_fallback():
    """Reference method names bobyqa/iminuit fall back to scipy when the
    external package is missing (and still find the minimum)."""
    import numpy as np

    from cobaya_tpu.run import run

    info = {
        "params": {"x": {"prior": [-2, 2], "ref": 0.3}},
        "likelihood": {"gauss": {
            "external": lambda x: -0.5 * (x - 0.7) ** 2 / 0.01,
            "input_params": ["x"],
        }},
        "sampler": {"minimize": {"method": "bobyqa", "best_of": 2,
                                 "seed": 4}},
    }
    _, sampler = run(info)
    x_min = sampler.products()["minimum"].data[0][2]
    assert np.isclose(x_min, 0.7, atol=1e-3)
