"""Nested sampler: evidence accuracy and posterior recovery.

Mirrors the reference evidence test (tests/common_sampler.py:182-189):
logZ within 2 sigma of the analytic value for a Gaussian in a box.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run

from common import check_gaussian, random_gaussian_info


def test_nested_evidence_and_posterior():
    dim = 2
    info = random_gaussian_info(dim=dim, random_state=31)
    info["sampler"] = {"nested": {"seed": 11, "nlive": 200,
                                  "precision_criterion": 1e-3}}
    _, sampler = run(info)
    # analytic evidence: gaussian well inside the box -> Z = 1/V_prior
    ranges = [[-1, 1]] * dim
    logZ_true = -np.sum(np.log([r[1] - r[0] for r in ranges]))
    assert abs(sampler.logZ - logZ_true) < 2.5 * sampler.logZstd + 0.05, (
        sampler.logZ, logZ_true, sampler.logZstd,
    )
    kl = check_gaussian(info, sampler.products()["sample"], tol=0.2)


def test_polychord_alias():
    info = random_gaussian_info(dim=2, random_state=37)
    info["sampler"] = {"polychord": {
        "seed": 13, "nlive": 150, "precision_criterion": 1e-2,
        # PolyChord-specific options accepted & ignored
        "do_clustering": True, "nprior": "10d", "feedback": 0,
    }}
    _, sampler = run(info)
    logZ_true = -np.log(4.0)
    assert abs(sampler.logZ - logZ_true) < 3 * sampler.logZstd + 0.1
    products = sampler.products()
    assert set(products) >= {"sample", "logZ", "logZstd", "clusters"}


def test_nested_external_prior_chain_columns(tmp_path):
    """External priors appear in their own minuslogprior__ column and the
    chain satisfies minuslogpost == minuslogprior + chi2/2."""
    info = random_gaussian_info(dim=2, random_state=41)
    info["prior"] = {"tilt": "lambda a__0: -0.5 * (a__0 / 0.5) ** 2"}
    info["sampler"] = {"nested": {"seed": 17, "nlive": 100,
                                  "precision_criterion": 1e-2}}
    info["output"] = str(tmp_path / "np")
    _, sampler = run(info)
    s = sampler.products()["sample"]
    assert "minuslogprior__tilt" in s.columns
    a0 = np.asarray(s["a__0"], float)
    np.testing.assert_allclose(
        np.asarray(s["minuslogprior__tilt"], float),
        0.5 * (a0 / 0.5) ** 2, rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s["minuslogpost"], float),
        np.asarray(s["minuslogprior"], float)
        + 0.5 * np.asarray(s["chi2"], float),
        rtol=1e-5, atol=1e-4,
    )
    # reloading the written chain passes the consistency check (no warning
    # would assert here, but loading must reproduce the same stats)
    from cobaya_tpu.io.output import load_samples

    re = load_samples(str(tmp_path / "np"))[0]
    np.testing.assert_allclose(re.mean(), s.mean(), rtol=1e-5, atol=1e-6)
