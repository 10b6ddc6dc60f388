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
