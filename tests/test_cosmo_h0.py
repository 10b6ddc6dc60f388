"""Stored-value tests for the H0/Mb point likelihoods (data-light: run in CI).

Port of /root/reference/tests/test_cosmo_H0.py: evaluate each likelihood at
a fiducial value through the full run()+evaluate pipeline and check the
chi^2 column equals the analytic Gaussian, using each class's pinned
published (mean, std).
"""

import numpy as np
import pytest

from cobaya_tpu.run import run
from cobaya_tpu.utils import conventions as cv

from cosmo_refvalues import (
    FIDUCIAL_H0,
    FIDUCIAL_H0_STD,
    FIDUCIAL_MB,
    FIDUCIAL_MB_STD,
    H0_LIKELIHOODS,
)


def _chi2_from_run(info, like_name):
    updated_info, sampler = run(info)
    sample = sampler.products()["sample"]
    chi2 = np.asarray(sample[cv.chi2_name(like_name)])[0]
    mean = updated_info["likelihood"][like_name]["H0_mean"]
    std = updated_info["likelihood"][like_name]["H0_std"]
    return chi2, mean, std


@pytest.mark.parametrize("like_name", H0_LIKELIHOODS)
def test_h0_catalog_chi2(like_name):
    info = {
        "likelihood": {like_name: None},
        "params": {"H0": FIDUCIAL_H0},
        "sampler": {"evaluate": None},
    }
    chi2, mean, std = _chi2_from_run(info, like_name)
    expected = (FIDUCIAL_H0 - mean) ** 2 / std ** 2
    assert np.allclose(chi2, expected), (like_name, chi2, expected)
    # the pinned values must be the published ones (reference yaml files)
    if like_name == "H0.riess2018a":
        assert (mean, std) == (73.45, 1.66)
    if like_name == "H0.riess201903":
        assert (mean, std) == (74.03, 1.42)


def test_mb_riess2020Mb_chi2():
    """Mb-expressed Riess 2020 (reference test_cosmo_H0.py:50-57)."""
    info = {
        "likelihood": {"H0.riess2020Mb": None},
        "params": {"Mb": FIDUCIAL_MB},
        "sampler": {"evaluate": None},
    }
    updated_info, sampler = run(info)
    sample = sampler.products()["sample"]
    chi2 = np.asarray(sample[cv.chi2_name("H0.riess2020Mb")])[0]
    mean = updated_info["likelihood"]["H0.riess2020Mb"]["Mb_mean"]
    std = updated_info["likelihood"]["H0.riess2020Mb"]["Mb_std"]
    assert (mean, std) == (-19.263, 0.049)
    expected = (FIDUCIAL_MB - mean) ** 2 / std ** 2
    assert np.allclose(chi2, expected)
