"""Stored published-chi^2 regressions for the experiment-likelihood catalog.

Port of the reference's gated cosmology regression layer
(/root/reference/tests/test_cosmo_planck_2018.py, test_cosmo_bao.py,
test_cosmo_sn.py, test_cosmo_des_y1.py, test_cosmo_bicep_keck_2018.py):
each likelihood is evaluated on its *released* data at a published best-fit
point and must reproduce the stored chi^2.  All tests here need external
CAMB and the downloaded data releases, so they skip unless
``COBAYA_TPU_PACKAGES_PATH`` points at an installed packages directory
(exactly the reference's ``--skip-not-installed`` gating,
/root/reference/tests/conftest.py:54-81).

The data-light H0/Mb family runs ungated in test_cosmo_h0.py; the synthetic
closed-loop tests (test_traced_likelihoods.py, test_camspec.py) cover the
likelihood *math* in CI — these stored values additionally pin the *data
handling* (file formats, ell ranges, calibration conventions) to the
published analyses.
"""

import pytest

from common_cosmo import body_of_test, packages_path_or_skip, require_camb
from cosmo_refvalues import (
    CHI2_BAO,
    CHI2_BICEP_KECK_2018,
    CHI2_CAMSPEC_TT,
    CHI2_DES_Y1,
    CHI2_LOWL_EE,
    CHI2_LOWL_TT,
    CHI2_PLIKLITE_TT,
    CHI2_PLIKLITE_TTTEEE,
    CHI2_SN,
    DERIVED_LOWTEB_HIGHTTTEEE,
    DES_NUISANCE,
    PARAMS_BK18,
    PARAMS_LOWL_HIGHTT_LITE,
    PARAMS_LOWTE_HIGHTTTEEE_LITE,
    PARAMS_LOWTEB_HIGHTTTEEE,
    PARAMS_T_CAMSPEC,
)

THEORY_CAMB = {"camb": {"extra_args": {"halofit_version": "mead",
                                       "num_massive_neutrinos": 1,
                                       "nnu": 3.044}}}


def _gated():
    require_camb()
    return packages_path_or_skip()


def test_planck_2018_pliklite_TT():
    packages_path = _gated()
    like = next(k for k in CHI2_PLIKLITE_TT if k != "tolerance")
    body_of_test(PARAMS_LOWL_HIGHTT_LITE, {like: None}, THEORY_CAMB,
                 CHI2_PLIKLITE_TT, packages_path=packages_path)


def test_planck_2018_pliklite_TTTEEE():
    packages_path = _gated()
    like = next(k for k in CHI2_PLIKLITE_TTTEEE if k != "tolerance")
    body_of_test(PARAMS_LOWTE_HIGHTTTEEE_LITE, {like: None}, THEORY_CAMB,
                 CHI2_PLIKLITE_TTTEEE, packages_path=packages_path)


def test_planck_2018_lowl_TT():
    packages_path = _gated()
    body_of_test(PARAMS_LOWTE_HIGHTTTEEE_LITE,
                 {"planck_2018_lowl.TT": None}, THEORY_CAMB,
                 CHI2_LOWL_TT, packages_path=packages_path)


def test_planck_2018_lowl_EE():
    packages_path = _gated()
    body_of_test(PARAMS_LOWTE_HIGHTTTEEE_LITE,
                 {"planck_2018_lowl.EE": None}, THEORY_CAMB,
                 CHI2_LOWL_EE, packages_path=packages_path)


def test_planck_2018_camspec_TT():
    packages_path = _gated()
    body_of_test(PARAMS_T_CAMSPEC,
                 {"planck_2018_highl_CamSpec.TT": None}, THEORY_CAMB,
                 CHI2_CAMSPEC_TT, packages_path=packages_path)


@pytest.mark.parametrize("like", sorted(CHI2_BAO))
def test_bao_catalog(like):
    packages_path = _gated()
    chi2, tol = CHI2_BAO[like]
    body_of_test(PARAMS_LOWTEB_HIGHTTTEEE, {like: None}, THEORY_CAMB,
                 {like: chi2, "tolerance": tol},
                 best_fit_derived={"rdrag": DERIVED_LOWTEB_HIGHTTTEEE[
                     "rdrag"]},
                 packages_path=packages_path)


@pytest.mark.parametrize("like", sorted(CHI2_SN))
def test_sn_catalog(like):
    packages_path = _gated()
    chi2, tol = CHI2_SN[like]
    body_of_test(PARAMS_LOWTEB_HIGHTTTEEE, {like: None}, THEORY_CAMB,
                 {like: chi2, "tolerance": tol},
                 packages_path=packages_path)


@pytest.mark.parametrize("like", sorted(CHI2_DES_Y1))
def test_des_y1_catalog(like):
    packages_path = _gated()
    chi2, tol = CHI2_DES_Y1[like]
    best_fit = dict(PARAMS_LOWTEB_HIGHTTTEEE, **DES_NUISANCE)
    body_of_test(best_fit, {like: None}, THEORY_CAMB,
                 {like: chi2, "tolerance": tol},
                 packages_path=packages_path)


def test_bicep_keck_2018():
    packages_path = _gated()
    body_of_test(PARAMS_BK18, {"bicep_keck_2018": None}, THEORY_CAMB,
                 CHI2_BICEP_KECK_2018, packages_path=packages_path)


def test_derived_params_at_best_fit():
    """Derived parameters at the Planck best fit vs stored values
    (reference common_cosmo.py:83-104, tolerance 0.055 sigma)."""
    packages_path = _gated()
    body_of_test(PARAMS_LOWTEB_HIGHTTTEEE, {"one": None}, THEORY_CAMB,
                 {"one": 0.0, "tolerance": 0.01},
                 best_fit_derived=DERIVED_LOWTEB_HIGHTTTEEE,
                 packages_path=packages_path)
