"""Cosmology-stack integration: BoltzmannBase contract with a mock backend.

Exercises must_provide vocabulary, z-pools, provider routing and the
requirement DAG with an analytic flat-LCDM background theory (no external
CAMB/CLASS needed), plus the H0 / BAO / SN likelihood families E2E.
"""

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.cosmo.boltzmannbase import (
    BoltzmannBase,
    PowerSpectrumInterpolator,
)
from cobaya_tpu.utils.conventions import Const


class MockLCDM(BoltzmannBase):
    """Analytic flat-LCDM background (matter + Lambda only)."""

    params = {
        "H0": None, "omegam": None, "rdrag": None,
    }

    def get_can_support_params(self):
        return ["H0val", "Om"]

    def calculate(self, state, want_derived=True, **params_values):
        H0 = params_values["H0val"]
        Om = params_values["Om"]
        mp = self._must_provide

        def E(z):
            return np.sqrt(Om * (1 + z) ** 3 + (1 - Om))

        def comoving(z):
            zz = np.linspace(0, z, 256)
            return Const.c_km_s / H0 * np.trapezoid(1 / E(zz), zz)

        if "Hubble" in mp:
            z = mp["Hubble"]["z"]
            state["Hubble"] = H0 * E(np.asarray(z))
        if "angular_diameter_distance" in mp:
            z = np.asarray(mp["angular_diameter_distance"]["z"])
            state["angular_diameter_distance"] = np.array(
                [comoving(zi) / (1 + zi) for zi in z]
            )
        if "comoving_radial_distance" in mp:
            z = np.asarray(mp["comoving_radial_distance"]["z"])
            state["comoving_radial_distance"] = np.array(
                [comoving(zi) for zi in z]
            )
        if "fsigma8" in mp:
            z = np.asarray(mp["fsigma8"]["z"])
            state["fsigma8"] = 0.45 * E(z) ** -0.5  # toy model
        if want_derived:
            state["derived"] = {
                "H0": H0, "omegam": Om, "rdrag": 147.0 * (0.70 / (H0 / 100)),
            }
        return True


BASE_PARAMS = {
    "H0val": {"prior": [60, 80], "ref": 70, "proposal": 1},
    "Om": {"prior": [0.1, 0.5], "ref": 0.3, "proposal": 0.01},
}


def test_h0_likelihood_family():
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"H0.riess2020": None},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    lp = model.logposterior([73.2, 0.3])
    assert np.isclose(lp.loglikes[0], 0.0, atol=1e-9)
    lp2 = model.logposterior([73.2 + 1.3, 0.3])
    assert np.isclose(lp2.loglikes[0], -0.5, atol=1e-6)
    # chi2__H0 aggregated type exists
    assert "chi2__H0" in model.derived_names


def test_bao_likelihood_with_mock():
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao_test": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "measurements": [
                (0.5, 13.0, "DV_over_rs", 0.2),
                (0.5, 81.0, "Hz_rs", 3.0),
                (0.6, 0.44, "f_sigma8", 0.02),
            ],
        }},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    lp = model.logposterior([70.0, 0.3])
    assert np.isfinite(lp.loglikes[0])
    # verify DV against direct computation
    like = list(model.likelihood.values())[0]
    dv = like.theory_value("DV_over_rs", 0.5)
    DA = float(model.provider.get_angular_diameter_distance(0.5)[0])
    Hz = float(model.provider.get_Hubble(0.5)[0])
    rd = float(model.provider.get_param("rdrag"))
    DM = DA * 1.5
    DV = (DM**2 * 0.5 * Const.c_km_s / Hz) ** (1 / 3)
    assert np.isclose(dv, DV / rd, rtol=1e-10)


def test_sn_likelihood_with_mock():
    # synthetic SN data from the fiducial model itself -> best chi2 at truth
    zs = np.linspace(0.05, 1.0, 12)
    info_data = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"one": None},
        "params": dict(BASE_PARAMS),
    }
    model0 = get_model(info_data)
    model0.add_requirements({
        "angular_diameter_distance": {"z": zs},
    })
    model0.logposterior([70.0, 0.3])
    DA = np.asarray(model0.provider.get_angular_diameter_distance(zs))
    mu = 5 * np.log10(DA * (1 + zs) ** 2) + 25
    data = np.column_stack([zs, mu - 19.3, np.full(len(zs), 0.1)])

    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"sn_test": {
            "class": "cobaya_tpu.likelihoods.base_classes.SN",
            "data": data.tolist(),
        }},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    # marginalized over M: best fit at the generating cosmology
    lp_true = model.logposterior([70.0, 0.3]).loglikes[0]
    lp_off = model.logposterior([65.0, 0.45]).loglikes[0]
    assert lp_true > lp_off


def test_z_pool_merging_and_errors():
    t = MockLCDM({}, name="mock")
    t.initialize()
    t.must_provide(Hubble={"z": [0.1, 0.5]})
    t.must_provide(Hubble={"z": [0.5, 1.0]})
    assert np.allclose(t.requested()["Hubble"]["z"], [0.1, 0.5, 1.0])
    from cobaya_tpu.utils.log import LoggedError

    with pytest.raises(LoggedError):
        t._get_z_dependent("Hubble", [0.7])  # not in the pool


def test_cmb_unit_factors():
    t = MockLCDM({}, name="mock")
    t.initialize()
    assert t._cmb_unit_factor("1", 2.7) == 1.0
    assert np.isclose(t._cmb_unit_factor("muK2", 2.7255), (2.7255e6) ** 2)
    assert np.isclose(t._cmb_unit_factor("FIRASmuK2", 3.0), (2.7255e6) ** 2)
    from cobaya_tpu.utils.log import LoggedError

    with pytest.raises(LoggedError):
        t._cmb_unit_factor("parsecs", 2.7)


def test_power_spectrum_interpolator():
    z = np.array([0.0, 0.5, 1.0])
    k = np.logspace(-3, 0, 50)
    # P(z, k) = (1+z)^-2 * k^-1.5 (power law: extrapolation exact)
    P = (1 + z[:, None]) ** -2 * k[None, :] ** -1.5
    interp = PowerSpectrumInterpolator(z, k, P, logP=True, extrap_kmax=10.0)
    assert np.isclose(interp.P(0.5, 0.01), (1.5) ** -2 * 0.01 ** -1.5,
                      rtol=1e-4)
    # extrapolation beyond input_kmax follows the power law
    assert np.isclose(interp.P(0.0, 5.0), 5.0 ** -1.5, rtol=1e-2)
    with pytest.raises(ValueError):
        interp.P(0.5, 100.0)  # beyond extrap_kmax
    with pytest.raises(ValueError):
        interp.P(2.0, 0.01)  # z out of range


def test_sixdf_bao_runs_with_mock():
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao.sixdf_2011_bao": None},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    lp = model.logposterior([70.0, 0.3])
    assert np.isfinite(lp.loglikes[0])
    assert "chi2__BAO" in model.derived_names


def test_component_name_resolution():
    from cobaya_tpu.models.component import get_component_class

    for name in ("H0.riess2020", "bao.sdss_dr12_consensus_bao",
                 "sn.pantheon", "planck_2018_highl_plik.TT_lite",
                 "_test", "one", "gaussian_mixture"):
        cls = get_component_class(name, kind="likelihood")
        assert cls is not None
