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
            "measurements": [  # rows: z value err quantity
                (0.5, 13.0, 0.2, "DV_over_rs"),
                (0.5, 81.0, 3.0, "Hz_rs"),
                (0.6, 0.44, 0.02, "f_sigma8"),
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


def test_bao_prob_dist_table(tmp_path):
    """Non-Gaussian chi2(alpha) table (SDSS DR7 MGS mechanism,
    reference bao.py:179): spline recovers the tabulated parabola."""
    alpha = np.linspace(0.8, 1.2, 201)
    chi2 = ((alpha - 1.0) / 0.05) ** 2
    np.savetxt(tmp_path / "prob.txt", chi2)
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao_mgs_like": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "path": str(tmp_path),
            "prob_dist": "prob.txt",
            "prob_dist_bounds": [0.8, 1.2],
            "data": [0.15, 1.0, 0.05, "DV_over_rs"],
            # rescale so the theory value lands inside the table
            "rs_rescale": None,
        }},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    like = list(model.likelihood.values())[0]
    model.logposterior([70.0, 0.3])
    dv = like.theory_value("DV_over_rs", 0.15)
    # evaluate the spline directly at a known alpha
    assert np.isclose(like._prob_logpdf(1.0), 0.0, atol=1e-6)
    assert np.isclose(like._prob_logpdf(1.05), -0.5, atol=1e-3)
    assert like._prob_logpdf(1.5) == -np.inf
    # the model's loglike equals the spline at the theory value
    lp = model.logposterior([70.0, 0.3])
    expected = like._prob_logpdf(dv) if 0.8 <= dv <= 1.2 else -np.inf
    assert np.isclose(lp.loglikes[0], expected, atol=1e-6)


def test_bao_likelihood_grids(tmp_path):
    """1-D and 2-D tabulated likelihood grids (reference bao.py:205,
    SDSS DR16 mechanism): log-prob recovered at grid points."""
    # compute theory values at the fiducial point for centering
    info0 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao_test": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "measurements": [(0.845, 13.0, 0.2, "DV_over_rs"),
                             (0.845, 20.0, 0.4, "DM_over_rs"),
                             (0.845, 20.0, 0.4, "DH_over_rs")],
        }},
        "params": dict(BASE_PARAMS),
    }
    m0 = get_model(info0)
    m0.logposterior([70.0, 0.3])
    like0 = list(m0.likelihood.values())[0]
    dv0 = like0.theory_value("DV_over_rs", 0.845)
    dm0 = like0.theory_value("DM_over_rs", 0.845)
    dh0 = like0.theory_value("DH_over_rs", 0.845)
    # 1-D grid: gaussian in DV_over_rs centered on dv0
    x = np.linspace(dv0 * 0.8, dv0 * 1.2, 101)
    np.savetxt(tmp_path / "grid1.txt",
               np.column_stack([x, np.exp(-0.5 * ((x - dv0) / 0.2) ** 2)]))
    info1 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao_grid1": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "path": str(tmp_path), "grid_file": "grid1.txt",
            "observable_1": "DV_over_rs", "redshift": 0.845,
        }},
        "params": dict(BASE_PARAMS),
    }
    m1 = get_model(info1)
    lp = m1.logposterior([70.0, 0.3])
    assert np.isclose(lp.loglikes[0], 0.0, atol=1e-4)  # peak at fiducial
    # 2-D grid in (DM_over_rs, DH_over_rs)
    xs = np.linspace(dm0 * 0.9, dm0 * 1.1, 41)
    ys = np.linspace(dh0 * 0.9, dh0 * 1.1, 43)
    rows = []
    for xv in xs:
        for yv in ys:
            p = np.exp(-0.5 * (((xv - dm0) / 0.3) ** 2
                               + ((yv - dh0) / 0.2) ** 2))
            rows.append((xv, yv, p))
    np.savetxt(tmp_path / "grid2.txt", np.asarray(rows))
    info2 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"bao_grid2": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "path": str(tmp_path), "grid_file": "grid2.txt",
            "observable_1": "DM_over_rs", "observable_2": "DH_over_rs",
            "redshift": 0.845,
        }},
        "params": dict(BASE_PARAMS),
    }
    m2 = get_model(info2)
    lp2 = m2.logposterior([70.0, 0.3])
    assert np.isclose(lp2.loglikes[0], 0.0, atol=1e-4)
    # moving away from fiducial lowers the likelihood
    lp2b = m2.logposterior([72.0, 0.32])
    assert lp2b.loglikes[0] < lp2.loglikes[0]


def test_bao_variant_classes_resolve():
    """All reference BAO variants exist and resolve to classes."""
    from cobaya_tpu.models.component import get_component_class

    names = [
        "bao.sixdf_2011_bao", "bao.sdss_dr7_mgs",
        "bao.sdss_dr12_consensus_bao", "bao.sdss_dr12_consensus_final",
        "bao.sdss_dr12_consensus_full_shape", "bao.sdss_dr12_lrg_bao_dmdh",
        "bao.sdss_dr16_lrg_bao_dmdh", "bao.sdss_dr16_qso_bao_dmdh",
        "bao.sdss_dr16_baoplus_lrg", "bao.sdss_dr16_baoplus_qso",
        "bao.sdss_dr16_bao_elg", "bao.sdss_dr16_baoplus_elg",
        "bao.sdss_dr16_baoplus_lyauto", "bao.sdss_dr16_baoplus_lyxqso",
        "bao.desi_2024_bao_all", "bao.desi_2024_bao_bgs_z1",
        "bao.desi_2024_bao_lrg_z1", "bao.desi_2024_bao_lrg_z2",
        "bao.desi_2024_bao_lrgpluselg_z1", "bao.desi_2024_bao_elg_z2",
        "bao.desi_2024_bao_qso_z1", "bao.desi_2024_bao_lya",
        "bao.desi_2024_eboss_bao_lya", "bao.desi_dr2",
        "bao.desi_dr2.desi_bao_all",
    ]
    from cobaya_tpu.likelihoods.base_classes.bao import BAO

    for name in names:
        cls = get_component_class(name, kind="likelihood")
        assert issubclass(cls, BAO), name


def _write_jla_style_dataset(tmp_path, model0, alpha_true=0.14,
                             beta_true=3.1):
    """Synthetic JLA-format dataset generated from the fiducial model."""
    rng = np.random.default_rng(3)
    zs = np.linspace(0.05, 0.9, 30)
    model0.add_requirements({"angular_diameter_distance": {"z": zs}})
    model0.logposterior([70.0, 0.3])
    DA = np.asarray(model0.provider.get_angular_diameter_distance(zs))
    mu = 5 * np.log10((1 + zs) ** 2 * DA)
    stretch = rng.normal(0, 1, len(zs))
    colour = rng.normal(0, 0.1, len(zs))
    scriptm = 24.0
    mb = mu + scriptm - alpha_true * stretch + beta_true * colour
    header = ("#name zcmb zhel dz mb dmb x1 dx1 color dcolor 3rdvar "
              "d3rdvar cov_m_s cov_m_c cov_s_c set")
    lines = [header]
    for i, z in enumerate(zs):
        lines.append(
            f"sn{i} {z} {z} 0 {mb[i]} 0.1 {stretch[i]} 0.1 "
            f"{colour[i]} 0.02 0 0 0 0 0 1"
        )
    (tmp_path / "lc.txt").write_text("\n".join(lines) + "\n")
    n = len(zs)
    np.savetxt(tmp_path / "mag_cov.txt",
               np.concatenate([[n], (0.01 * np.eye(n)).ravel()]))
    np.savetxt(tmp_path / "small_cov.txt",
               np.concatenate([[n], (1e-4 * np.eye(n)).ravel()]))
    (tmp_path / "syn.dataset").write_text(
        "data_file = lc.txt\n"
        "pecz = 0.001\n"
        "intrinsicdisp = 0\n"
        "twoscriptmfit = F\n"
        "has_mag_covmat = T\n"
        "mag_covmat_file = mag_cov.txt\n"
        "has_stretch_covmat = T\n"
        "stretch_covmat_file = small_cov.txt\n"
        "has_colour_covmat = T\n"
        "colour_covmat_file = small_cov.txt\n"
        "has_mag_stretch_covmat = F\n"
        "has_mag_colour_covmat = F\n"
        "has_stretch_colour_covmat = F\n"
    )
    return str(tmp_path / "syn.dataset")


def test_sn_jla_alpha_beta(tmp_path):
    """JLA-style dataset with sampled alpha/beta: the profiled chi2 is
    best near the true light-curve coefficients."""
    info0 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"one": None},
        "params": dict(BASE_PARAMS),
    }
    dataset = _write_jla_style_dataset(tmp_path, get_model(info0))
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"syn_jla": {
            "class": "sn.jla",
            "dataset_file": dataset,
        }},
        "params": {**BASE_PARAMS,
                   "alpha_jla": {"prior": [0.01, 2]},
                   "beta_jla": {"prior": [0.9, 4.6]}},
    }
    model = get_model(info)

    def ll(H0val, Om, a, b):
        return model.logposterior({
            "H0val": H0val, "Om": Om, "alpha_jla": a, "beta_jla": b,
        }).loglikes[0]

    lp_true = ll(70.0, 0.3, 0.14, 3.1)
    lp_off = ll(70.0, 0.3, 0.5, 2.0)
    assert np.isfinite(lp_true) and lp_true > lp_off
    # wrong cosmology is worse at the true alpha/beta
    assert lp_true > ll(65.0, 0.42, 0.14, 3.1)


def test_sn_jla_lite_marginalized(tmp_path):
    """Grid-marginalized JLA (jla_lite mechanism) runs and prefers the
    true cosmology."""
    info0 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"one": None},
        "params": dict(BASE_PARAMS),
    }
    dataset = _write_jla_style_dataset(tmp_path, get_model(info0))
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"syn_jla_lite": {
            "class": "sn.jla_lite",
            "dataset_file": dataset,
            "marginalize_params": {
                "marge_steps": 3, "alpha_centre": 0.14,
                "beta_centre": 3.1, "step_width_alpha": 0.01,
                "step_width_beta": 0.1},
        }},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    lp_true = model.logposterior([70.0, 0.3]).loglikes[0]
    lp_off = model.logposterior([64.0, 0.45]).loglikes[0]
    assert np.isfinite(lp_true) and lp_true > lp_off


def test_sn_pantheonplus_format(tmp_path):
    """Pantheon+-style named-column dataset: z>0.01 mask, Fisher-projected
    M marginalization (shift in M leaves logp unchanged)."""
    info0 = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"one": None},
        "params": dict(BASE_PARAMS),
    }
    m0 = get_model(info0)
    zs = np.concatenate([[0.005], np.linspace(0.02, 0.8, 25)])
    m0.add_requirements({"angular_diameter_distance": {"z": zs}})
    m0.logposterior([70.0, 0.3])
    DA = np.asarray(m0.provider.get_angular_diameter_distance(zs))
    mu = 5 * np.log10((1 + zs) ** 2 * DA)
    mag = mu - 19.3
    lines = ["# m_b_corr zHD zHEL"]
    for m, z in zip(mag, zs):
        lines.append(f"{m} {z} {z}")
    (tmp_path / "pplus.txt").write_text("\n".join(lines) + "\n")
    n = len(zs)
    np.savetxt(tmp_path / "pplus_cov.txt",
               np.concatenate([[n], (0.01 * np.eye(n)).ravel()]))
    (tmp_path / "pp.dataset").write_text(
        "data_file = pplus.txt\nmag_covmat_file = pplus_cov.txt\n"
    )
    info = {
        "theory": {"mock": {"external": MockLCDM}},
        "likelihood": {"syn_pp": {
            "class": "sn.pantheonplus",
            "dataset_file": str(tmp_path / "pp.dataset"),
        }},
        "params": dict(BASE_PARAMS),
    }
    model = get_model(info)
    like = list(model.likelihood.values())[0]
    assert like.nsn == n - 1  # z = 0.005 masked out
    lp_true = model.logposterior([70.0, 0.3]).loglikes[0]
    lp_off = model.logposterior([64.0, 0.45]).loglikes[0]
    # M-projection: logp invariant under a constant magnitude offset
    like.mag = like.mag + 1.7
    lp_shift = model.logposterior([70.0, 0.3], cached=False).loglikes[0]
    assert np.isclose(lp_shift, lp_true, atol=1e-6)
    assert lp_true > lp_off
    assert np.isclose(lp_true, 0.0, atol=1e-6)  # exact data -> chi2 = 0


def test_sn_variant_classes_resolve():
    from cobaya_tpu.likelihoods.base_classes.sn import SN
    from cobaya_tpu.models.component import get_component_class

    for name in ("sn.pantheon", "sn.jla", "sn.jla_lite", "sn.pantheonplus",
                 "sn.pantheonplusshoes", "sn.union3", "sn.desy5",
                 "sn.desdovekie"):
        assert issubclass(get_component_class(name, kind="likelihood"), SN)


def test_planck_variant_classes_resolve():
    """Every reference Planck likelihood variant resolves to a class."""
    from cobaya_tpu.models.component import get_component_class

    names = [
        "planck_2018_lowl.TT", "planck_2018_lowl.EE",
        "planck_2018_lowl.EE_sroll2", "planck_2018_lowl.TT_clik",
        "planck_2018_lowl.EE_clik",
        "planck_2018_highl_plik.TT", "planck_2018_highl_plik.TE",
        "planck_2018_highl_plik.EE", "planck_2018_highl_plik.TTTEEE",
        "planck_2018_highl_plik.TT_lite", "planck_2018_highl_plik.TTTEEE_lite",
        "planck_2018_highl_plik.TT_lite_native",
        "planck_2018_highl_plik.TTTEEE_lite_native",
        "planck_2018_highl_plik.TT_unbinned",
        "planck_2018_highl_plik.TTTEEE_unbinned",
        "planck_2018_highl_CamSpec.TT", "planck_2018_highl_CamSpec.TTTEEE",
        "planck_2018_highl_CamSpec2021.TT", "planck_2018_highl_CamSpec2021.TE",
        "planck_2018_highl_CamSpec2021.EE", "planck_2018_highl_CamSpec2021.TEEE",
        "planck_2018_highl_CamSpec2021.TTTE",
        "planck_2018_highl_CamSpec2021.TTTEEE",
        "planck_NPIPE_highl_CamSpec.TT", "planck_NPIPE_highl_CamSpec.TE",
        "planck_NPIPE_highl_CamSpec.EE", "planck_NPIPE_highl_CamSpec.TEEE",
        "planck_NPIPE_highl_CamSpec.TTTE", "planck_NPIPE_highl_CamSpec.TTTEEE",
        "planck_2018_lensing.native", "planck_2018_lensing.CMBMarged",
        "planck_2018_lensing.clik",
    ]
    for name in names:
        cls = get_component_class(name, kind="likelihood")
        assert isinstance(cls, type), name
