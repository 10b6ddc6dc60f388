"""On-device likelihood math: traced (logp_jax) vs eager (numpy) agreement.

A host-side mock Boltzmann code exports its products through the callback
bridge (BoltzmannBase.callback_output_spec / callback_export); the converted
likelihood families (pliklite, CMBlikes, matrix-HL/BK, CamSpec, SN, BAO)
evaluate their math inside the jitted posterior.  Every test asserts the
jitted pipeline reproduces the eager numpy path.
"""

import os

import jax
import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.cosmo.boltzmannbase import BoltzmannBase
from cobaya_tpu.utils.conventions import Const

MUK2 = (Const.T_CMB * 1e6) ** 2


class HostBoltz(BoltzmannBase):
    """Host-callback mock: smooth parameterized spectra + LCDM background."""

    n_calls = 0
    params = {"rdrag": None}  # providable derived param

    def get_can_support_params(self):
        return ["Acmb", "H0val", "Om"]

    def calculate(self, state, want_derived=True, **p):
        type(self).n_calls += 1
        A = p.get("Acmb", 1.0)
        H0 = p.get("H0val", 70.0)
        Om = p.get("Om", 0.3)
        mp = self._must_provide
        if "Cl" in mp:
            lmax = max(mp["Cl"].values())
            ells = np.arange(lmax + 1)
            with np.errstate(divide="ignore"):
                dl = A * 1000.0 * (np.maximum(ells, 2) / 200.0) ** -0.6
            dl[:2] = 0
            base = dl * 2 * np.pi / np.maximum(ells * (ells + 1), 1) / MUK2
            cl = {"ell": ells}
            for name, fac in (("tt", 1.0), ("te", 0.3), ("ee", 0.1),
                              ("bb", 0.02)):
                if name in mp["Cl"]:
                    cl[name] = fac * base
            state["Cl"] = cl

        def E(z):
            return np.sqrt(Om * (1 + z) ** 3 + (1 - Om))

        def comoving(z):
            zz = np.linspace(0, z, 256)
            return Const.c_km_s / H0 * np.trapezoid(1 / E(zz), zz)

        if "Hubble" in mp:
            state["Hubble"] = H0 * E(np.asarray(mp["Hubble"]["z"]))
        if "angular_diameter_distance" in mp:
            z = np.asarray(mp["angular_diameter_distance"]["z"])
            state["angular_diameter_distance"] = np.array(
                [comoving(zi) / (1 + zi) for zi in z]
            )
        if "fsigma8" in mp:
            z = np.asarray(mp["fsigma8"]["z"])
            state["fsigma8"] = 0.45 * E(z) ** -0.5
        if want_derived:
            state["derived"] = {
                "rdrag": 147.0 * (0.70 / (H0 / 100)),
            }
        return True


BG_PARAMS = {
    "H0val": {"prior": [60, 80], "ref": 70, "proposal": 1},
    "Om": {"prior": [0.1, 0.5], "ref": 0.3, "proposal": 0.01},
}
CMB_PARAMS = {
    "Acmb": {"prior": [0.5, 2.0], "ref": 1.0, "proposal": 0.01},
}


def assert_traced_matches_eager(info, x, rtol=2e-4, atol=1e-3):
    model = get_model(info)
    eager = model.logposterior(np.asarray(x, float))
    # agreement is checked in f64 so only the math (not f32 rounding)
    # is under test; the f32 production path is exercised by the E2E test
    with jax.enable_x64(True):
        fn = jax.jit(model.make_logposterior_fn())
        logpost, logpriors, loglikes, derived = fn(
            np.asarray(x, np.float64)
        )
        loglikes = np.asarray(loglikes)
    np.testing.assert_allclose(
        loglikes, np.asarray(eager.loglikes), rtol=rtol, atol=atol,
    )
    return model, loglikes, np.asarray(eager.loglikes)


# ---------------------------------------------------------------------------
# plik-lite
# ---------------------------------------------------------------------------
@pytest.fixture()
def pliklite_dataset(tmp_path):
    lmax, offset0 = 120, 2
    nbins = {"tt": 6, "te": 5, "ee": 5}
    nb_tot = sum(nbins.values())
    edges = np.linspace(offset0, lmax, 7).astype(int)
    blmin = edges[:-1] - offset0
    blmax = edges[1:] - 1 - offset0
    rng = np.random.default_rng(0)
    ls = np.arange(offset0, lmax + 1)
    weights = np.ones_like(ls, float)
    # data rows: (index, value); values are binned C_l-like bandpowers
    data = np.zeros((nb_tot, 2))
    data[:, 0] = np.arange(nb_tot)
    data[:, 1] = np.abs(rng.normal(5e-12, 1e-12, nb_tot))
    np.savetxt(tmp_path / "data.dat", data)
    np.savetxt(tmp_path / "blmin.dat", blmin)
    np.savetxt(tmp_path / "blmax.dat", blmax)
    np.savetxt(tmp_path / "weights.dat", weights)
    cov = np.diag(np.full(nb_tot, (1e-12) ** 2))
    np.savetxt(tmp_path / "cov.dat", cov)
    (tmp_path / "plik.dataset").write_text(
        "use_cl = tt te ee\n"
        f"nbintt = {nbins['tt']}\nnbinte = {nbins['te']}\n"
        f"nbinee = {nbins['ee']}\n"
        f"lmax = {lmax}\nbin_lmin_offset = {offset0}\n"
        "data = data.dat\nblmin = blmin.dat\nblmax = blmax.dat\n"
        "weights = weights.dat\ncov_file = cov.dat\n"
    )
    return str(tmp_path / "plik.dataset")


def _pliklite_info(dataset):
    return {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"plik": {
            "class":
                "cobaya_tpu.likelihoods.base_classes.PlanckPlikLite",
            "dataset_file": dataset,
        }},
        "params": {**CMB_PARAMS,
                   "A_planck": {"prior": [0.9, 1.1], "ref": 1.0,
                                "proposal": 0.002}},
    }


def test_pliklite_traced_matches_eager(pliklite_dataset):
    info = _pliklite_info(pliklite_dataset)
    model, traced, eager = assert_traced_matches_eager(info, [1.1, 1.01])
    like = list(model.likelihood.values())[0]
    assert like.jittable is True


# ---------------------------------------------------------------------------
# SN family
# ---------------------------------------------------------------------------
def _sn_simple_info(marginalize_M=True):
    zs = np.linspace(0.05, 1.0, 15)
    rng = np.random.default_rng(1)
    mu = 5 * np.log10(zs * 4000 * (1 + zs)) + 25
    data = np.column_stack([zs, mu - 19.3 + rng.normal(0, 0.1, len(zs)),
                            np.full(len(zs), 0.1)])
    return {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"sn": {
            "class": "cobaya_tpu.likelihoods.base_classes.SN",
            "data": data.tolist(),
            "marginalize_M": marginalize_M,
        }},
        "params": dict(BG_PARAMS),
    }


@pytest.mark.parametrize("marginalize_M", [True, False])
def test_sn_simple_traced_matches_eager(marginalize_M):
    info = _sn_simple_info(marginalize_M)
    model, traced, eager = assert_traced_matches_eager(info, [68.0, 0.32])
    assert list(model.likelihood.values())[0].jittable is True


def _jla_style_dataset(tmp_path, marginalize):
    """Minimal JLA-format dataset with stretch/colour covariances."""
    rng = np.random.default_rng(2)
    n = 12
    zs = np.linspace(0.1, 0.9, n)
    mag = 5 * np.log10(zs * 4000 * (1 + zs)) + 5 + rng.normal(0, 0.1, n)
    cols = ("name zcmb zhel dz mb dmb x1 dx1 color dcolor 3rdvar d3rdvar "
            "cov_m_s cov_m_c cov_s_c set ra dec biascor")
    lines = ["#" + cols]
    for i in range(n):
        lines.append(
            f"sn{i} {zs[i]:.4f} {zs[i]:.4f} 0 {mag[i]:.4f} 0.10 "
            f"{rng.normal(0, 1):.3f} 0.05 {rng.normal(0, 0.1):.3f} 0.02 "
            "2.0 0.1 0.001 0.001 0.0001 1 0 0 0"
        )
    (tmp_path / "lc.txt").write_text("\n".join(lines) + "\n")

    def save_cov(fname, scale):
        a = rng.normal(0, scale, (n, n))
        np.savetxt(tmp_path / fname, a @ a.T + np.eye(n) * scale ** 2)

    save_cov("c_mag.dat", 0.05)
    save_cov("c_stretch.dat", 0.02)
    save_cov("c_colour.dat", 0.02)
    (tmp_path / "jla.dataset").write_text(
        "name = JLA_mini\ndata_file = lc.txt\npecz = 0.001\n"
        "twoscriptmfit = F\n"
        "has_mag_covmat = T\nmag_covmat_file = c_mag.dat\n"
        "has_stretch_covmat = T\nstretch_covmat_file = c_stretch.dat\n"
        "has_colour_covmat = T\ncolour_covmat_file = c_colour.dat\n"
        "has_mag_stretch_covmat = F\nhas_mag_colour_covmat = F\n"
        "has_stretch_colour_covmat = F\n"
    )
    like_info = {
        "class": "cobaya_tpu.likelihoods.base_classes.SN",
        "dataset_file": str(tmp_path / "jla.dataset"),
        "path": str(tmp_path),
        "marginalize": marginalize,
        "alpha_beta_names": ["alpha_jla", "beta_jla"],
    }
    params = dict(BG_PARAMS)
    if not marginalize:
        params["alpha_jla"] = {"prior": [0.1, 0.2], "ref": 0.14,
                               "proposal": 0.005}
        params["beta_jla"] = {"prior": [2.5, 4.0], "ref": 3.1,
                              "proposal": 0.05}
    return {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"jla": like_info},
        "params": params,
    }


def test_jla_sampled_alpha_beta_traced(tmp_path):
    info = _jla_style_dataset(tmp_path, marginalize=False)
    model, traced, eager = assert_traced_matches_eager(
        info, [68.0, 0.32, 0.15, 3.2], rtol=1e-3, atol=2e-3,
    )
    assert list(model.likelihood.values())[0].jittable is True


def test_jla_marginalized_traced(tmp_path):
    info = _jla_style_dataset(tmp_path, marginalize=True)
    model, traced, eager = assert_traced_matches_eager(
        info, [68.0, 0.32], rtol=1e-3, atol=2e-3,
    )
    assert list(model.likelihood.values())[0].jittable is True


def test_jla_no_precompute_stays_on_host(tmp_path):
    info = _jla_style_dataset(tmp_path, marginalize=True)
    info["likelihood"]["jla"]["precompute_covmats"] = False
    model = get_model(info)
    like = list(model.likelihood.values())[0]
    assert like.jittable is False  # demoted: host bridge still works
    fn = jax.jit(model.make_logposterior_fn())
    lp = np.asarray(fn(np.asarray([68.0, 0.32], np.float32))[2])
    eager = model.logposterior([68.0, 0.32])
    np.testing.assert_allclose(lp, eager.loglikes, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# BAO family
# ---------------------------------------------------------------------------
def _bao_info(like_extra):
    return {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"bao": {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            **like_extra,
        }},
        "params": dict(BG_PARAMS),
    }


def test_bao_gaussian_traced():
    info = _bao_info({"measurements": [
        (0.5, 13.0, 0.2, "DV_over_rs"),
        (0.5, 81.0, 3.0, "Hz_rs"),
        (0.7, 18.0, 0.5, "DM_over_rs"),
        (0.7, 20.0, 0.7, "DH_over_rs"),
        (0.6, 0.44, 0.02, "f_sigma8"),
        (0.3, 0.7, 0.1, "F_AP"),
    ]})
    model, _, _ = assert_traced_matches_eager(info, [70.0, 0.3])
    assert list(model.likelihood.values())[0].jittable is True


def test_bao_prob_dist_traced(tmp_path):
    alpha = np.linspace(0.8, 1.2, 101)
    chi2 = 30 * (alpha - 1.02) ** 2 + 0.5 * (alpha - 1.02) ** 4
    np.savetxt(tmp_path / "probdist.dat", chi2)
    # DV_over_rs ~ 9.5 at z=0.15 for the mock; bounds must bracket it in
    # units of the measured value ratio -> use plain DV measurement table
    info = _bao_info({
        "measurements": [(0.15, 1.0, "DV_over_rs")],
        "prob_dist": str(tmp_path / "probdist.dat"),
        "prob_dist_bounds": [2.0, 18.0],
    })
    # remap: tabulated over the observable value directly
    alpha_obs = np.linspace(2.0, 18.0, 101)
    chi2 = 0.3 * (alpha_obs - 9.0) ** 2
    np.savetxt(tmp_path / "probdist.dat", chi2)
    model, _, _ = assert_traced_matches_eager(info, [70.0, 0.3],
                                              rtol=1e-3, atol=1e-3)
    assert list(model.likelihood.values())[0].jittable is True


def test_bao_grid2d_traced(tmp_path):
    # 2-D likelihood grid over (DM_over_rs, DH_over_rs) at z=0.51
    x = np.linspace(5.0, 25.0, 41)
    y = np.linspace(10.0, 40.0, 41)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    p = np.exp(-0.5 * (((xx - 13.5) / 2) ** 2 + ((yy - 21) / 3) ** 2))
    rows = np.column_stack([xx.ravel(), yy.ravel(), p.ravel()])
    np.savetxt(tmp_path / "grid.dat", rows)
    info = _bao_info({
        "grid_file": str(tmp_path / "grid.dat"),
        "redshift": 0.51,
        "observable_1": "DM_over_rs",
        "observable_2": "DH_over_rs",
    })
    model, _, _ = assert_traced_matches_eager(info, [70.0, 0.3],
                                              rtol=1e-3, atol=5e-3)
    assert list(model.likelihood.values())[0].jittable is True


# ---------------------------------------------------------------------------
# CMBlikes (scalar + matrix HL) and CamSpec
# ---------------------------------------------------------------------------
@pytest.fixture()
def cmblikes_dataset(tmp_path):
    lmin = np.arange(2, 102, 10)
    lmax = lmin + 9
    dls = [np.mean(1000.0 * (np.arange(l0, l1 + 1) / 200.0) ** -0.6)
           for l0, l1 in zip(lmin, lmax)]
    np.savetxt(tmp_path / "bp.dat", np.column_stack([lmin, lmax, dls]))
    np.savetxt(tmp_path / "cov.dat", np.diag(np.full(len(lmin), 25.0)))
    np.savetxt(tmp_path / "fid.dat", np.column_stack([lmin, lmax, dls]))
    (tmp_path / "toy.dataset").write_text(
        "use_cl = tt\ncl_hat_file = bp.dat\ncovmat_fiducial = cov.dat\n"
        "cl_fiducial_file = fid.dat\nlike_approx = HL\n"
    )
    return str(tmp_path / "toy.dataset")


def test_cmblikes_hl_traced(cmblikes_dataset):
    info = {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"toy": {
            "class": "cobaya_tpu.likelihoods.base_classes.CMBlikes",
            "dataset_file": cmblikes_dataset,
        }},
        "params": dict(CMB_PARAMS),
    }
    model, _, _ = assert_traced_matches_eager(info, [1.15])
    assert list(model.likelihood.values())[0].jittable is True


def test_camspec_traced(tmp_path):
    from tests.test_camspec import FG_PARAMS, make_dataset

    make_dataset(tmp_path)
    params = {**CMB_PARAMS}
    for k, v in FG_PARAMS.items():
        params[k] = {"prior": [min(0.0, v - 1), v + max(abs(v), 1)],
                     "ref": v, "proposal": 0.01}
    info = {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"camspec": {
            "class": "cobaya_tpu.likelihoods.base_classes.CamSpec",
            "dataset_file": str(tmp_path / "mini.dataset"),
            "use_cl": ["100x100", "143x143", "217x217", "143x217",
                       "TE", "EE"],
        }},
        "params": params,
    }
    x = [1.0] + [FG_PARAMS[k] for k in FG_PARAMS]
    # order: params dict order = Acmb then FG_PARAMS order
    model, _, _ = assert_traced_matches_eager(info, x, rtol=1e-3, atol=0.03)
    assert list(model.likelihood.values())[0].jittable is True


def test_matrix_hl_and_bicep_traced(tmp_path):
    from tests.test_cmblikes_matrix import _theory_info, make_matrix_dataset

    dataset = make_matrix_dataset(tmp_path)
    info = _theory_info(dataset)
    model, _, _ = assert_traced_matches_eager(info, [1.1], rtol=5e-4,
                                              atol=2e-3)
    assert list(model.likelihood.values())[0].jittable is True


# ---------------------------------------------------------------------------
# DES 3x2pt
# ---------------------------------------------------------------------------
def test_des_traced(tmp_path):
    from tests.test_des import NUISANCE, MockPkLCDM, des_dataset as _  # noqa

    # rebuild the synthetic dataset inline (fixture body)
    import tests.test_des as td

    dataset = td.des_dataset.__wrapped__(tmp_path)
    MockPkLCDM.pk_grid_points = 80  # the mock's k grid size
    info = {
        "theory": {"mock": {"external": MockPkLCDM}},
        "likelihood": {"des": {
            "class": "cobaya_tpu.likelihoods.base_classes.des.DES",
            "dataset_file": dataset, "l_max": 2000,
        }},
        "params": {
            "H0val": {"prior": [60, 80], "ref": 70, "proposal": 1},
            "Om": {"prior": [0.1, 0.5], "ref": 0.3, "proposal": 0.01},
            "Apk": {"prior": [0.5, 2.0], "ref": 1.0, "proposal": 0.01},
            **{k: {"prior": [v - 1, v + 1], "ref": v, "proposal": 0.01}
               for k, v in NUISANCE.items()},
        },
    }
    x = [70.0, 0.3, 1.0] + [NUISANCE[k] for k in NUISANCE]
    model = get_model(info)
    eager = model.logposterior(np.asarray(x, float))
    like = list(model.likelihood.values())[0]
    assert like.jittable is True
    with jax.enable_x64(True):
        fn = jax.jit(model.make_logposterior_fn())
        loglikes = np.asarray(fn(np.asarray(x, np.float64))[2])
    # traced Pk is linear-in-logk vs the host bicubic: agreement is
    # likelihood-level, not bitwise
    chi2_eager = -2 * np.asarray(eager.loglikes)
    chi2_traced = -2 * loglikes
    np.testing.assert_allclose(chi2_traced, chi2_eager, rtol=2e-3,
                               atol=1e-3)


# ---------------------------------------------------------------------------
# E2E: full cosmology-style sampling with likelihood math inside the epoch
# ---------------------------------------------------------------------------
def test_e2e_sampling_with_device_likelihoods(pliklite_dataset):
    from cobaya_tpu.run import run

    info = _pliklite_info(pliklite_dataset)
    info["params"].update(BG_PARAMS)
    sn_info = _sn_simple_info()["likelihood"]["sn"]
    info["likelihood"]["sn"] = sn_info
    info["sampler"] = {"mcmc": {
        "max_samples": 400, "n_chains": 8, "seed": 5,
        "measure_speeds": False, "burn_in": 0,
    }}
    HostBoltz.n_calls = 0
    upd, sampler = run(info)
    likes = list(sampler.model.likelihood.values())
    assert all(like.jittable for like in likes)
    products = sampler.products()
    assert "sample" in products


# ---------------------------------------------------------------------------
# Planck low-l TT (Gibbs splines) and EE (SimAll table) on device
# ---------------------------------------------------------------------------
def _lowT_package(tmp_path, n_ell=28, nbins=400, rng=None):
    """Synthetic planck_2018_lowT_native-format data: monotone cl->x maps
    saturating at +-5 like the released Gibbs splines."""
    rng = rng or np.random.default_rng(8)
    ells = np.arange(2, 2 + n_ell)
    d_fid = 1000.0 * (ells / 200.0) ** -0.6  # HostBoltz fiducial D_l
    cl_knots = np.empty((nbins, n_ell))
    x_vals = np.empty((nbins, n_ell))
    for i in range(n_ell):
        lo, hi = 0.45 * d_fid[i], 1.8 * d_fid[i]
        knots = np.linspace(lo, hi, nbins)
        x = 5.0 * np.tanh((knots - d_fid[i]) / (0.8 * d_fid[i]))
        # saturate hard at the edges (the released tables clip at +-5)
        x[:4] = -5.0
        x[-4:] = 5.0
        cl_knots[:, i] = knots
        x_vals[:, i] = x
    a = rng.normal(size=(n_ell, n_ell)) * 0.05
    cov = a @ a.T + np.eye(n_ell)
    mu = rng.normal(0, 0.3, n_ell)
    np.savetxt(tmp_path / "cov.txt", cov)
    np.savetxt(tmp_path / "mu.txt", mu)
    np.savetxt(tmp_path / "mu_sigma.txt", d_fid)
    np.savetxt(tmp_path / "cl2x_1.txt", cl_knots)
    np.savetxt(tmp_path / "cl2x_2.txt", x_vals)
    return str(tmp_path)


def test_lowT_traced_matches_eager(tmp_path):
    path = _lowT_package(tmp_path)
    info = {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"planck_2018_lowl.TT": {"path": path}},
        "params": {**CMB_PARAMS,
                   "A_planck": {"prior": [0.9, 1.1], "ref": 1.0,
                                "proposal": 0.002}},
    }
    model, traced, eager = assert_traced_matches_eager(info, [1.05, 1.01])
    assert list(model.likelihood.values())[0].jittable is True
    # out-of-bounds theory (huge calibration) rejects on both paths
    lp = model.logposterior(np.array([1.95, 0.95]))
    import jax

    with jax.enable_x64(True):
        fn = jax.jit(model.make_logposterior_fn())
        ll = np.asarray(fn(np.asarray([1.95, 0.95], np.float64))[2])
    assert not np.isfinite(lp.loglikes[0]) and not np.isfinite(ll[0])


def test_lowE_traced_matches_eager(tmp_path):
    from cobaya_tpu.likelihoods.planck_2018_lowl.EE import EE

    n_ell, nbins = 28, 3000
    ells = np.arange(2, 2 + n_ell)
    d_fid = 0.1 * 1000.0 * (ells / 200.0) ** -0.6
    step = float(d_fid.max() * 3 / nbins)

    class SmallStepEE(EE):
        _stepEE = step
        _table_file_name = "prob_table.txt"

    rng = np.random.default_rng(9)
    grid = np.arange(nbins) * step
    table = -0.5 * ((grid[:, None] - d_fid[None, :])
                    / (0.5 * d_fid[None, :])) ** 2 + rng.normal(
        0, 0.01, (nbins, n_ell))
    np.savetxt(tmp_path / "prob_table.txt", table)
    info = {
        "theory": {"mock": {"external": HostBoltz}},
        "likelihood": {"lowE": {
            "external": SmallStepEE, "path": str(tmp_path),
        }},
        "params": {**CMB_PARAMS,
                   "A_planck": {"prior": [0.9, 1.1], "ref": 1.0,
                                "proposal": 0.002}},
    }
    model, traced, eager = assert_traced_matches_eager(info, [1.02, 0.99])
    assert list(model.likelihood.values())[0].jittable is True


# ---------------------------------------------------------------------------
# H0 (traced: theory param arrives as input param or provider product)
# ---------------------------------------------------------------------------
def test_h0_traced_sampled_param():
    """H0 sampled directly: the traced path reads it from the input params
    (Provider.get_param's input fallback, reference theory.py:447)."""
    info = {
        "params": {
            "ombh2": 0.02237, "omch2": 0.12, "tau": 0.0544, "logA": 3.044,
            "ns": 0.9649,
            "H0": {"prior": {"min": 55.0, "max": 80.0}, "ref": 67.36},
        },
        "theory": {"emulator": {"lmax": 64}},
        "likelihood": {"h0": {
            "class": "cobaya_tpu.likelihoods.base_classes.H0",
            "H0_mean": 73.04, "H0_std": 1.04,
        }},
    }
    model, traced, eager = assert_traced_matches_eager(info, [70.0])
    like = model.likelihood["h0"]
    assert like.jittable is True
    # the Gaussian has an exact analytic gradient through the traced path
    import jax.numpy as jnp

    fn = model.make_logposterior_fn()
    g = float(jax.grad(lambda x: fn(x)[0])(jnp.asarray([70.0]))[0])
    assert np.isclose(g, (73.04 - 70.0) / 1.04**2 + 0.0, rtol=1e-4)


def test_h0_traced_from_provider_product():
    """H0 provided by a (host-callback) theory as a derived product."""

    class H0Theory(HostBoltz):
        params = {"H0": None}

        def calculate(self, state, want_derived=True, **p):
            super().calculate(state, want_derived, **p)
            state["derived"] = {"H0": 10.0 + 600.0 * p.get("H0val", 0.1)}

    info = {
        "theory": {"mock": {"external": H0Theory}},
        "likelihood": {"h0": {
            "class": "cobaya_tpu.likelihoods.base_classes.H0",
            "H0_mean": 73.04, "H0_std": 1.04,
        }},
        "params": {
            "H0val": {"prior": [0.05, 0.2], "ref": 0.1},
            "H0": {"derived": True},
        },
    }
    assert_traced_matches_eager(info, [0.1])
