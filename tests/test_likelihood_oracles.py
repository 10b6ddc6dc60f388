"""Independent numpy oracles for the file-backed likelihood arithmetic.

The synthetic-dataset CI tests exercise the real released-data code paths,
but data generation and consumption share helper code, so a bug in e.g. the
binning-matrix assembly could cancel out.  These tests close that hole: each
oracle re-implements the likelihood arithmetic *directly from the raw
dataset files* following the reference's published formulas (cited per
test), sharing no code with the package, and the class under test must
reproduce the oracle's chi-squared.
"""

import os

import numpy as np
import pytest

from cobaya_tpu.likelihoods.base_classes.bao import BAO
from cobaya_tpu.likelihoods.base_classes.camspec import CamSpec
from cobaya_tpu.likelihoods.base_classes.cmblikes import CMBlikes
from cobaya_tpu.likelihoods.base_classes.cmblikes_matrix import CMBlikesMatrix
from cobaya_tpu.likelihoods.base_classes.planck_pliklite import PlanckPlikLite
from cobaya_tpu.likelihoods.base_classes.sn import SN


# ---------------------------------------------------------------------------
# plik-lite: per-bin window dot products + Gaussian form
# (reference planck_pliklite.py:143-155 get_chi_squared)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def plik_dir(tmp_path_factory):
    from cobaya_tpu.theories.emulator.mockdata import make_pliklite_dataset

    path = tmp_path_factory.mktemp("plik_oracle")
    ini = make_pliklite_dataset(str(path), lmin=30, lmax=300, seed=4)
    return path, ini


def _plik_oracle_chi2(path, cls, calib, use_cl=("tt", "te", "ee")):
    """Reference get_chi_squared re-implemented from the raw files only."""
    ini = {}
    for line in (path / "pliklite_synthetic.dataset").read_text().splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            ini[k.strip()] = v.strip()
    L0 = int(ini["bin_lmin_offset"])
    nbins = {"tt": int(ini["nbintt"]), "te": int(ini["nbinte"]),
             "ee": int(ini["nbinee"])}
    data = np.loadtxt(path / ini["data"])
    blmin = np.loadtxt(path / ini["blmin"]).astype(int) + L0
    blmax = np.loadtxt(path / ini["blmax"]).astype(int) + L0
    w = np.loadtxt(path / ini["weights"])
    ls = np.arange(len(w)) + L0
    w = w * 2 * np.pi / ls / (ls + 1)  # windows act on D_l
    w = np.concatenate([np.zeros(L0), w])
    cov = np.loadtxt(path / ini["cov_file"])
    # per-bin dot products, exactly the reference's loop
    used, binned = [], []
    offset = 0
    for name in ("tt", "te", "ee"):
        nb = nbins[name]
        if name in use_cl:
            for i in range(nb):
                sl = slice(blmin[i], blmax[i] + 1)
                binned.append(np.dot(cls[name][sl], w[sl]))
            used.extend(range(offset, offset + nb))
        offset += nb
    used = np.array(used)
    X = data[used, 1]
    invcov = np.linalg.inv(cov[np.ix_(used, used)])
    delta = X - np.asarray(binned) / calib**2
    return float(delta @ invcov @ delta)


@pytest.mark.parametrize("use_cl", [("tt", "te", "ee"), ("tt",),
                                    ("te", "ee")])
def test_pliklite_matches_raw_file_oracle(plik_dir, use_cl):
    path, ini = plik_dir
    lmax = 300
    rng = np.random.default_rng(8)
    ells = np.arange(lmax + 1).astype(float)
    base = 1000.0 * (np.maximum(ells, 2) / 200.0) ** -0.6
    cls = {"tt": base * (1 + 0.02 * rng.standard_normal(lmax + 1)),
           "te": 0.3 * base, "ee": 0.1 * base}
    calib = 1.003
    like = PlanckPlikLite(
        {"dataset_file": ini, "use_cl": list(use_cl)}, name="plik_oracle")
    ours = like.get_chi_squared(cls, calib)
    oracle = _plik_oracle_chi2(path, cls, calib, use_cl)
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)
    # (traced logp_jax agreement with the eager path is covered by
    # tests/test_traced_likelihoods.py::test_pliklite_traced_matches_eager)


# ---------------------------------------------------------------------------
# BAO generic: measurement rows + covariance quadratic form
# (reference bao.py:416-477 logp)
# ---------------------------------------------------------------------------
def test_bao_matches_raw_file_oracle(tmp_path, monkeypatch):
    rows = [(0.38, 10.27, "DM_over_rs"), (0.38, 24.89, "Hz_rs"),
            (0.61, 15.33, "DM_over_rs"), (0.61, 22.43, "Hz_rs")]
    with open(tmp_path / "meas.txt", "w") as f:
        f.write("# z value quantity\n")
        for z, v, q in rows:
            f.write(f"{z} {v} bao_{q}\n")
    rng = np.random.default_rng(9)
    A = rng.normal(size=(4, 4))
    cov = A @ A.T + 4 * np.eye(4)
    np.savetxt(tmp_path / "cov.txt", cov)
    like = BAO({"measurements_file": str(tmp_path / "meas.txt"),
                "cov_file": str(tmp_path / "cov.txt"),
                "path": str(tmp_path)}, name="bao_oracle")
    # theory stub: deterministic function of (quantity, z), no provider
    theory = {("DM_over_rs", 0.38): 10.5, ("Hz_rs", 0.38): 24.5,
              ("DM_over_rs", 0.61): 15.1, ("Hz_rs", 0.61): 22.9}
    monkeypatch.setattr(
        BAO, "theory_value",
        lambda self, q, z: theory[(q, round(float(z), 2))])
    ours = like.logp()
    # oracle straight from the files
    m = np.array([v for _, v, _ in rows])
    t = np.array([theory[(q, z)] for z, _, q in rows])
    delta = t - m
    oracle = -0.5 * delta @ np.linalg.inv(np.loadtxt(tmp_path / "cov.txt")) \
        @ delta
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)
    # quantity prefixes were stripped, rows ordered as in the file
    assert like.quantities == [q for _, _, q in rows]


def test_bao_invcov_and_errors_paths(tmp_path, monkeypatch):
    """The three covariance sources (cov_file / invcov_file / per-row
    errors) must agree when they describe the same matrix."""
    rows = [(0.15, 4.47, 0.17, "DV_over_rs")]
    with open(tmp_path / "meas.txt", "w") as f:
        f.write("0.15 4.47 0.17 DV_over_rs\n")
    np.savetxt(tmp_path / "cov.txt", np.array([[0.17**2]]))
    np.savetxt(tmp_path / "invcov.txt", np.array([[1 / 0.17**2]]))
    monkeypatch.setattr(BAO, "theory_value", lambda self, q, z: 4.6)
    logps = []
    for opts in ({"cov_file": str(tmp_path / "cov.txt")},
                 {"invcov_file": str(tmp_path / "invcov.txt")},
                 {}):
        like = BAO({"measurements_file": str(tmp_path / "meas.txt"),
                    "path": str(tmp_path), **opts},
                   name="bao_oracle2")
        logps.append(like.logp())
    oracle = -0.5 * ((4.6 - 4.47) / 0.17) ** 2
    np.testing.assert_allclose(logps, oracle, rtol=1e-9)


# ---------------------------------------------------------------------------
# SN: analytic absolute-magnitude marginalization
# (reference sn.py:286-361 alpha_beta_logp, simple-mode branch)
# ---------------------------------------------------------------------------
def test_sn_marginalized_chi2_matches_analytic_oracle(tmp_path):
    rng = np.random.default_rng(10)
    n = 12
    z = np.sort(rng.uniform(0.02, 1.0, n))
    mag = 5 * np.log10((1 + z) * 3000 * z) + 25 + rng.normal(0, 0.1, n)
    dmag = rng.uniform(0.08, 0.2, n)
    # simple two-file mode: plain numeric columns (z, mag, dmag)
    np.savetxt(tmp_path / "sn.txt", np.column_stack([z, mag, dmag]))
    like = SN({"data_file": str(tmp_path / "sn.txt"),
               "path": str(tmp_path)}, name="sn_oracle")
    lumdists = 5 * np.log10((1 + z) * 2990 * z)
    ours = like.alpha_beta_logp(lumdists)
    # oracle: chi2 of (mag - mu - M) with M profiled out analytically,
    # including the log-det normalization of the Gaussian integral:
    # chi2 = A - B^2/E + log(E/2pi), A = d^T C^-1 d, B = 1^T C^-1 d,
    # E = 1^T C^-1 1 (d = mag - lumdists - Mhat, any Mhat shift cancels)
    invcov = np.diag(1.0 / dmag**2)
    invvars = 1.0 / dmag**2
    mhat = np.sum((mag - lumdists) * invvars) / np.sum(invvars)
    d = mag - lumdists - mhat
    A = d @ invcov @ d
    B = np.sum(invcov @ d)
    E = invcov.sum()
    oracle = -0.5 * (A + np.log(E / (2 * np.pi)) - B**2 / E)
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)
    # with use_abs_mag the same formula at fixed M (no profiling of M)
    like_mb = SN({"data_file": str(tmp_path / "sn.txt"),
                  "path": str(tmp_path), "use_abs_mag": True},
                 name="sn_oracle_mb")
    Mb = -19.2
    ours_mb = like_mb.alpha_beta_logp(lumdists, Mb=Mb)
    d = mag - lumdists - (Mb + 25)
    A = d @ invcov @ d
    B = np.sum(invcov @ d)
    oracle_mb = -0.5 * (A + np.log(E / (2 * np.pi)))
    np.testing.assert_allclose(ours_mb, oracle_mb, rtol=1e-10)

# ---------------------------------------------------------------------------
# CamSpec: published foreground model + calibrations + dense covariance
# (reference planck_2018_CamSpec_python.py:210-311: get_foregrounds,
# get_cals, chi_squared)
# ---------------------------------------------------------------------------
CAMSPEC_NAMES = ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]
CAMSPEC_FG = {
    "aps100": 210.0, "aps143": 55.0, "aps217": 62.0, "psr": 0.7,
    "acib217": 48.0, "cibr": 0.85, "ncib": 0.3, "cibrun": -0.1,
    "asz143": 4.5, "xi": 0.15, "aksz": 1.8,
    "dust100": 1.1, "dust143": 0.9, "dust217": 1.2, "dust143x217": 1.05,
    "A_planck": 1.002, "cal0": 0.997, "cal2": 1.004,
    "calTE": 0.995, "calEE": 1.006,
}


@pytest.fixture(scope="module")
def camspec_raw_dir(tmp_path_factory):
    """A miniature CamSpec-format dataset written as raw files only
    (dense float64 binary covariance, per-spectrum ell ranges)."""
    path = tmp_path_factory.mktemp("camspec_oracle")
    rng = np.random.default_rng(12)
    lmins = [30, 30, 50, 40, 30, 35]
    lmaxs = [260, 300, 280, 300, 290, 300]
    lmax_all = max(lmaxs)
    # foreground templates: two columns (l, D_l) starting at l=2, reaching
    # past the l=3000 pivot
    ls_t = np.arange(2, 3201)

    def wtemp(fname, values):
        np.savetxt(path / fname, np.column_stack([ls_t, values]))

    wtemp("sz143.dat", 5.5 * (ls_t / 3000.0) ** 0.85)
    wtemp("ksz.dat", 2.5 + 0.5 * (ls_t / 3000.0))
    wtemp("tszxcib.dat", 1.7 * (ls_t / 3000.0) ** 0.55)
    wtemp("cib217.dat", 55.0 * (ls_t / 3000.0) ** 0.75)
    for f, amp in (("dust100.dat", 5.0), ("dust143.dat", 7.0),
                   ("dust217.dat", 50.0), ("dust143x217.dat", 18.0)):
        wtemp(f, amp * (ls_t / 200.0) ** -0.35)
    # data spectra: arbitrary smooth + noise columns (the oracle test does
    # not care that data looks like the theory)
    ells = np.arange(lmax_all + 1, dtype=float)
    base = 2200.0 * (np.maximum(ells, 2) / 220.0) ** -0.55
    spectra = np.column_stack([
        base * f + rng.normal(0, 20, lmax_all + 1)
        for f in (1.1, 1.0, 1.3, 1.05, 0.35, 0.12)
    ])
    np.savetxt(path / "spectra.dat", spectra)
    with open(path / "ranges.dat", "w") as f:
        for name, lo, hi in zip(CAMSPEC_NAMES, lmins, lmaxs):
            f.write(f"{name} {lo} {hi}\n")
    nX = sum(hi - lo + 1 for lo, hi in zip(lmins, lmaxs))
    # banded SPD covariance (correlations exercise the used-index slicing)
    cov = np.eye(nX) * 30.0
    off = rng.uniform(0.5, 2.0, nX - 1)
    cov[np.arange(nX - 1), np.arange(1, nX)] = off
    cov[np.arange(1, nX), np.arange(nX - 1)] = off
    cov.astype(np.float64).tofile(path / "cov64.bin")
    ini = path / "camspec_oracle.dataset"
    ini.write_text(
        "cl_hat_file = spectra.dat\ndata_ranges = ranges.dat\n"
        "covmat_fiducial = cov64.bin\n"
        "sz143file = sz143.dat\nkszfile = ksz.dat\n"
        "tszxcibfile = tszxcib.dat\ncib217file = cib217.dat\n"
        "dust100file = dust100.dat\ndust143file = dust143.dat\n"
        "dust217file = dust217.dat\ndust143x217file = dust143x217.dat\n"
    )
    return path, str(ini)


def _camspec_oracle_chi2(path, CT, CTE, CEE, p, use_cl, use_range=None):
    """chi^2 from the raw dataset files only, re-implementing the
    published CamSpec foreground/calibration model
    (planck_2018_CamSpec_python.py:210-311)."""
    ini = {}
    for line in (path / "camspec_oracle.dataset").read_text().splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            ini[k.strip()] = v.strip()
    names, lmins, lmaxs = [], [], []
    for line in (path / ini["data_ranges"]).read_text().splitlines():
        name, lo, hi = line.split()
        names.append(name)
        lmins.append(int(lo))
        lmaxs.append(int(hi))
    spectra = np.loadtxt(path / ini["cl_hat_file"])

    def template(key, pivot=None):
        dat = np.loadtxt(path / ini[key])
        assert int(dat[0, 0]) == 2
        full = np.concatenate([[0.0, 0.0], dat[:, 1]])
        return full / full[pivot] if pivot else full

    lmax_all = max(lmaxs)
    ls = np.arange(lmax_all + 1, dtype=float)
    llp1 = ls * (ls + 1)
    lnrat = np.log(np.maximum(ls, 1) / 3000.0)
    sz143 = template("sz143file", 3000)[:lmax_all + 1]
    ksz_t = template("kszfile", 3000)[:lmax_all + 1]
    tszxcib = template("tszxcibfile", 3000)[:lmax_all + 1]
    cib217 = template("cib217file", 3000)[:lmax_all + 1]
    dust = np.stack([template(f"dust{k}file")[:lmax_all + 1]
                     for k in ("100", "143", "217", "143x217")])
    # foregrounds, exactly the published formulas
    sz_bp100, cib_bp143, sz_bp143, cib_bp217 = 2.022, 1.134, 0.95, 1.33
    aps = np.array([p["aps100"], p["aps143"], p["aps217"],
                    p["psr"] * np.sqrt(p["aps143"] * p["aps217"])])
    aps = aps * 1e-6 / 9
    acib143 = 0.094 * p["acib217"] / cib_bp143 * cib_bp217
    cl_cib = np.exp(p["ncib"] * lnrat + p["cibrun"] * lnrat**2 / 2) * cib217
    ksz = p["aksz"] * ksz_t
    a_sz = p["asz143"] * sz_bp143
    a_cib143 = acib143 * cib_bp143
    a_cib217 = p["acib217"] * cib_bp217
    fg = np.empty((4, lmax_all + 1))
    fg[0] = ksz + p["asz143"] * sz_bp100 * sz143
    fg[1] = (a_cib143 * cl_cib + ksz + a_sz * sz143
             - 2 * np.sqrt(a_cib143 * a_sz) * p["xi"] * tszxcib)
    fg[2] = a_cib217 * cl_cib + ksz
    fg[3] = (p["cibr"] * np.sqrt(a_cib143 * a_cib217) * cl_cib + ksz
             - np.sqrt(a_cib217 * a_sz) * p["xi"] * tszxcib)
    fg += np.array([p["dust100"], p["dust143"], p["dust217"],
                    p["dust143x217"]])[:, None] * dust
    fg += np.outer(aps, llp1)
    cals = np.array([p["cal0"], 1.0, p["cal2"], np.sqrt(p["cal2"]),
                     p["calTE"], p["calEE"]]) * p["A_planck"] ** 2
    # data vector, used indices, dense covariance
    nX = sum(hi - lo + 1 for lo, hi in zip(lmins, lmaxs))
    cov = np.fromfile(path / ini["covmat_fiducial"],
                      dtype=np.float64).reshape(nX, nX)
    data, deltas, used = [], [], []
    offset = 0
    theory = [None, None, None, None, CTE, CEE]
    for i, (name, lo, hi) in enumerate(zip(names, lmins, lmaxs)):
        ell = np.arange(lo, hi + 1)
        if name in use_cl:
            if use_range is not None:
                ell = ell[np.isin(ell, use_range)]
            model = (CT[ell] + fg[i][ell] if i <= 3
                     else theory[i][ell]) / cals[i]
            deltas.append(spectra[ell, i] - model)
            used.append(ell - lo + offset)
        offset += hi - lo + 1
    used = np.concatenate(used)
    delta = np.concatenate(deltas)
    invcov = np.linalg.inv(cov[np.ix_(used, used)])
    return float(delta @ invcov @ delta)


@pytest.mark.parametrize("use_cl,use_range", [
    (CAMSPEC_NAMES, None),
    (["143x143", "217x217", "143x217"], None),
    (["TE", "EE"], None),
    (CAMSPEC_NAMES, "30-120 150 200-260"),
])
def test_camspec_matches_raw_file_oracle(camspec_raw_dir, use_cl, use_range):
    path, ini = camspec_raw_dir
    lmax = 300
    rng = np.random.default_rng(13)
    ells = np.arange(lmax + 1, dtype=float)
    CT = 2000.0 * (np.maximum(ells, 2) / 220.0) ** -0.5 \
        + rng.normal(0, 5, lmax + 1)
    CTE = 0.4 * CT + rng.normal(0, 2, lmax + 1)
    CEE = 0.15 * CT + rng.normal(0, 1, lmax + 1)
    opts = {"dataset_file": ini, "use_cl": list(use_cl)}
    if use_range:
        opts["use_range"] = use_range
    like = CamSpec(opts, name="camspec_oracle")
    ours = like.chi_squared(CT, CTE, CEE, CAMSPEC_FG)
    from cobaya_tpu.likelihoods.base_classes.camspec import range_to_ells

    oracle = _camspec_oracle_chi2(
        path, CT, CTE, CEE, CAMSPEC_FG, use_cl,
        use_range=range_to_ells(use_range) if use_range else None)
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


# ---------------------------------------------------------------------------
# CMBlikes (scalar): windowed bandpowers, calibration, noise, HL / exact
# (reference cmblikes.py:560-620: scalar branch of transform_and_chisq)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def cmblikes_raw_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cmblikes_oracle")
    rng = np.random.default_rng(14)
    nbins, lmax = 6, 151
    lmin_b = np.array([2, 27, 52, 77, 102, 127])
    lmax_b = lmin_b + 24
    # non-trivial (non-top-hat) window functions
    win = np.zeros((nbins, lmax + 1))
    for i, (l0, l1) in enumerate(zip(lmin_b, lmax_b)):
        w = np.hanning(l1 - l0 + 1) + 0.05
        win[i, l0:l1 + 1] = w / w.sum()
    np.savetxt(path / "windows.dat", win)
    ells = np.arange(lmax + 1, dtype=float)
    fid_tt = 1200.0 * (np.maximum(ells, 2) / 200.0) ** -0.6
    fid_ee = 0.1 * fid_tt
    fid_b = np.column_stack([win @ fid_tt, win @ fid_ee])
    noise_b = np.column_stack([np.full(nbins, 8.0), np.full(nbins, 2.5)])
    data_b = fid_b * rng.uniform(0.9, 1.1, fid_b.shape) + noise_b
    np.savetxt(path / "bandpowers.dat",
               np.column_stack([lmin_b, lmax_b, data_b]))
    np.savetxt(path / "fiducial.dat",
               np.column_stack([lmin_b, lmax_b, fid_b]))
    np.savetxt(path / "noise.dat",
               np.column_stack([lmin_b, lmax_b, noise_b]))
    n = 2 * nbins
    A = rng.normal(size=(n, n))
    cov = 0.5 * A @ A.T + n * np.eye(n)
    np.savetxt(path / "cov.dat", cov)
    for approx in ("HL", "gaussian", "exact"):
        (path / f"{approx}.dataset").write_text(
            "use_cl = tt ee\n"
            f"like_approx = {approx}\n"
            "fsky = 0.57\n"
            "cl_hat_file = bandpowers.dat\n"
            "cl_fiducial_file = fiducial.dat\n"
            "cl_noise_file = noise.dat\n"
            "window_file = windows.dat\n"
            "covmat_fiducial = cov.dat\n"
            "calibration_param = acal\n"
        )
    return path


@pytest.mark.parametrize("approx", ["HL", "gaussian", "exact"])
def test_cmblikes_scalar_matches_raw_file_oracle(cmblikes_raw_dir, approx):
    path = cmblikes_raw_dir
    lmax = 151
    ells = np.arange(lmax + 1, dtype=float)
    theory = {"tt": 1100.0 * (np.maximum(ells, 2) / 200.0) ** -0.55,
              "ee": 105.0 * (np.maximum(ells, 2) / 200.0) ** -0.65}
    cal = 1.02
    like = CMBlikes({"dataset_file": str(path / f"{approx}.dataset")},
                    name=f"cmblikes_oracle_{approx}")
    ours = like.log_likelihood(theory, acal=cal)
    # oracle straight from the files
    win = np.loadtxt(path / "windows.dat")
    bp = np.loadtxt(path / "bandpowers.dat")
    lmin_b, lmax_b, data = bp[:, 0], bp[:, 1], bp[:, 2:4]
    noise = np.loadtxt(path / "noise.dat")[:, 2:4]
    fid = np.loadtxt(path / "fiducial.dat")[:, 2:4]
    cov = np.loadtxt(path / "cov.dat")
    binned = np.column_stack([win @ theory["tt"], win @ theory["ee"]])
    C = binned / cal**2 + noise
    if approx == "exact":
        L = ((lmin_b + lmax_b) / 2)[:, None]
        rat = data / C
        oracle = -0.5 * np.sum(
            (2 * L + 1) * 0.57 * (rat - 1 - np.log(rat)))
    elif approx == "HL":
        rat = data / C
        g = np.sign(rat - 1) * np.sqrt(2 * (rat - np.log(rat) - 1))
        x = (g * (fid + noise)).reshape(-1)
        oracle = -0.5 * x @ np.linalg.inv(cov) @ x
    else:
        d = (C - data).reshape(-1)
        oracle = -0.5 * d @ np.linalg.inv(cov) @ d
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


# ---------------------------------------------------------------------------
# CMBlikesMatrix: matrix Hamimeche-Lewis / Wishart over map cross-spectra
# (reference cmblikes.py:591,630-690: transform, matrix_ahat, exact_chi_sq)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def matrix_raw_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cmblikes_matrix_oracle")
    rng = np.random.default_rng(15)
    nmaps, nbins, lmax = 3, 5, 199
    lmin_b = np.array([20, 56, 92, 128, 164])
    lmax_b = lmin_b + 35
    ells = np.arange(lmax + 1, dtype=float)
    dl = 0.12 * (np.maximum(ells, 2) / 80.0) ** -0.45
    fid_b = np.array([dl[l0:l1 + 1].mean()
                      for l0, l1 in zip(lmin_b, lmax_b)])

    def rows(fname, mats):
        out = []
        for b, M in enumerate(mats):
            for i in range(nmaps):
                for j in range(i + 1):
                    out.append((b + 1, i + 1, j + 1, M[i, j]))
        np.savetxt(path / fname, np.array(out))

    cfid = [t * np.ones((nmaps, nmaps)) for t in fid_b]
    noise = [np.diag([0.01, 0.02, 0.04]) for _ in range(nbins)]
    chat = []
    for b in range(nbins):
        # perturbed SPD observation per bin
        P = rng.normal(0, 0.1 * fid_b[b], (nmaps, nmaps))
        M = cfid[b] + (P + P.T) / 2
        chat.append(M + noise[b] + 0.05 * fid_b[b] * np.eye(nmaps))
    rows("chat.dat", [c - n for c, n in zip(chat, noise)])
    rows("cfid.dat", cfid)
    rows("noise.dat", noise)
    n_el = nbins * 6  # all pairs of 3 maps
    A = rng.normal(size=(n_el, n_el))
    cov = 1e-4 * (0.3 * A @ A.T + n_el * np.eye(n_el))
    np.savetxt(path / "cov.dat", cov)
    for approx in ("HL", "exact", "gaussian"):
        (path / f"{approx}.dataset").write_text(
            "map_names = 95 150 220\n"
            "nbins = 5\n"
            f"bin_lmin = {' '.join(map(str, lmin_b))}\n"
            f"bin_lmax = {' '.join(map(str, lmax_b))}\n"
            f"like_approx = {approx}\n"
            "fsky = 0.43\n"
            "field = bb\n"
            "cl_hat_file = chat.dat\n"
            "cl_fiducial_file = cfid.dat\n"
            "cl_noise_file = noise.dat\n"
            "covmat_fiducial = cov.dat\n"
        )
    return path, lmax


def _read_rows(path, nbins, nmaps):
    out = np.zeros((nbins, nmaps, nmaps))
    for b, i, j, v in np.loadtxt(path, ndmin=2):
        b, i, j = int(b) - 1, int(i) - 1, int(j) - 1
        out[b, i, j] = out[b, j, i] = v
    return out


def _eigh_fn(M, f):
    w, U = np.linalg.eigh(M)
    return U @ np.diag(f(w)) @ U.T


@pytest.mark.parametrize("approx", ["HL", "exact", "gaussian"])
def test_cmblikes_matrix_matches_raw_file_oracle(matrix_raw_dir, approx):
    path, lmax = matrix_raw_dir
    nmaps, nbins = 3, 5
    ells = np.arange(lmax + 1, dtype=float)
    theory_dl = 0.14 * (np.maximum(ells, 2) / 80.0) ** -0.5
    like = CMBlikesMatrix(
        {"dataset_file": str(path / f"{approx}.dataset")},
        name=f"matrix_oracle_{approx}")
    ours = like.log_likelihood({"bb": theory_dl})
    # oracle from the raw files
    chat = _read_rows(path / "chat.dat", nbins, nmaps)
    cfid = _read_rows(path / "cfid.dat", nbins, nmaps)
    noise = _read_rows(path / "noise.dat", nbins, nmaps)
    cov = np.loadtxt(path / "cov.dat")
    bp = (path / f"{approx}.dataset").read_text()
    lmin_b = np.array([20, 56, 92, 128, 164])
    lmax_b = lmin_b + 35
    binned = np.array([theory_dl[l0:l1 + 1].mean()
                       for l0, l1 in zip(lmin_b, lmax_b)])
    pairs = [(i, j) for i in range(nmaps) for j in range(i + 1)]
    if approx == "exact":
        chisq = 0.0
        for b in range(nbins):
            C = binned[b] * np.ones((nmaps, nmaps)) + noise[b]
            M = np.linalg.solve(C, chat[b] + noise[b])
            L = (lmin_b[b] + lmax_b[b]) / 2
            chisq += (2 * L + 1) * 0.43 * (
                np.trace(M) - nmaps - np.linalg.slogdet(M)[1])
        oracle = -0.5 * chisq
    else:
        els = []
        for b in range(nbins):
            C = binned[b] * np.ones((nmaps, nmaps)) + noise[b]
            Chatb = chat[b] + noise[b]
            if approx == "HL":
                inv_root = _eigh_fn(C, lambda w: 1 / np.sqrt(w))
                fid_half = _eigh_fn(cfid[b] + noise[b], np.sqrt)
                D, V = np.linalg.eigh(inv_root @ Chatb @ inv_root)
                g = np.sign(D - 1) * np.sqrt(2 * (D - np.log(D) - 1))
                X = fid_half @ (V @ np.diag(g) @ V.T) @ fid_half.T
            else:
                X = C - Chatb
            els.extend(X[i, j] for i, j in pairs)
        x = np.asarray(els)
        oracle = -0.5 * x @ np.linalg.inv(cov) @ x
    np.testing.assert_allclose(ours, oracle, rtol=1e-8)
    assert "like_approx" in bp


# ---------------------------------------------------------------------------
# DES 3x2pt: measurement ordering, per-(type, bin-pair) angular cuts, and
# covariance subsetting (reference des.py:103-186 load + make_vector)
# ---------------------------------------------------------------------------
def test_des_cuts_and_chi2_match_raw_file_oracle(tmp_path):
    from cobaya_tpu.likelihoods.base_classes.des import DES

    rng = np.random.default_rng(16)
    ntheta = 6
    thetas = np.geomspace(3, 150, ntheta)  # arcmin
    np.savetxt(tmp_path / "thetas.dat", thetas)
    zmid = np.linspace(0.01, 1.5, 40)
    cols = np.column_stack([zmid - 0.01, zmid, zmid + 0.01,
                            np.exp(-0.5 * ((zmid - 0.5) / 0.2) ** 2),
                            np.exp(-0.5 * ((zmid - 0.8) / 0.2) ** 2),
                            np.exp(-0.5 * ((zmid - 1.1) / 0.2) ** 2)])
    np.savetxt(tmp_path / "nz.dat", cols)
    np.savetxt(tmp_path / "nz_gal.dat", cols[:, :5])
    # measurement tables: rows (bin1 bin2 theta_ix value), bin pairs differ
    # per type, values are arbitrary but reproducible
    bin_pairs = {"xip": [(1, 1), (2, 1), (2, 2), (3, 3)],
                 "xim": [(1, 1), (2, 1), (2, 2), (3, 3)],
                 "gammat": [(1, 1), (1, 2), (2, 3)],
                 "wtheta": [(1, 1), (2, 2)]}
    meas = {}
    for tp, pairs in bin_pairs.items():
        rows = [(b1, b2, i + 1, rng.uniform(0.5, 2.0))
                for b1, b2 in pairs for i in range(ntheta)]
        meas[tp] = np.array(rows)
        np.savetxt(tmp_path / f"{tp}.dat", meas[tp])
    n_total = sum(len(v) for v in meas.values())
    A = rng.normal(size=(n_total, n_total))
    fullcov = 1e-2 * (0.2 * A @ A.T + n_total * np.eye(n_total))
    np.savetxt(tmp_path / "cov.dat", fullcov)
    # angular cuts: vary per type and bin pair; (3,3) of xim and (2,2) of
    # wtheta are ABSENT from the selection -> fully excluded
    sel_lines = ["#  type bin1 bin2 theta_min theta_max",
                 "xip 1 1 4.0 120.0", "xip 2 1 7.0 300.0",
                 "xip 2 2 2.0 60.0", "xip 3 3 2.0 300.0",
                 "xim 1 1 30.0 300.0", "xim 2 1 2.0 300.0",
                 "xim 2 2 10.0 100.0",
                 "gammat 1 1 5.0 300.0", "gammat 1 2 2.0 80.0",
                 "gammat 2 3 2.0 300.0",
                 "wtheta 1 1 8.0 300.0"]
    (tmp_path / "selection.dat").write_text("\n".join(sel_lines) + "\n")
    (tmp_path / "mini.dataset").write_text(
        "num_theta_bins = 6\n"
        "theta_bins_file = thetas.dat\n"
        "cov_file = cov.dat\n"
        "data_types = xip xim gammat wtheta\n"
        "used_data_types = xip xim gammat wtheta\n"
        "data_selection = selection.dat\n"
        "num_z_bins = 3\n"
        "num_gal_bins = 2\n"
        "measurements[xip] = xip.dat\nmeasurements[xim] = xim.dat\n"
        "measurements[gammat] = gammat.dat\n"
        "measurements[wtheta] = wtheta.dat\n"
        "nz_file = nz.dat\n"
        "nz_gal_file = nz_gal.dat\n"
    )
    like = DES({"dataset_file": str(tmp_path / "mini.dataset")},
               name="des_oracle")

    # synthetic "theory" correlation functions: deterministic f(tp, b1, b2, ix)
    def tval(t_ix, b1, b2, ix):
        return 1.0 + 0.1 * t_ix + 0.01 * b1 + 0.003 * b2 + 0.07 * ix

    arrays = []
    for t_ix, (tp, pairs) in enumerate(bin_pairs.items()):
        corr = np.empty((3, 3), dtype=object)
        for b1, b2 in pairs:
            corr[b1 - 1, b2 - 1] = np.array(
                [tval(t_ix, b1 - 1, b2 - 1, ix) for ix in range(ntheta)])
        arrays.append(corr)
    ours = like.chi_squared(arrays)

    # oracle: rebuild the used-element selection straight from the files
    sel = {}
    for line in sel_lines[1:]:
        tp, b1, b2, lo, hi = line.split()
        sel[(tp, int(b1) - 1, int(b2) - 1)] = (float(lo), float(hi))
    data_vec, theory_vec, used = [], [], []
    cov_ix = 0
    for t_ix, tp in enumerate(("xip", "xim", "gammat", "wtheta")):
        for b1, b2, th_ix, val in meas[tp]:
            b1, b2, th_ix = int(b1) - 1, int(b2) - 1, int(th_ix) - 1
            cut = sel.get((tp, b1, b2))
            if cut is not None and cut[0] < thetas[th_ix] < cut[1]:
                used.append(cov_ix)
                data_vec.append(val)
                theory_vec.append(tval(t_ix, b1, b2, th_ix))
            cov_ix += 1
    used = np.array(used)
    assert len(used) < n_total  # the cuts actually removed elements
    delta = np.array(data_vec) - np.array(theory_vec)
    invcov = np.linalg.inv(fullcov[np.ix_(used, used)])
    oracle = float(delta @ invcov @ delta)
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


# ---------------------------------------------------------------------------
# Planck low-l TT (Gaussianized Gibbs): spline transform + Jacobian +
# Gaussian form + fiducial offset (reference planck_2018_lowl/TT.py:100-130)
# ---------------------------------------------------------------------------
def test_lowT_matches_raw_file_oracle(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_traced_likelihoods import _lowT_package

    from cobaya_tpu.likelihoods.planck_2018_lowl.TT import TT

    path = _lowT_package(tmp_path)
    like = TT({"path": path}, name="lowT_oracle")
    lmin, lmax = 2, 29
    n = lmax - lmin + 1
    ells = np.arange(lmin, lmax + 1, dtype=float)
    cls_full = np.zeros(lmax + 1)
    cls_full[lmin:] = 1050.0 * (ells / 200.0) ** -0.58
    calib = 1.01
    ours = like.log_likelihood(cls_full, calib)
    # oracle straight from the files (scipy splines are library code)
    from scipy.interpolate import InterpolatedUnivariateSpline

    cov = np.loadtxt(os.path.join(path, "cov.txt"))[:n, :n]
    mu = np.loadtxt(os.path.join(path, "mu.txt"))[:n]
    mu_sigma = np.loadtxt(os.path.join(path, "mu_sigma.txt"))[:n]
    knots = np.loadtxt(os.path.join(path, "cl2x_1.txt"))[:, :n]
    vals = np.loadtxt(os.path.join(path, "cl2x_2.txt"))[:, :n]
    invcov = np.linalg.inv(cov)
    splines = [InterpolatedUnivariateSpline(knots[:, i], vals[:, i])
               for i in range(n)]

    def oracle_raw(theory):
        x = np.array([s(c) for s, c in zip(splines, theory)])
        jac = sum(np.log(s.derivative()(c))
                  for s, c in zip(splines, theory))
        d = x - mu
        return jac - 0.5 * d @ invcov @ d

    oracle = oracle_raw(cls_full[lmin:] / calib**2) - oracle_raw(mu_sigma)
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)
    # out-of-range theory (beyond the saturated spline region) -> -inf
    assert like.log_likelihood(cls_full * 5.0, calib) == -np.inf


# ---------------------------------------------------------------------------
# BAO grid likelihoods: tabulated chi2(alpha) and 2-D/3-D probability grids
# (reference bao.py:179-236 prob_dist/grid interpolators, logp dispatch)
# ---------------------------------------------------------------------------
def test_bao_prob_dist_matches_raw_file_oracle(tmp_path, monkeypatch):
    from scipy.interpolate import UnivariateSpline

    chi2_tab = 12.0 * (np.linspace(-1, 1, 151)) ** 2 \
        + 0.8 * np.sin(np.linspace(0, 6, 151))
    np.savetxt(tmp_path / "prob.txt", chi2_tab)
    lo, hi = 3.0, 7.0
    like = BAO({"measurements_file": None,
                "data": [0.15, 4.5, 0.2, "DV_over_rs"],
                "prob_dist": str(tmp_path / "prob.txt"),
                "prob_dist_bounds": [lo, hi],
                "path": str(tmp_path)}, name="bao_prob_oracle")
    theory_val = 4.83
    monkeypatch.setattr(BAO, "theory_value",
                        lambda self, q, z: theory_val)
    ours = like.logp()
    alpha = np.linspace(lo, hi, len(chi2_tab))
    oracle = float(UnivariateSpline(alpha, -chi2_tab / 2, s=0)(theory_val))
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)
    # outside the tabulated bounds -> -inf
    monkeypatch.setattr(BAO, "theory_value", lambda self, q, z: hi + 0.5)
    assert like.logp() == -np.inf


def test_bao_grid2d_matches_raw_file_oracle(tmp_path, monkeypatch):
    from scipy.interpolate import RectBivariateSpline

    x = np.linspace(5.0, 25.0, 31)
    y = np.linspace(10.0, 40.0, 33)
    xx, yy = np.meshgrid(x, y, indexing="ij")
    p = np.exp(-0.5 * (((xx - 14) / 2.5) ** 2 + ((yy - 22) / 3.5) ** 2)
               + 0.05 * np.sin(xx) * np.cos(yy))
    np.savetxt(tmp_path / "grid2.txt",
               np.column_stack([xx.ravel(), yy.ravel(), p.ravel()]))
    like = BAO({"grid_file": str(tmp_path / "grid2.txt"),
                "redshift": 0.51,
                "observable_1": "DM_over_rs",
                "observable_2": "DH_over_rs",
                "path": str(tmp_path)}, name="bao_grid2_oracle")
    vals = {"DM_over_rs": 13.7, "DH_over_rs": 23.9}
    monkeypatch.setattr(BAO, "theory_value",
                        lambda self, q, z: vals[q])
    ours = like.logp()
    oracle = float(RectBivariateSpline(
        x, y, np.log(p), kx=3, ky=3)(vals["DM_over_rs"],
                                     vals["DH_over_rs"])[0][0])
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


def test_bao_grid3d_matches_raw_file_oracle(tmp_path, monkeypatch):
    from scipy.interpolate import RegularGridInterpolator

    x = np.linspace(5.0, 25.0, 13)
    y = np.linspace(10.0, 40.0, 11)
    z = np.linspace(0.2, 0.8, 9)
    xx, yy, zz = np.meshgrid(x, y, z, indexing="ij")
    p = np.exp(-0.5 * (((xx - 14) / 3) ** 2 + ((yy - 22) / 4) ** 2
                       + ((zz - 0.45) / 0.1) ** 2))
    np.savetxt(tmp_path / "grid3.txt",
               np.column_stack([xx.ravel(), yy.ravel(), zz.ravel(),
                                p.ravel()]))
    like = BAO({"grid_file": str(tmp_path / "grid3.txt"),
                "redshift": 0.7,
                "observable_1": "DM_over_rs",
                "observable_2": "DH_over_rs",
                "observable_3": "f_sigma8",
                "path": str(tmp_path)}, name="bao_grid3_oracle")
    vals = {"DM_over_rs": 15.2, "DH_over_rs": 21.1, "f_sigma8": 0.43}
    monkeypatch.setattr(BAO, "theory_value",
                        lambda self, q, z: vals[q])
    ours = like.logp()
    oracle = float(RegularGridInterpolator(
        (x, y, z), np.log(p.reshape(13, 11, 9) + 1e-300))(
        [vals["DM_over_rs"], vals["DH_over_rs"], vals["f_sigma8"]])[0])
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


# ---------------------------------------------------------------------------
# SN full JLA mode: alpha/beta covariance assembly + profiled-scriptm chi2
# (reference sn.py:238-361: inverse_covariance_matrix + alpha_beta_logp)
# ---------------------------------------------------------------------------
def test_jla_alpha_beta_matches_raw_file_oracle(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_traced_likelihoods import _jla_style_dataset

    info = _jla_style_dataset(tmp_path, marginalize=False)
    like = SN({"dataset_file": str(tmp_path / "jla.dataset"),
               "path": str(tmp_path),
               "alpha_beta_names": ["alpha_jla", "beta_jla"]},
              name="jla_oracle")
    n = like.nsn
    rng = np.random.default_rng(17)
    lumdists = 5 * np.log10(np.linspace(0.1, 0.9, n) * 3900
                            * (1 + np.linspace(0.1, 0.9, n)))
    alpha, beta = 0.145, 3.09
    ours = like.alpha_beta_logp(lumdists, alpha, beta)
    # oracle: parse the light-curve file + covariance components directly
    lines = (tmp_path / "lc.txt").read_text().splitlines()
    cols = lines[0][1:].split()
    table = np.array([[float(v) for v in ln.split()[1:]]
                      for ln in lines[1:] if ln.strip()])
    col = {c: table[:, i - 1] for i, c in enumerate(cols) if c != "name"}
    ini = dict(
        ln.split("=", 1) for ln in
        (tmp_path / "jla.dataset").read_text().splitlines() if "=" in ln)
    ini = {k.strip(): v.strip() for k, v in ini.items()}
    pecz = float(ini["pecz"])
    zfacsq = 25.0 / np.log(10.0) ** 2
    zcmb, mag, dmb = col["zcmb"], col["mb"], col["dmb"]
    x1, color = col["x1"], col["color"]
    dx1, dcolor = col["dx1"], col["dcolor"]
    cms, cmc, csc = col["cov_m_s"], col["cov_m_c"], col["cov_s_c"]
    pre_vars = dmb**2 + zfacsq * pecz**2 * (
        (1.0 + zcmb) / (zcmb * (1 + 0.5 * zcmb))) ** 2
    C = (np.loadtxt(tmp_path / ini["mag_covmat_file"])
         + alpha**2 * np.loadtxt(tmp_path / ini["stretch_covmat_file"])
         + beta**2 * np.loadtxt(tmp_path / ini["colour_covmat_file"]))
    diag_extra = (pre_vars + alpha**2 * dx1**2 + beta**2 * dcolor**2
                  + 2 * alpha * cms - 2 * beta * cmc
                  - 2 * alpha * beta * csc)
    C = C + np.diag(diag_extra)
    invvars = 1.0 / diag_extra
    scriptm = np.sum((mag - lumdists) * invvars) / np.sum(invvars)
    diffmag = mag - lumdists + alpha * x1 - beta * color - scriptm
    invC = np.linalg.inv(C)
    wt = invC @ diffmag
    A = wt @ diffmag
    B = np.sum(wt)
    E = np.sum(invC)
    oracle = -0.5 * (A + np.log(E / (2 * np.pi)) - B**2 / E)
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)
    del rng
