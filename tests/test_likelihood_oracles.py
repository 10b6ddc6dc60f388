"""Independent numpy oracles for the file-backed likelihood arithmetic.

The synthetic-dataset CI tests exercise the real released-data code paths,
but data generation and consumption share helper code, so a bug in e.g. the
binning-matrix assembly could cancel out.  These tests close that hole: each
oracle re-implements the likelihood arithmetic *directly from the raw
dataset files* following the reference's published formulas (cited per
test), sharing no code with the package, and the class under test must
reproduce the oracle's chi-squared.
"""

import numpy as np
import pytest

from cobaya_tpu.likelihoods.base_classes.bao import BAO
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
