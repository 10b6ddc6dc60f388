"""CamSpec python likelihood on a synthetic miniature dataset."""

import os

import numpy as np
import pytest

from cobaya_tpu.likelihoods.base_classes.camspec import CamSpec, range_to_ells

FG_PARAMS = {
    "aps100": 200.0, "aps143": 60.0, "aps217": 60.0, "psr": 0.5,
    "acib217": 50.0, "cibr": 0.9, "ncib": 0.0, "cibrun": 0.0,
    "asz143": 5.0, "xi": 0.1, "aksz": 1.0,
    "dust100": 1.0, "dust143": 1.0, "dust217": 1.0, "dust143x217": 1.0,
    "A_planck": 1.0,
}


def make_dataset(tmp_path, lmax=60):
    names = ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]
    lmin_all, lmax_all = 2, lmax
    # templates (start at l=2, l(l+1)Cl/2pi units); they must reach the
    # l=3000 normalization pivot used by the likelihood
    ls_full = np.arange(2, 3001)

    def write_template(fname, values):
        np.savetxt(tmp_path / fname, np.column_stack([ls_full, values]))

    write_template("sz.dat", 5 * (ls_full / 3000.0))
    write_template("ksz.dat", 3 * np.ones_like(ls_full, dtype=float))
    write_template("tszxcib.dat", 1 * (ls_full / 3000.0) ** 0.5)
    write_template("cib.dat", 20 * (ls_full / 3000.0) ** 0.8)
    for f in ("dust100.dat", "dust143.dat", "dust217.dat",
              "dust143x217.dat"):
        write_template(f, 0.1 * (ls_full / 100.0) ** -0.3)
    # fiducial theory D_l
    ell_full = np.arange(lmax + 1)
    with np.errstate(divide="ignore"):
        dl_tt = 1000.0 * (np.maximum(ell_full, 2) / 200.0) ** -0.7
    dl_te = 0.3 * dl_tt
    dl_ee = 0.1 * dl_tt
    # data = theory + foregrounds (computed after init from the like itself)
    n_per = lmax - lmin_all + 1
    spectra = np.zeros((lmax + 1, 6))
    with open(tmp_path / "ranges.dat", "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name} {lmin_all} {lmax_all}\n")
    nX = 6 * n_per
    cov = np.eye(nX) * 25.0
    cov.astype(np.float32).tofile(tmp_path / "cov.bin")
    (tmp_path / "mini.dataset").write_text(
        "cl_hat_file = spectra.dat\n"
        "data_ranges = ranges.dat\n"
        "covmat_fiducial = cov.bin\n"
        "sz143file = sz.dat\nkszfile = ksz.dat\ntszxcibfile = tszxcib.dat\n"
        "cib217file = cib.dat\ndust100file = dust100.dat\n"
        "dust143file = dust143.dat\ndust217file = dust217.dat\n"
        "dust143x217file = dust143x217.dat\n"
    )
    np.savetxt(tmp_path / "spectra.dat", spectra)
    return dl_tt, dl_te, dl_ee


def test_camspec_roundtrip(tmp_path):
    dl_tt, dl_te, dl_ee = make_dataset(tmp_path)
    like = CamSpec(
        {"dataset_file": str(tmp_path / "mini.dataset"),
         "use_cl": ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]},
        name="camspec_mini",
    )
    # build data = theory + foregrounds so chi2(theory) == 0
    fg = like.get_foregrounds(FG_PARAMS)
    lmin, lmax = 2, 60
    spectra = np.zeros((lmax + 1, 6))
    for i in range(4):
        spectra[lmin:, i] = dl_tt[lmin:] + fg[i][lmin:lmax + 1]
    spectra[lmin:, 4] = dl_te[lmin:]
    spectra[lmin:, 5] = dl_ee[lmin:]
    np.savetxt(tmp_path / "spectra.dat", spectra)
    like2 = CamSpec(
        {"dataset_file": str(tmp_path / "mini.dataset"),
         "use_cl": ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]},
        name="camspec_mini2",
    )
    chi2 = like2.chi_squared(dl_tt, dl_te, dl_ee, FG_PARAMS)
    assert np.isclose(chi2, 0.0, atol=1e-6), chi2
    # calibration miss increases chi2
    bad = dict(FG_PARAMS, A_planck=1.01)
    assert like2.chi_squared(dl_tt, dl_te, dl_ee, bad) > 1.0
    # requirements contract
    reqs = like2.get_requirements()
    assert set(reqs["Cl"]) == {"tt", "te", "ee"}


def test_camspec_use_range(tmp_path):
    dl_tt, dl_te, dl_ee = make_dataset(tmp_path)
    like = CamSpec(
        {"dataset_file": str(tmp_path / "mini.dataset"),
         "use_cl": ["143x143"], "use_range": "10-30"},
        name="camspec_range",
    )
    assert like.used_sizes[1] == 21
    assert like.data_vector.shape == (21,)


def test_range_to_ells():
    out = range_to_ells("2-5 7 10-12")
    assert list(out) == [2, 3, 4, 5, 7, 10, 11, 12]
