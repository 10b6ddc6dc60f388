"""DES 3x2pt likelihood on a synthetic miniature dataset with a mock theory."""

import os

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.cosmo.boltzmannbase import BoltzmannBase
from cobaya_tpu.utils.conventions import Const

NUISANCE = {
    "DES_b1": 1.5, "DES_b2": 1.5, "DES_b3": 1.5, "DES_b4": 1.5, "DES_b5": 1.5,
    "DES_DzS1": 0.0, "DES_DzS2": 0.0, "DES_DzS3": 0.0, "DES_DzS4": 0.0,
    "DES_DzL1": 0.0, "DES_DzL2": 0.0, "DES_DzL3": 0.0, "DES_DzL4": 0.0,
    "DES_DzL5": 0.0,
    "DES_m1": 0.0, "DES_m2": 0.0, "DES_m3": 0.0, "DES_m4": 0.0,
    "DES_AIA": 0.5, "DES_alphaIA": 0.0, "DES_z0IA": 0.62,
}


class MockPkLCDM(BoltzmannBase):
    """Flat-LCDM background + analytic power spectrum."""

    params = {"H0": None, "omegam": None}

    def get_can_support_params(self):
        return ["H0val", "Om", "Apk"]

    def calculate(self, state, want_derived=True, **params_values):
        H0, Om, Apk = (params_values[p] for p in ("H0val", "Om", "Apk"))
        mp = self._must_provide

        def E(z):
            return np.sqrt(Om * (1 + z) ** 3 + (1 - Om))

        def comoving(z):
            zz = np.linspace(0, z, 256)
            return Const.c_km_s / H0 * np.trapezoid(1 / E(zz), zz)

        if "Hubble" in mp:
            z = np.asarray(mp["Hubble"]["z"])
            state["Hubble"] = H0 * E(z)
        if "comoving_radial_distance" in mp:
            z = np.asarray(mp["comoving_radial_distance"]["z"])
            state["comoving_radial_distance"] = np.array(
                [comoving(zi) for zi in z]
            )
        for req in ("Pk_interpolator", "Pk_grid"):
            spec = mp.get(req)
            if spec is None:
                continue
            z = np.atleast_1d(spec.get("z", [0.0]))
            k = np.logspace(-4, np.log10(spec.get("k_max", 20.0)), 80)
            pk = Apk * 1e4 * (k[None, :] / 0.1) ** -2.0 / (
                1 + z[:, None]) ** 2
            from cobaya_tpu.theories.cosmo.boltzmannbase import _norm_pairs

            for pair in _norm_pairs(spec.get("vars_pairs")):
                for nl in (True, False):
                    state[("Pk_grid", nl) + tuple(pair)] = (z, k, pk)
        if want_derived:
            state["derived"] = {"H0": H0, "omegam": Om}
        return True


@pytest.fixture()
def des_dataset(tmp_path):
    ntheta = 5
    thetas = np.geomspace(5, 100, ntheta)  # arcmin
    np.savetxt(tmp_path / "thetas.dat", thetas)
    zmid = np.linspace(0.01, 1.5, 40)
    nz_src = np.exp(-0.5 * ((zmid - 0.6) / 0.2) ** 2)
    nz_lens = np.exp(-0.5 * ((zmid - 0.4) / 0.15) ** 2)
    # columns: z_low z_mid z_high nz_bin1...
    cols = np.column_stack([zmid - 0.01, zmid, zmid + 0.01, nz_src])
    np.savetxt(tmp_path / "nz.dat", cols)
    np.savetxt(tmp_path / "nz_gal.dat",
               np.column_stack([zmid - 0.01, zmid, zmid + 0.01, nz_lens]))
    # measurement tables: bin1 bin2 theta_ix value
    rows = [(1, 1, i + 1, 0.0) for i in range(ntheta)]
    for tp in ("xip", "xim", "gammat", "wtheta"):
        np.savetxt(tmp_path / f"{tp}.dat", np.array(rows))
    n_total = 4 * ntheta
    np.savetxt(tmp_path / "cov.dat", np.eye(n_total) * 1e-10)
    sel = ["#  type bin1 bin2 theta_min theta_max"]
    for tp in ("xip", "xim", "gammat", "wtheta"):
        sel.append(f"{tp} 1 1 2.0 300.0")
    (tmp_path / "selection.dat").write_text("\n".join(sel) + "\n")
    (tmp_path / "mini.dataset").write_text(
        "num_theta_bins = 5\n"
        "theta_bins_file = thetas.dat\n"
        "cov_file = cov.dat\n"
        "data_types = xip xim gammat wtheta\n"
        "used_data_types = xip xim gammat wtheta\n"
        "data_selection = selection.dat\n"
        "num_z_bins = 1\n"
        "num_gal_bins = 1\n"
        "measurements[xip] = xip.dat\nmeasurements[xim] = xim.dat\n"
        "measurements[gammat] = gammat.dat\n"
        "measurements[wtheta] = wtheta.dat\n"
        "nz_file = nz.dat\n"
        "nz_gal_file = nz_gal.dat\n"
    )
    return str(tmp_path / "mini.dataset")


def _model(des_dataset, l_max=2000):
    info = {
        "theory": {"mock": {"external": MockPkLCDM}},
        "likelihood": {"des": {
            "class": "cobaya_tpu.likelihoods.base_classes.des.DES",
            "dataset_file": des_dataset, "l_max": l_max,
        }},
        "params": {
            "H0val": {"prior": [60, 80], "ref": 70, "proposal": 1},
            "Om": {"prior": [0.1, 0.5], "ref": 0.3, "proposal": 0.01},
            "Apk": {"prior": [0.5, 2.0], "ref": 1.0, "proposal": 0.01},
            **{k: v for k, v in NUISANCE.items()},
        },
    }
    return get_model(info)


def test_des_theory_and_chi2(des_dataset):
    model = _model(des_dataset)
    like = model.likelihood["des"]
    point = [70.0, 0.3, 1.0]
    lp = model.logposterior(point)
    assert np.isfinite(lp.loglikes[0])
    # rebuild data := theory -> chi2 == 0
    PK = model.provider.get_Pk_interpolator(("delta_tot", "delta_tot"),
                                            extrap_kmax=3000)
    theory = like.get_theory(
        PK, None,
        bin_bias=[NUISANCE[f"DES_b{i}"] for i in range(1, 6)],
        shear_calibration_parameters=[NUISANCE[f"DES_m{i}"]
                                      for i in range(1, 5)],
        intrinsic_alignment_A=NUISANCE["DES_AIA"],
        intrinsic_alignment_alpha=NUISANCE["DES_alphaIA"],
        intrinsic_alignment_z0=NUISANCE["DES_z0IA"],
        wl_photoz_errors=[0.0] * 4, lens_photoz_errors=[0.0] * 5,
    )
    like.data_vector = like.make_vector(theory)
    assert np.isclose(like.chi_squared(theory), 0.0, atol=1e-12)
    # shear calibration scales xi+ by (1+m)^2
    theory_m = like.get_theory(
        PK, None,
        bin_bias=[NUISANCE[f"DES_b{i}"] for i in range(1, 6)],
        shear_calibration_parameters=[0.1, 0, 0, 0],
        intrinsic_alignment_A=NUISANCE["DES_AIA"],
        intrinsic_alignment_alpha=0.0, intrinsic_alignment_z0=0.62,
        wl_photoz_errors=[0.0] * 4, lens_photoz_errors=[0.0] * 5,
    )
    ratio = theory_m[0][0, 0] / theory[0][0, 0]
    assert np.allclose(ratio, 1.1**2, rtol=1e-10)
    # galaxy bias scales wtheta by b^2
    theory_b = like.get_theory(
        PK, None, bin_bias=[3.0] * 5,
        shear_calibration_parameters=[0.0] * 4,
        intrinsic_alignment_A=NUISANCE["DES_AIA"],
        intrinsic_alignment_alpha=0.0, intrinsic_alignment_z0=0.62,
        wl_photoz_errors=[0.0] * 4, lens_photoz_errors=[0.0] * 5,
    )
    assert np.allclose(theory_b[3][0, 0] / theory[3][0, 0], 4.0, rtol=1e-10)


def test_des_variant_classes_resolve():
    from cobaya_tpu.models.component import get_component_class

    for name in ("des_y1.joint", "des_y1.shear", "des_y1.clustering",
                 "des_y1.galaxy_galaxy"):
        assert get_component_class(name, kind="likelihood")
