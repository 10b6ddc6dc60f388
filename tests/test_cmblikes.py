"""CMBlikes bandpower likelihood with a synthetic dataset + mock Cl theory."""

import os

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.cosmo.boltzmannbase import BoltzmannBase


class MockCls(BoltzmannBase):
    """Toy CMB theory: D_l^TT = A * (l/200)^-0.5 * 1000 muK2-ish."""

    def get_can_support_params(self):
        return ["Acmb"]

    def calculate(self, state, want_derived=True, **params_values):
        A = params_values["Acmb"]
        lmax = max(self._must_provide.get("Cl", {}).values() or [100])
        ells = np.arange(lmax + 1)
        with np.errstate(divide="ignore"):
            dl = A * 1000.0 * (np.maximum(ells, 1) / 200.0) ** -0.5
        dl[:2] = 0
        # store raw dimensionless Cl (BoltzmannBase contract): get_Cl
        # applies the ell factor and the muK2 unit conversion
        from cobaya_tpu.utils.conventions import Const

        muK2 = (Const.T_CMB * 1e6) ** 2
        cl = dl * 2 * np.pi / np.maximum(ells * (ells + 1), 1) / muK2
        state["Cl"] = {"ell": ells, "tt": cl}
        if want_derived:
            state["derived"] = {}
        return True


@pytest.fixture()
def dataset_dir(tmp_path):
    # synthetic bandpowers generated from the A=1 model
    lmin = np.arange(2, 200, 20)
    lmax = lmin + 19
    nbins = len(lmin)
    dls = []
    for l0, l1 in zip(lmin, lmax):
        ells = np.arange(l0, l1 + 1)
        dls.append(np.mean(1000.0 * (ells / 200.0) ** -0.5))
    bp = np.column_stack([lmin, lmax, dls])
    np.savetxt(tmp_path / "bandpowers.dat", bp)
    cov = np.diag(np.full(nbins, 25.0))
    np.savetxt(tmp_path / "cov.dat", cov)
    (tmp_path / "toy.dataset").write_text(
        "use_cl = tt\n"
        "cl_hat_file = bandpowers.dat\n"
        "covmat_fiducial = cov.dat\n"
    )
    return str(tmp_path)


def test_cmblikes_recovers_amplitude(dataset_dir):
    info = {
        "theory": {"mock": {"external": MockCls}},
        "likelihood": {"toy_cmb": {
            "class": "cobaya_tpu.likelihoods.base_classes.CMBlikes",
            "dataset_file": os.path.join(dataset_dir, "toy.dataset"),
        }},
        "params": {"Acmb": {"prior": [0.5, 2.0], "ref": 1.0,
                            "proposal": 0.01}},
    }
    model = get_model(info)
    lp_true = model.logposterior([1.0]).loglikes[0]
    assert np.isclose(lp_true, 0.0, atol=1e-4)  # data == theory at A=1
    lp_off = model.logposterior([1.1]).loglikes[0]
    assert lp_off < lp_true - 1


def test_cmblikes_calibration_param(dataset_dir):
    info = {
        "theory": {"mock": {"external": MockCls}},
        "likelihood": {"toy_cmb": {
            "class": "cobaya_tpu.likelihoods.base_classes.CMBlikes",
            "dataset_file": os.path.join(dataset_dir, "toy.dataset"),
            "calibration_param": "cal",
        }},
        "params": {
            "Acmb": {"prior": [0.5, 2.0], "ref": 1.0, "proposal": 0.01},
            "cal": {"prior": [0.9, 1.1], "ref": 1.0, "proposal": 0.001},
        },
    }
    model = get_model(info)
    # A = cal^2 leaves the likelihood invariant
    lp1 = model.logposterior([1.0, 1.0]).loglikes[0]
    lp2 = model.logposterior([1.05**2, 1.05]).loglikes[0]
    assert np.isclose(lp1, lp2, atol=1e-4)


def test_cmblikes_hl_and_exact(dataset_dir, tmp_path):
    # add fiducial file = data (so HL pivot = data)
    import shutil

    d = tmp_path / "hl"
    shutil.copytree(dataset_dir, d, dirs_exist_ok=True)
    bp = np.loadtxt(os.path.join(dataset_dir, "bandpowers.dat"))
    np.savetxt(d / "fiducial.dat", bp)
    (d / "hl.dataset").write_text(
        "use_cl = tt\n"
        "like_approx = HL\n"
        "cl_hat_file = bandpowers.dat\n"
        "cl_fiducial_file = fiducial.dat\n"
        "covmat_fiducial = cov.dat\n"
    )
    (d / "exact.dataset").write_text(
        "use_cl = tt\n"
        "like_approx = exact\n"
        "fsky = 0.5\n"
        "cl_hat_file = bandpowers.dat\n"
        "covmat_fiducial = cov.dat\n"
    )
    for ds, atol in (("hl.dataset", 1e-6), ("exact.dataset", 1e-6)):
        info = {
            "theory": {"mock": {"external": MockCls}},
            "likelihood": {"cmb": {
                "class": "cobaya_tpu.likelihoods.base_classes.CMBlikes",
                "dataset_file": os.path.join(str(d), ds),
            }},
            "params": {"Acmb": {"prior": [0.5, 2.0], "ref": 1.0,
                                "proposal": 0.01}},
        }
        model = get_model(info)
        lp_true = model.logposterior([1.0]).loglikes[0]
        # theory == data at A=1 -> both HL and exact chi2 vanish
        assert np.isclose(lp_true, 0.0, atol=atol), (ds, lp_true)
        lp_off = model.logposterior([1.2]).loglikes[0]
        assert lp_off < -1
