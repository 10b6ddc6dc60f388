"""Matrix-HL CMB likelihood + BICEP-Keck foreground model (synthetic)."""

import os

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model


def _write_matrix_rows(path, mats):
    rows = []
    for b, M in enumerate(mats):
        n = M.shape[0]
        for i in range(n):
            for j in range(i + 1):
                rows.append((b + 1, i + 1, j + 1, M[i, j]))
    np.savetxt(path, np.array(rows))


class MockBB:
    """Builds a toy BB theory dict."""

    @staticmethod
    def dl(lmax, A):
        ells = np.arange(lmax + 1, dtype=float)
        with np.errstate(divide="ignore"):
            out = A * 0.1 * (np.maximum(ells, 2) / 80.0) ** -0.5
        out[:2] = 0
        return out


@pytest.fixture()
def matrix_dataset(tmp_path):
    nbins, nmaps = 4, 2
    lmin = np.array([20, 60, 100, 140])
    lmax = np.array([59, 99, 139, 179])
    dl = MockBB.dl(180, 1.0)
    theory_binned = np.array([
        dl[l0:l1 + 1].mean() for l0, l1 in zip(lmin, lmax)
    ])
    mats = [np.full((nmaps, nmaps), t) for t in theory_binned]
    noise = [np.eye(nmaps) * 0.01 for _ in range(nbins)]
    _write_matrix_rows(tmp_path / "chat.dat", mats)
    _write_matrix_rows(tmp_path / "cfid.dat", mats)
    _write_matrix_rows(tmp_path / "noise.dat", noise)
    n_el = nbins * 3  # pairs: (0,0), (1,0), (1,1)
    np.savetxt(tmp_path / "cov.dat", np.eye(n_el) * 1e-4)
    (tmp_path / "bk.dataset").write_text(
        "map_names = 95 150\n"
        "nbins = 4\n"
        f"bin_lmin = {' '.join(map(str, lmin))}\n"
        f"bin_lmax = {' '.join(map(str, lmax))}\n"
        "like_approx = HL\n"
        "field = bb\n"
        "cl_hat_file = chat.dat\n"
        "cl_fiducial_file = cfid.dat\n"
        "cl_noise_file = noise.dat\n"
        "covmat_fiducial = cov.dat\n"
    )
    return str(tmp_path / "bk.dataset")


def _theory_info(dataset, cls="cobaya_tpu.likelihoods.base_classes."
                               "cmblikes_matrix.CMBlikesMatrix", extra=None):
    import numpy as _np

    from cobaya_tpu.theories.cosmo.boltzmannbase import BoltzmannBase

    class MockClsBB(BoltzmannBase):
        def get_can_support_params(self):
            return ["Abb"]

        def calculate(self, state, want_derived=True, **params_values):
            lmax = max(self._must_provide.get("Cl", {}).values() or [180])
            dl = MockBB.dl(lmax, params_values["Abb"])
            ells = _np.arange(lmax + 1)
            cl = dl * 2 * _np.pi / _np.maximum(ells * (ells + 1), 1)
            state["Cl"] = {"ell": ells, "bb": cl}
            if want_derived:
                state["derived"] = {}
            return True

        def get_Cl(self, ell_factor=False, units="muK2"):
            cl = dict(self.current_state["Cl"])
            if ell_factor:
                ells = cl["ell"]
                fac = ells * (ells + 1) / (2 * _np.pi)
                return {"ell": ells, "bb": cl["bb"] * fac}
            return cl

    like_info = {"class": cls, "dataset_file": dataset}
    like_info.update(extra or {})
    return {
        "theory": {"mock": {"external": MockClsBB}},
        "likelihood": {"bk": like_info},
        "params": {"Abb": {"prior": [0.1, 3.0], "ref": 1.0,
                           "proposal": 0.01}},
    }


def test_matrix_hl_zero_at_truth(matrix_dataset):
    model = get_model(_theory_info(matrix_dataset))
    lp_true = model.logposterior([1.0]).loglikes[0]
    assert np.isclose(lp_true, 0.0, atol=1e-8), lp_true
    lp_off = model.logposterior([1.3]).loglikes[0]
    assert lp_off < -1


def test_matrix_hl_transform_properties():
    from cobaya_tpu.likelihoods.base_classes.cmblikes_matrix import (
        CMBlikesMatrix,
        _matrix_sqrt,
    )

    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3))
    Chat = A @ A.T + np.eye(3)
    Cfhalf = _matrix_sqrt(Chat)
    # X(C=Chat) == 0
    X = CMBlikesMatrix.hl_transform(Chat, Chat, Cfhalf)
    assert np.allclose(X, 0, atol=1e-10)
    # near C=Chat the transform linearizes to Chat - C
    C = Chat * 1.001
    X = CMBlikesMatrix.hl_transform(C, Chat, Cfhalf)
    assert np.allclose(X, Chat - C, rtol=0.01)


def test_bicep_foreground_scalings():
    from cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018 import (
        greybody_scaling,
        sync_scaling,
    )

    # scaling is 1 at the pivots
    assert np.isclose(greybody_scaling(353.0, 1.59, 19.6), 1.0)
    assert np.isclose(sync_scaling(23.0, -3.1), 1.0)
    # dust dims toward lower frequency, sync dims toward higher
    assert greybody_scaling(95.0, 1.59, 19.6) < 1.0
    assert sync_scaling(95.0, -3.1) < 1.0
    assert sync_scaling(95.0, -3.1) < sync_scaling(40.0, -3.1)


def test_bicep_likelihood_with_foregrounds(matrix_dataset, tmp_path):
    # extend the dataset with map frequencies
    with open(matrix_dataset, "a") as f:
        f.write("map_freqs_ghz = 95 150\n")
    info = _theory_info(
        matrix_dataset,
        cls="cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018",
    )
    fg = {"BBdust": 3.0, "BBsync": 1.0, "BBalphadust": -0.42,
          "BBbetadust": 1.59, "BBalphasync": -0.6, "BBbetasync": -3.1,
          "BBdustsynccorr": 0.2, "BBTdust": 19.6}
    info["params"].update({k: v for k, v in fg.items()})
    model = get_model(info)
    # the foreground params were fixed by the overrides: only Abb is sampled
    lp = model.logposterior([1.0])
    assert np.isfinite(lp.logpost)
    # foregrounds strictly increase the theory BB power
    like = model.likelihood["bk"]
    cls = model.provider.get_Cl(ell_factor=True, units="muK2")
    params = dict(zip(
        ["BBdust", "BBsync", "BBalphadust", "BBbetadust", "BBalphasync",
         "BBbetasync", "BBdustsynccorr"],
        [3.0, 1.0, -0.42, 1.59, -0.6, -3.1, 0.2],
    ))
    params["BBTdust"] = 19.6
    with_fg = like.get_binned_theory(cls, params)
    no_fg = like.get_binned_theory(cls, dict(params, BBdust=0, BBsync=0,
                                             BBdustsynccorr=0))
    assert np.all(with_fg >= no_fg - 1e-12)
    assert with_fg[0, 0, 0] > no_fg[0, 0, 0]
