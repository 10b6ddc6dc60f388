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
    return make_matrix_dataset(tmp_path)


def make_matrix_dataset(tmp_path):
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
            # raw dimensionless Cl (BoltzmannBase contract)
            from cobaya_tpu.utils.conventions import Const

            muK2 = (Const.T_CMB * 1e6) ** 2
            cl = dl * 2 * _np.pi / _np.maximum(ells * (ells + 1), 1) / muK2
            state["Cl"] = {"ell": ells, "bb": cl}
            if want_derived:
                state["derived"] = {}
            return True

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


def test_bicep_bandpass_integration(tmp_path):
    """Bandpass-integrated scalings: a narrow top-hat approaches the
    delta-bandpass analytic scaling; wide bands differ (color correction);
    band-center errors reduce to 1 at gamma = 0."""
    import numpy as np

    from cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018 import (
        dust_scaling_bandpass,
        greybody_scaling,
        load_bandpass,
        sync_scaling,
        sync_scaling_bandpass,
    )

    # narrow top-hat at 150 GHz
    nu = np.linspace(149.5, 150.5, 11)
    np.savetxt(tmp_path / "narrow.txt",
               np.column_stack([nu, np.ones_like(nu)]))
    bp = load_bandpass(str(tmp_path / "narrow.txt"))
    assert np.isclose(bp.nu_bar, 150.0, atol=1e-6)
    f_d = dust_scaling_bandpass(1.59, 19.6, bp)
    f_s = sync_scaling_bandpass(-3.1, bp)
    assert np.isclose(f_d, greybody_scaling(150.0, 1.59, 19.6), rtol=1e-4)
    assert np.isclose(f_s, sync_scaling(150.0, -3.1), rtol=1e-4)
    # wide band: color correction shifts the scaling away from the
    # band-center delta value
    nu_w = np.linspace(120, 180, 121)
    np.savetxt(tmp_path / "wide.txt",
               np.column_stack([nu_w, np.ones_like(nu_w)]))
    bp_w = load_bandpass(str(tmp_path / "wide.txt"))
    f_d_w = dust_scaling_bandpass(1.59, 19.6, bp_w)
    assert not np.isclose(f_d_w, greybody_scaling(bp_w.nu_bar, 1.59, 19.6),
                          rtol=1e-4)
    # band-center error continuous at err -> 1
    f_err = dust_scaling_bandpass(1.59, 19.6, bp_w, bandcenter_err=1.0001)
    assert np.isclose(f_err, f_d_w, rtol=1e-3)


def test_bicep_decorrelation():
    import numpy as np

    from cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018 import (
        decorrelation,
    )

    rat = np.array([0.5, 1.0, 2.0])
    # delta = 1: no decorrelation
    assert np.allclose(decorrelation(1.0, 95, 150, [217, 353], rat), 1.0)
    # at the pivot pair, flat lform returns delta itself
    assert np.isclose(decorrelation(0.97, 217, 353, [217, 353], 1.0), 0.97)
    # lin lform decreases correlation with ell
    d = decorrelation(0.97, 95, 220, [217, 353], rat, "lin")
    assert d[2] < d[1] < d[0] <= 1.0
    assert np.all(d > 0)  # exponential remap keeps it positive
    # non-physical delta > 1 branch stays above 1
    assert decorrelation(1.02, 217, 353, [217, 353], 1.0) > 1.0


def test_bicep_bandpass_files_in_likelihood(matrix_dataset, tmp_path):
    """End-to-end: BK likelihood with measured bandpass files and
    decorrelation evaluates finitely and decorrelation changes logp."""
    files = {}
    for name, center in zip(("95", "150"), (95.0, 150.0)):
        nu = np.linspace(center * 0.9, center * 1.1, 41)
        path = tmp_path / f"bp_{name}.txt"
        np.savetxt(path, np.column_stack([nu, np.ones_like(nu)]))
        files[name] = str(path)
    info = _theory_info(
        matrix_dataset,
        cls="cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018",
        extra={"bandpass_files": files, "lform_dust_decorr": "lin"},
    )
    fg = {"BBdust": 3.0, "BBsync": 1.0, "BBalphadust": -0.42,
          "BBbetadust": 1.59, "BBalphasync": -0.6, "BBbetasync": -3.1,
          "BBdustsynccorr": 0.2, "BBTdust": 19.6}
    info["params"].update(fg)
    model = get_model(info)
    like = list(model.likelihood.values())[0]
    assert all(bp is not None for bp in like.bandpasses)
    assert np.isclose(like.map_freqs[0], 95.0, atol=0.5)
    lp0 = model.logposterior([1.0]).loglikes[0]
    assert np.isfinite(lp0)
    # decorrelation lowers cross-frequency foreground power -> different logp
    info2 = _theory_info(
        matrix_dataset,
        cls="cobaya_tpu.likelihoods.bicep_keck_2018.bicep_keck_2018",
        extra={"bandpass_files": files, "lform_dust_decorr": "lin"},
    )
    info2["params"].update(dict(fg, delta_dust=0.9))
    lp1 = get_model(info2).logposterior([1.0]).loglikes[0]
    assert np.isfinite(lp1) and not np.isclose(lp0, lp1)
