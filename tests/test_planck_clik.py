"""Schema-level tests of the Planck clik wrapper against a fake clik module.

The real clik/clipy C code is not installable here; these tests pin the
wrapper's contract (reference planck_clik.py:442): lmax querying per spectrum
(incl. the lensing pp-first layout and dropped negative-lmax spectra), the
[Cl blocks..., nuisance...] input-vector assembly order, nuisance-parameter
validation, the -inf guards, and the install/is_installed hooks.
"""

import os
import sys
import types

import numpy as np
import pytest

from cobaya_tpu.likelihoods.base_classes.planck_clik import (
    PlanckClik,
    get_data_path,
    load_clipy,
)
from cobaya_tpu.models.component import ComponentNotInstalledError
from cobaya_tpu.utils.log import LoggedError

# tt, ee, bb, te, tb, eb: bb/tb/eb absent (-1)
LMAXS = (30, 20, -1, 10, -1, -1)
NUISANCE = ("A_planck", "galf_TE_A_100")


class FakeClik:
    """Mimics clipy.clik(path): lmax query + vector call."""

    lmaxs = LMAXS

    def __init__(self, path):
        if not os.path.exists(path):
            raise IOError(f"no such clik file: {path}")
        self.path = path
        self.calls = []

    @property
    def extra_parameter_names(self):
        return NUISANCE

    def get_lmax(self):
        return np.array(self.lmaxs)

    def __call__(self, vector):
        self.calls.append(np.array(vector))
        # length-1 array, like the real clik bindings
        return np.array([-0.5 * float(np.sum(np.asarray(vector) ** 2))])


class FakeClikLensing(FakeClik):
    # pp first, then the 6 Cl spectra
    lmaxs = (40,) + LMAXS


def _install_fake_clipy(monkeypatch, **attrs):
    mod = types.ModuleType("clipy")
    mod.clik = attrs.get("clik", FakeClik)
    mod.clik_lensing = attrs.get("clik_lensing", FakeClikLensing)
    mod.__version__ = "1.0"
    monkeypatch.setitem(sys.modules, "clipy", mod)
    return mod


def _make_clik_file(tmp_path, name="fake_highl.clik"):
    p = tmp_path / name
    p.write_text("fake")
    return str(p)


def _make_like(tmp_path, monkeypatch, name="fake_highl.clik", cls=PlanckClik):
    _install_fake_clipy(monkeypatch)
    path = _make_clik_file(tmp_path, name)
    like = cls({"clik_file": path}, name="planck_fake", standalone=False)
    like.initialize()
    return like


def test_lmax_query_and_requirements(tmp_path, monkeypatch):
    like = _make_like(tmp_path, monkeypatch)
    # negative-lmax spectra dropped, order preserved
    assert like.requested_cls_lmax == {"tt": 30, "ee": 20, "te": 10}
    assert like.get_requirements() == {"Cl": {"tt": 30, "ee": 20, "te": 10}}
    assert like.get_can_support_params() == list(NUISANCE)
    # vector = Cl blocks + nuisance slots
    assert like.vector.shape == (31 + 21 + 11 + len(NUISANCE),)


def test_lensing_layout(tmp_path, monkeypatch):
    like = _make_like(tmp_path, monkeypatch,
                      name="smica_lensing.clik_lensing")
    assert isinstance(like.clik, FakeClikLensing)
    assert like.requested_cls_lmax == {"pp": 40, "tt": 30, "ee": 20,
                                       "te": 10}


def test_vector_assembly_order(tmp_path, monkeypatch):
    like = _make_like(tmp_path, monkeypatch)
    cl = {
        "tt": np.arange(100, dtype=float),  # longer than lmax: truncated
        "ee": np.full(21, 2.0),
        "te": np.full(11, 3.0),
    }
    nuis = {"A_planck": 1.25, "galf_TE_A_100": -0.5}
    logp = like.log_likelihood(cl, **nuis)
    expected = np.concatenate([
        np.arange(31, dtype=float), np.full(21, 2.0), np.full(11, 3.0),
        [1.25, -0.5],
    ])
    np.testing.assert_allclose(like.clik.calls[-1], expected)
    assert logp == pytest.approx(-0.5 * float(expected @ expected))


def test_nan_cl_is_minus_inf(tmp_path, monkeypatch):
    like = _make_like(tmp_path, monkeypatch)
    cl = {"tt": np.full(31, np.nan), "ee": np.zeros(21), "te": np.zeros(11)}
    assert like.log_likelihood(cl, A_planck=1.0, galf_TE_A_100=0.0) \
        == -np.inf
    # the clik call itself must not have happened on nan input
    assert not like.clik.calls


def test_unphysical_loglike_is_minus_inf(tmp_path, monkeypatch):
    class RejectingClik(FakeClik):
        def __call__(self, vector):
            return np.array([-1e32])

    _install_fake_clipy(monkeypatch, clik=RejectingClik)
    path = _make_clik_file(tmp_path)
    like = PlanckClik({"clik_file": path}, name="planck_fake",
                      standalone=False)
    like.initialize()
    cl = {"tt": np.zeros(31), "ee": np.zeros(21), "te": np.zeros(11)}
    assert like.log_likelihood(cl, A_planck=1.0, galf_TE_A_100=0.0) \
        == -np.inf


def test_missing_nuisance_params_error(tmp_path, monkeypatch):
    like = _make_like(tmp_path, monkeypatch)
    like.input_params = ["A_planck"]  # galf_TE_A_100 missing
    with pytest.raises(LoggedError, match="galf_TE_A_100"):
        like.initialize_with_params()
    like.input_params = list(NUISANCE)
    like.initialize_with_params()  # complete set passes


def test_missing_clik_file_error(tmp_path, monkeypatch):
    _install_fake_clipy(monkeypatch)
    with pytest.raises(ComponentNotInstalledError):
        PlanckClik({"clik_file": str(tmp_path / "nope.clik")},
                   name="planck_fake", standalone=False)


def test_relative_clik_file_resolves_under_data_path(tmp_path, monkeypatch):
    _install_fake_clipy(monkeypatch)
    data = tmp_path / "data" / "planck_2018" / "baseline"
    data.mkdir(parents=True)
    (data / "x.clik").write_text("fake")
    assert get_data_path(str(tmp_path)) == str(tmp_path / "data" /
                                               "planck_2018")
    like = PlanckClik({"clik_file": "baseline/x.clik"},
                      name="planck_fake", standalone=False,
                      packages_path=str(tmp_path))
    like.initialize()
    assert like.clik.path == str(data / "x.clik")


def test_is_installed_and_load_clipy(monkeypatch):
    monkeypatch.delitem(sys.modules, "clipy", raising=False)
    monkeypatch.delitem(sys.modules, "clik", raising=False)
    assert not PlanckClik.is_installed()
    with pytest.raises(ComponentNotInstalledError):
        load_clipy()
    _install_fake_clipy(monkeypatch)
    assert PlanckClik.is_installed()
    assert load_clipy().clik is FakeClik


def test_concrete_subclasses_schema():
    """Every clik leaf declares a .clik file, aliases and nuisance params."""
    from cobaya_tpu.likelihoods.planck_2018_highl_plik.TTTEEE import TTTEEE
    from cobaya_tpu.likelihoods.planck_2018_lensing.clik import clik as lens

    assert TTTEEE.clik_file.endswith("TTTEEE.clik")
    assert "plikHM_TTTEEE" in TTTEEE.aliases
    assert "A_planck" in TTTEEE.params
    assert lens.clik_file.endswith(".clik_lensing")
    assert "lensing" in lens.aliases
