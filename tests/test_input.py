"""Input pipeline: yaml tags, defaults merging, update_info, resume diff."""

import os

import numpy as np
import pytest

from cobaya_tpu.models.input_ import (
    is_equal_info,
    load_input_dict,
    merge_params_info,
    update_info,
)
from cobaya_tpu.utils.yamlio import yaml_dump, yaml_load, yaml_load_file
from cobaya_tpu.utils.log import LoggedError


def test_yaml_scientific_floats():
    d = yaml_load("a: 1e5\nb: -2E-3\nc: 1.5e2")
    assert d == {"a": 1e5, "b": -2e-3, "c": 150.0}
    assert all(isinstance(v, float) for v in d.values())


def test_yaml_duplicate_keys_error():
    with pytest.raises(LoggedError):
        yaml_load("a: 1\na: 2")


def test_yaml_defaults_tag(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("x: 1\ny: 2\n")
    main = tmp_path / "main.yaml"
    main.write_text("defaults: !defaults [base]\nz: 3\n")
    d = yaml_load_file(str(main))
    assert d["defaults"] == {"x": 1, "y": 2}
    assert d["z"] == 3


def test_yaml_dump_numpy():
    out = yaml_dump({"a": np.float64(1.5), "b": np.array([1, 2]),
                     "c": (1, 2)})
    back = yaml_load(out)
    assert back == {"a": 1.5, "b": [1, 2], "c": [1, 2]}


def test_update_info_merges_defaults():
    info = {
        "likelihood": {"gaussian_mixture": {
            "means": [0.0], "covs": [[1.0]]}},
        "params": {"a_0": {"prior": [0, 1]}},
        "sampler": {"mcmc": None},
    }
    upd = update_info(info)
    gm = upd["likelihood"]["gaussian_mixture"]
    assert gm["derived"] is False  # from gaussian_mixture.yaml defaults
    assert gm["means"] == [0.0]  # user value kept
    mcmc = upd["sampler"]["mcmc"]
    assert mcmc["proposal_scale"] == 2.4
    assert mcmc["learn_every"] == "40d"


def test_update_info_unknown_component():
    with pytest.raises(LoggedError):
        update_info({"likelihood": {"gaussian_mixtrue": None},
                     "params": {}})


def test_merge_params_info():
    base = {"a": {"prior": [0, 1], "latex": "\\alpha"}}
    # re-specifying the prior keeps cosmetic keys
    out = merge_params_info(base, {"a": {"prior": [0, 2]}})
    assert out["a"]["prior"] == [0, 2]
    assert out["a"]["latex"] == "\\alpha"
    # fixing a sampled param drops its prior
    out = merge_params_info(base, {"a": 0.5})
    assert "prior" not in out["a"]


def test_is_equal_info():
    a = {"params": {"x": {"prior": [0, 1]}},
         "likelihood": {"one": {"noise": 0}}, "output": "foo"}
    b = {"params": {"x": {"prior": [0, 1]}},
         "likelihood": {"one": {"noise": 0}}, "output": "bar"}
    assert is_equal_info(a, b)  # output ignored
    c = {"params": {"x": {"prior": [0, 2]}},
         "likelihood": {"one": {"noise": 0}}}
    assert not is_equal_info(a, c)


def test_load_input_dict_yaml_string():
    d = load_input_dict("params:\n  x:\n    prior: [0, 1]\n")
    assert d["params"]["x"]["prior"] == [0, 1]


def test_component_nuisance_defaults_and_priors():
    """Likelihood classes ship their published nuisance-parameter defaults;
    component 'prior' blocks merge into the global prior (reference
    planck_2018_highl_plik/params_*.yaml + prior_SZ.yaml)."""
    from cobaya_tpu.models.input_ import update_info

    upd = update_info({"likelihood": {"planck_2018_highl_plik.TTTEEE": None},
                       "params": {}})
    pars = upd["params"]
    sampled = {p for p, v in pars.items()
               if isinstance(v, dict) and "prior" in v}
    # 21 sampled nuisance params in the Planck 2018 plik TTTEEE baseline
    assert len(sampled) == 21, sorted(sampled)
    for p in ("A_planck", "calib_100T", "calib_217T", "A_cib_217", "A_sz",
              "ksz_norm", "gal545_A_217", "ps_A_143_217", "galf_TE_A_217"):
        assert p in sampled, p
    # fixed EE dust amplitudes and the subpixel factors ride along
    assert pars["galf_EE_A_217"]["value"] == 0.70
    assert pars["A_sbpx_100_100_TT"] == 1
    # the joint SZ prior lands in the global prior block
    assert "SZ" in upd["prior"]
    # a user-specified prior of the same name wins
    upd2 = update_info({
        "likelihood": {"planck_2018_highl_plik.TT": None},
        "params": {}, "prior": {"SZ": "lambda A_sz: 0.0"},
    })
    assert upd2["prior"]["SZ"] == "lambda A_sz: 0.0"
    # CamSpec 2018 and 2021/NPIPE catalogs
    upd3 = update_info({"likelihood": {"planck_2018_highl_CamSpec.TT": None},
                        "params": {}})
    sampled3 = {p for p, v in upd3["params"].items()
                if isinstance(v, dict) and "prior" in v}
    assert {"aps100", "asz143", "dust143x217", "cal0", "calEE"} <= sampled3
    assert "SZ" in upd3["prior"]
    upd4 = update_info({
        "likelihood": {"planck_NPIPE_highl_CamSpec.TTTEEE": None},
        "params": {}})
    sampled4 = {p for p, v in upd4["params"].items()
                if isinstance(v, dict) and "prior" in v}
    assert {"A_planck", "amp_143", "n_217", "calTE", "calEE"} <= sampled4
    assert upd4["params"]["amp_100"] == 0


def test_des_and_clik_calib_defaults():
    """DES Y1 variants ship their photo-z/bias/shear/IA defaults; the clik
    lowl/lensing variants ship A_planck (reference des_y1/*.yaml +
    planck_calib)."""
    from cobaya_tpu.models.input_ import update_info

    upd = update_info({"likelihood": {"des_y1.joint": None}, "params": {}})
    sampled = {p for p, v in upd["params"].items()
               if isinstance(v, dict) and "prior" in v}
    assert len(sampled) == 20
    assert {"DES_DzL1", "DES_b5", "DES_DzS4", "DES_m1",
            "DES_AIA", "DES_alphaIA"} <= sampled
    assert upd["params"]["DES_z0IA"]["value"] == 0.62
    upd = update_info({"likelihood": {"des_y1.shear": None}, "params": {}})
    sampled = {p for p, v in upd["params"].items()
               if isinstance(v, dict) and "prior" in v}
    assert len(sampled) == 10 and "DES_b1" not in sampled
    for like in ("planck_2018_lowl.TT_clik", "planck_2018_lowl.EE_clik",
                 "planck_2018_lensing.clik"):
        upd = update_info({"likelihood": {like: None}, "params": {}})
        assert "prior" in upd["params"]["A_planck"], like


def test_full_planck_2018_preset_composes():
    """The reference-faithful planck_2018_camb preset builds the published
    27-sampled-parameter run (6 cosmology + 21 nuisance) with the SZ prior."""
    from cobaya_tpu.cosmo_input import create_input
    from cobaya_tpu.models.input_ import update_info

    upd = update_info(create_input(preset="planck_2018_camb"))
    sampled = [p for p, v in upd["params"].items()
               if isinstance(v, dict) and "prior" in v]
    assert len(sampled) == 27
    assert "SZ" in upd["prior"]
