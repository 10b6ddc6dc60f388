"""Model: pipeline, parameter assignment, chi2 wiring, scripted API."""

import numpy as np
import pytest
from scipy.stats import multivariate_normal, norm

from cobaya_tpu.models.model import get_model
from cobaya_tpu.utils.log import LoggedError

QUICKSTART = {
    "likelihood": {"gaussian_mixture": {
        "means": [0.2, 0], "covs": [[0.1, 0.05], [0.05, 0.2]],
        "derived": True}},
    "params": {
        "a": {"prior": {"min": -0.5, "max": 3}},
        "b": {"prior": {"dist": "norm", "loc": 0, "scale": 1}, "ref": 0,
              "proposal": 0.5},
        "derived_a": None,
        "derived_b": None,
    },
}


def test_logposterior_parts():
    model = get_model(QUICKSTART)
    lp = model.logposterior([0.2, 0.1])
    ref_like = multivariate_normal([0.2, 0],
                                   [[0.1, 0.05], [0.05, 0.2]]).logpdf([0.2, 0.1])
    ref_prior = -np.log(3.5) + norm.logpdf(0.1)
    assert np.isclose(lp.loglikes[0], ref_like, atol=1e-5)
    assert np.isclose(lp.logprior, ref_prior, atol=1e-5)
    assert np.isclose(lp.logpost, ref_like + ref_prior, atol=1e-5)
    # dict input with same result
    lp2 = model.logposterior({"a": 0.2, "b": 0.1})
    assert np.isclose(lp2.logpost, lp.logpost)
    # out-of-prior short-circuits
    lp3 = model.logposterior([-1.0, 0.0])
    assert lp3.logpost == -np.inf
    assert all(ll == -np.inf for ll in lp3.loglikes)


def test_loglikes_api():
    model = get_model(QUICKSTART)
    loglikes, derived = model.loglikes({"a": 0.2, "b": 0.1})
    assert len(loglikes) == 1 and len(derived) == 2
    as_dict = model.loglikes({"a": 0.2, "b": 0.1}, as_dict=True)
    assert "gaussian_mixture" in as_dict[0]


def test_jit_path_matches_eager():
    import jax
    import jax.numpy as jnp

    model = get_model(QUICKSTART)
    fn = jax.jit(model.make_logposterior_fn())
    for pt in ([0.2, 0.1], [2.5, -1.0], [-1.0, 0.0]):
        eager = model.logposterior(pt)
        logpost, logpriors, loglikes, derived = fn(jnp.asarray(pt, jnp.float32))
        if np.isfinite(eager.logpost):
            assert np.isclose(float(logpost), eager.logpost, rtol=1e-4)
            assert np.allclose(np.asarray(derived), eager.derived, atol=1e-4)
        else:
            assert float(logpost) == -np.inf


def test_chi2_derived_wiring():
    info = dict(QUICKSTART)
    info["params"] = dict(QUICKSTART["params"])
    info["params"]["chi2__gaussian_mixture"] = None
    model = get_model(info)
    lp = model.logposterior([0.2, 0.1])
    idx = model.derived_names.index("chi2__gaussian_mixture")
    assert np.isclose(lp.derived[idx], -2 * lp.loglikes[0], atol=1e-5)


def test_unassigned_param_raises():
    info = {
        "likelihood": {"gauss": {"external": lambda x: -0.5 * x**2,
                                 "input_params": ["x"]}},
        "params": {"x": {"prior": [-1, 1]}, "orphan": {"prior": [0, 1]}},
    }
    with pytest.raises(LoggedError):
        get_model(info)


def test_one_likelihood_absorbs():
    info = {
        "likelihood": {
            "gauss": {"external": lambda x: -0.5 * x**2,
                      "input_params": ["x"]},
            "one": None,
        },
        "params": {"x": {"prior": [-1, 1]}, "orphan": {"prior": [0, 1]}},
    }
    model = get_model(info)
    lp = model.logposterior([0.5, 0.5])
    assert np.isfinite(lp.logpost)


def test_get_valid_point():
    model = get_model(QUICKSTART)
    point, results = model.get_valid_point(max_tries=100)
    assert np.isfinite(results.logpost)
    point2, results_dict = model.get_valid_point(
        max_tries=100, logposterior_as_dict=True
    )
    assert "loglikes" in results_dict


def test_requirements_dag():
    """A theory providing a product consumed by a likelihood."""
    from cobaya_tpu.models.theory import Theory

    class SquareTheory(Theory):
        def get_requirements(self):
            return {"x": None}

        def get_can_provide(self):
            return ["x_squared"]

        def calculate_jax(self, params, want_derived=True,
                          provider_products=None):
            return {"x_squared": params["x"] ** 2}, {}

    def like_fn(_self=None):
        return 0.0

    info = {
        "theory": {"sq": {"external": SquareTheory}},
        "likelihood": {
            "uses_sq": {
                "external": lambda x_squared=None, _self=None:
                    -0.5 * _self.provider.get_result("x_squared"),
                "requires": {"x_squared": None},
                "input_params": [],
            },
        },
        "params": {"x": {"prior": [0, 2]}},
    }
    model = get_model(info)
    lp = model.logposterior([1.5])
    assert np.isclose(lp.loglikes[0], -0.5 * 2.25, atol=1e-6)


def test_speeds_and_blocking():
    info = {
        "likelihood": {
            "slow": {"external": lambda a: -0.5 * a**2, "speed": 1,
                     "input_params": ["a"]},
            "fast": {"external": lambda a, b: -0.5 * (a + b)**2, "speed": 100,
                     "input_params": ["a", "b"]},
        },
        "params": {"a": {"prior": [-1, 1]}, "b": {"prior": [-1, 1]}},
    }
    model = get_model(info)
    blocks, oversampling = model.get_param_blocking_for_sampler(
        oversample_power=0.4
    )
    # 'a' touches both likes (slow block), 'b' only the fast one
    assert blocks == [["a"], ["b"]]
    assert oversampling[0] == 1 and oversampling[1] >= 1
    # manual blocking validation
    blocks2, factors = model.check_blocking([(1, ["a"]), (3, ["b"])])
    assert blocks2 == [["a"], ["b"]] and list(factors) == [1, 3]
    with pytest.raises(LoggedError):
        model.check_blocking([(1, ["a"])])  # missing param


def test_component_instances_in_info():
    """Ready-made component instances can be passed directly in the info
    (reference likelihood.py:275 / theory.py:399)."""
    import numpy as np

    from cobaya_tpu.models.likelihood import Likelihood
    from cobaya_tpu.models.model import get_model

    class MyLike(Likelihood):
        def logp_jax(self, params, provider_products=None):
            return -0.5 * (params["x"] - 0.4) ** 2 / 0.01, {}

    inst = MyLike({"input_params": ["x"]}, name="inst_like")
    info = {
        "likelihood": {"inst_like": inst},
        "params": {"x": {"prior": [0, 1]}},
    }
    model = get_model(info)
    assert model.likelihood["inst_like"] is inst
    lp = model.logposterior([0.5])
    assert np.isclose(lp.loglikes[0], -0.5, atol=1e-6)
    # also accepted under the 'external' key
    inst2 = MyLike({"input_params": ["x"]}, name="inst2")
    info2 = {
        "likelihood": {"inst2": {"external": inst2}},
        "params": {"x": {"prior": [0, 1]}},
    }
    assert get_model(info2).likelihood["inst2"] is inst2
