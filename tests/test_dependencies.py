"""Requirement DAG: chained providers, conditional requirements, cycles.

Mirrors /root/reference/tests/test_dependencies.py behaviors.
"""

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.models.theory import Theory
from cobaya_tpu.utils.log import LoggedError


class A(Theory):
    """Provides 'a_sq'; conditionally requires nothing."""

    def get_requirements(self):
        return {"x": None}

    def get_can_provide(self):
        return ["a_sq"]

    def calculate_jax(self, params, want_derived=True,
                      provider_products=None):
        return {"a_sq": params["x"] ** 2}, {}


class B(Theory):
    """Provides 'b_val' from A's product; declares the need only when asked
    (conditional requirement through must_provide)."""

    _needs_a = False

    def get_can_provide(self):
        return ["b_val"]

    def must_provide(self, **requirements):
        if "b_val" in requirements:
            self._needs_a = True
            return {"a_sq": None}
        return None

    def calculate_jax(self, params, want_derived=True,
                      provider_products=None):
        a_sq = provider_products["A"]["a_sq"]
        return {"b_val": 3.0 * a_sq}, {}


def like_with_b(_self=None):
    return -0.5 * _self.provider.get_result("b_val")


def test_chained_conditional_requirements():
    info = {
        "theory": {"A": {"external": A}, "B": {"external": B}},
        "likelihood": {"uses_b": {
            "external": like_with_b,
            "requires": {"b_val": None},
            "input_params": [],
        }},
        "params": {"x": {"prior": [0, 2]}},
    }
    model = get_model(info)
    # B registered its conditional requirement on A
    assert model.likelihood["uses_b"] is not None
    lp = model.logposterior([1.5])
    assert np.isclose(lp.loglikes[0], -0.5 * 3.0 * 1.5**2, atol=1e-5)
    # topological order: A before B before the likelihood
    order = [c.get_name() for c in model._component_order]
    assert order.index("A") < order.index("B") < order.index("uses_b")


def test_unprovidable_requirement_raises():
    info = {
        "likelihood": {"needs_magic": {
            "external": lambda _self=None: 0.0,
            "requires": {"magic_product": None},
            "input_params": [],
        }, "one": None},
        "params": {"x": {"prior": [0, 1]}},
    }
    with pytest.raises(LoggedError):
        get_model(info)


def test_circular_dependency_raises():
    class C1(Theory):
        def get_requirements(self):
            return {"p2": None}

        def get_can_provide(self):
            return ["p1"]

    class C2(Theory):
        def get_requirements(self):
            return {"p1": None}

        def get_can_provide(self):
            return ["p2"]

    info = {
        "theory": {"C1": {"external": C1}, "C2": {"external": C2}},
        "likelihood": {"one": None},
        "params": {"x": {"prior": [0, 1]}},
    }
    with pytest.raises(LoggedError):
        get_model(info)


def test_type_checking_enforced():
    """Strict type validation of component options (conftest enables it)."""
    from cobaya_tpu.utils import typing_

    assert typing_.enforce_type_checking
    info = {
        "likelihood": {"gaussian_mixture": {
            "means": [[0.5]], "covs": [[[0.01]]], "input_params": ["x"],
        }},
        "params": {"x": {"prior": [0, 1]}},
        "sampler": {"mcmc": {"proposal_scale": "not-a-number"}},
    }
    from cobaya_tpu.run import run

    with pytest.raises((LoggedError, TypeError)):
        run(info)


def test_helper_theories_join_dag():
    """A theory's helper (get_helper_theories) is auto-collected into the
    model (reference component.py:526): it joins the DAG, provides products
    its host consumes, and appears in the component order."""
    from cobaya_tpu.models.theory import HelperTheory

    class Doubler(HelperTheory):
        def get_requirements(self):
            return {"x": None}

        def get_can_provide(self):
            return ["two_x"]

        def calculate_jax(self, params, want_derived=True,
                          provider_products=None):
            return {"two_x": 2.0 * params["x"]}, {}

    class Host(Theory):
        def initialize(self):
            self._helpers = {"Host.doubler": Doubler(name="Host.doubler")}

        def get_helper_theories(self):
            return self._helpers

        def get_requirements(self):
            return {"two_x": None}

        def get_can_provide(self):
            return ["four_x_sq"]

        def calculate_jax(self, params, want_derived=True,
                          provider_products=None):
            two_x = provider_products["Host.doubler"]["two_x"]
            return {"four_x_sq": two_x**2}, {}

    def like(_self=None):
        return -0.5 * _self.provider.get_result("four_x_sq")

    info = {
        "theory": {"Host": {"external": Host}},
        "likelihood": {"uses_host": {
            "external": like, "requires": {"four_x_sq": None},
            "input_params": [],
        }},
        "params": {"x": {"prior": [0, 2]}},
    }
    model = get_model(info)
    names = [c.get_name() for c in model.components]
    assert "Host.doubler" in names  # helper was collected
    lp = model.logposterior([1.5])
    assert np.isclose(lp.loglikes[0], -0.5 * (2 * 1.5) ** 2, atol=1e-5)
    order = [c.get_name() for c in model._component_order]
    assert order.index("Host.doubler") < order.index("Host") \
        < order.index("uses_host")


def test_likelihood_helper_routed_to_theory_collection():
    """Helpers created by a *likelihood* land in the theory collection
    (reference likelihood.py:335), not among the likelihoods."""
    from cobaya_tpu.models.likelihood import Likelihood
    from cobaya_tpu.models.theory import HelperTheory

    class Shifter(HelperTheory):
        def get_requirements(self):
            return {"x": None}

        def get_can_provide(self):
            return ["x_shift"]

        def calculate_jax(self, params, want_derived=True,
                          provider_products=None):
            return {"x_shift": params["x"] - 0.25}, {}

    class LikeWithHelper(Likelihood):
        def initialize(self):
            self._helpers = {"shifter": Shifter(name="shifter")}

        def get_helper_theories(self):
            return self._helpers

        def get_requirements(self):
            return {"x_shift": None}

        def logp_jax(self, params, provider_products=None):
            d = provider_products["shifter"]["x_shift"]
            return -0.5 * d**2 / 0.01, {}

    info = {
        "likelihood": {"withhelper": {"external": LikeWithHelper}},
        "params": {"x": {"prior": [0, 1]}},
    }
    model = get_model(info)
    assert "shifter" in model.theory
    assert "shifter" not in model.likelihood
    lp = model.logposterior([0.35])
    assert np.isclose(lp.loglikes[0], -0.5 * 0.1**2 / 0.01, atol=1e-5)


def test_theory_derived_param_as_requirement():
    """A theory's derived param (e.g. BBN YHe) consumed by a downstream
    component, in the eager AND the traced path (reference
    test_cosmo_multi_theory.py's BBN pattern)."""
    import jax
    import jax.numpy as jnp

    from cobaya_tpu.models.likelihood import Likelihood

    class BBNish(Theory):
        def get_requirements(self):
            return {"ombh2": None}

        def get_can_provide_params(self):
            return ["YHe"]

        def calculate_jax(self, params, want_derived=True,
                          provider_products=None):
            return {}, {"YHe": 0.24 + 10.0 * params["ombh2"]}

    class YheLike(Likelihood):
        def get_requirements(self):
            return {"YHe": None}

        def logp_jax(self, params, provider_products=None):
            yhe = provider_products["BBNish"]["YHe"]
            return -0.5 * ((yhe - 0.46) / 0.01) ** 2, {}

    info = {
        "theory": {"BBNish": {"external": BBNish}},
        "likelihood": {"yhe_like": {"external": YheLike,
                                    "input_params": []}},
        "params": {"ombh2": {"prior": [0.01, 0.03]}},
    }
    model = get_model(info)
    # eager
    lp = model.logposterior([0.022])
    expected = -0.5 * ((0.24 + 0.22 - 0.46) / 0.01) ** 2
    assert np.isclose(lp.loglikes[0], expected, atol=1e-5)
    # traced (vmapped)
    fn = model.make_logposterior_fn()
    _, _, loglikes, _ = jax.vmap(fn)(jnp.asarray([[0.022], [0.021]]))
    assert np.isclose(float(loglikes[0, 0]), expected, atol=1e-4)
    assert not np.isclose(float(loglikes[1, 0]), expected, atol=1e-4)
