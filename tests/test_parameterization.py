"""Parameterization: roles, shorthands, dynamic parameters, derived params.

Mirrors /root/reference/tests/test_parameterization.py behavior checks.
"""

import numpy as np
import pytest

from cobaya_tpu.models.model import get_model
from cobaya_tpu.models.parameterization import (
    Parameterization,
    expand_info_param,
    is_derived_param,
    is_fixed_or_function_param,
    is_sampled_param,
)
from cobaya_tpu.utils.log import LoggedError

x_func = lambda x_prime: x_prime / 3
e_func = lambda b, c, d, x_prime: b**2 + c**2 + d**2 + x_prime**2


def test_expand_shorthands():
    assert expand_info_param(0.5) == {"value": 0.5}
    assert expand_info_param([0, 1]) == {"prior": [0, 1]}
    info = expand_info_param([0, 1, 0.5, 0.1])
    assert info["prior"] == [0, 1] and info["ref"] == [0.5, 0.1]
    info = expand_info_param([0, 1, 0.5, 0.1, 0.05])
    assert info["proposal"] == 0.05
    assert expand_info_param(None) == {"derived": True}
    assert is_sampled_param({"prior": [0, 1]})
    assert is_fixed_or_function_param(3.14)
    assert is_derived_param(None)
    with pytest.raises(LoggedError):
        expand_info_param([1, 2, 3])


def test_roles_and_translation():
    p = Parameterization({
        "a": {"prior": [0, 1]},
        "b": 0.5,
        "c": "lambda a, b: a + b",
        "d": {"value": x_func, "derived": False},  # d = x_prime/3? uses arg name
        "x_prime": {"prior": [0, 2], "drop": True},
        "e": None,  # pure output
        "f": {"derived": "lambda a, e: a * e"},
    })
    assert list(p.sampled_params()) == ["a", "x_prime"]
    assert p.constant_params() == {"b": 0.5}
    inp = p.to_input({"a": 0.25, "x_prime": 0.9})
    assert np.isclose(inp["c"], 0.75)
    assert np.isclose(inp["d"], 0.3)
    # dynamic input params ('c') are saved as derived by default
    der = p.to_derived({"e": 2.0}, inp)
    assert set(der) == {"c", "e", "f"}
    assert np.isclose(der["c"], 0.75)
    assert np.isclose(der["f"], 0.5)


def test_input_func_dependency_order():
    p = Parameterization({
        "a": {"prior": [0, 1]},
        "c": {"value": "lambda b: 2 * b", "derived": False},
        "b": {"value": "lambda a: a + 1", "derived": False},
    })
    inp = p.to_input({"a": 1.0})
    assert np.isclose(inp["c"], 4.0)


def test_circular_dependency_raises():
    with pytest.raises(LoggedError):
        Parameterization({
            "a": {"prior": [0, 1]},
            "b": {"value": "lambda c: c", "derived": False},
            "c": {"value": "lambda b: b", "derived": False},
        })


def test_input_funcs_cannot_use_outputs():
    with pytest.raises(LoggedError):
        Parameterization({
            "a": {"prior": [0, 1]},
            "b": {"value": "lambda not_an_input: not_an_input",
                  "derived": False},
        })


def test_check_sampled_renames():
    p = Parameterization({
        "a": {"prior": [0, 1], "renames": ["alpha"]},
    })
    assert p.check_sampled_dict(alpha=0.3) == {"a": 0.3}
    with pytest.raises(LoggedError):
        p.check_sampled_dict(beta=0.3)


def test_dynamic_params_in_model():
    """Sampled param feeding likelihood through a traced lambda."""
    info = {
        "params": {
            "x": {"prior": [0, 2]},
            "y": {"value": "lambda x: x**2", "derived": True},
        },
        "likelihood": {
            "gauss": {
                "external": lambda y: -0.5 * (y - 1.0) ** 2,
                "input_params": ["y"],
            }
        },
    }
    model = get_model(info)
    lp = model.logposterior([1.2])
    assert np.isclose(lp.loglikes[0], -0.5 * (1.44 - 1) ** 2, atol=1e-6)
    assert np.isclose(lp.derived[0], 1.44, atol=1e-6)
    # jitted path agrees
    import jax
    import jax.numpy as jnp

    fn = jax.jit(model.make_logposterior_fn())
    out = fn(jnp.array([1.2]))
    assert np.isclose(float(out[0]), lp.logpost, atol=1e-5)
