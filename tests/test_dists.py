"""Jittable 1D distributions vs scipy.stats ground truth."""

import numpy as np
import pytest

from cobaya_tpu.dists import get_1d_dist

SPECS = [
    [0.0, 1.0],
    {"dist": "uniform", "min": -2, "max": 5},
    {"dist": "norm", "loc": 1.5, "scale": 0.3},
    {"dist": "truncnorm", "min": -1, "max": 2},
    {"dist": "truncnorm", "a": -2, "b": 2, "loc": 0.5, "scale": 2},
    {"dist": "expon", "loc": 0.5, "scale": 2},
    {"dist": "halfnorm", "loc": 0, "scale": 1.5},
    {"dist": "beta", "a": 2, "b": 3},
    {"dist": "gamma", "a": 3, "loc": 0, "scale": 0.5},
    {"dist": "lognorm", "s": 0.5, "scale": 1.0},
]


@pytest.mark.parametrize("spec", SPECS, ids=[str(s) for s in SPECS])
def test_logpdf_matches_scipy(spec):
    import jax
    import jax.numpy as jnp

    dist = get_1d_dist(spec)
    x = np.linspace(-3, 6, 37)
    mine = np.asarray(jax.jit(dist.logpdf)(jnp.asarray(x)))
    ref = dist.scipy_dist.logpdf(x)
    finite = np.isfinite(ref)
    assert np.allclose(mine[finite], ref[finite], atol=5e-4), (
        spec, mine[finite] - ref[finite]
    )
    assert np.all(~np.isfinite(mine[~finite]))


@pytest.mark.parametrize("spec", SPECS, ids=[str(s) for s in SPECS])
def test_sampling_moments(spec):
    import jax

    dist = get_1d_dist(spec)
    s = np.asarray(dist.sample(jax.random.key(0), (20000,)))
    assert abs(s.mean() - dist.mean()) < 5 * dist.std() / np.sqrt(len(s)) + 1e-3
    assert abs(s.std() / dist.std() - 1) < 0.1


def test_delta_and_shorthand():
    d = get_1d_dist(0.7)
    assert d.support() == (0.7, 0.7)
    d2 = get_1d_dist([1, 3])
    assert d2.support() == (1.0, 3.0)


def test_invalid_specs():
    from cobaya_tpu.utils.log import LoggedError

    with pytest.raises(LoggedError):
        get_1d_dist({"dist": "nosuchdist"})
    with pytest.raises(LoggedError):
        get_1d_dist({"dist": "norm", "min": 0, "max": 1, "loc": 2})
    with pytest.raises(LoggedError):
        get_1d_dist({"min": 1, "max": 0})  # negative range
