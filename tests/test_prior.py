"""Prior: 1D + external priors, bounds, reference pdfs, periodic wrap."""

import numpy as np
import pytest
from scipy import stats

from cobaya_tpu.models.parameterization import Parameterization
from cobaya_tpu.models.prior import Prior
from cobaya_tpu.utils.log import LoggedError


def make_prior(params, info_prior=None):
    return Prior(Parameterization(params), info_prior)


def test_1d_priors_match_scipy():
    prior = make_prior({
        "a": {"prior": [0, 2]},
        "b": {"prior": {"dist": "norm", "loc": 1, "scale": 2}},
        "c": {"prior": {"dist": "beta", "a": 2, "b": 2}},
    })
    x = np.array([0.3, -1.0, 0.6])
    expected = (
        stats.uniform(0, 2).logpdf(0.3)
        + stats.norm(1, 2).logpdf(-1.0)
        + stats.beta(2, 2).logpdf(0.6)
    )
    assert np.isclose(prior.logps_internal(x), expected, atol=1e-5)
    # out of bounds -> -inf
    assert prior.logps_internal(np.array([-0.1, 0, 0.5])) == -np.inf


def test_external_prior():
    prior = make_prior(
        {"a": {"prior": [0, 2]}, "b": {"prior": [0, 1]}},
        {"corr": "lambda a, b: -0.5 * (a - b)**2"},
    )
    assert prior.names == ["0", "corr"]
    logps = prior.logps(np.array([0.5, 0.2]))
    assert np.isclose(logps[1], -0.5 * 0.09, atol=1e-6)


def test_bounds_and_confidence():
    prior = make_prior({
        "a": {"prior": [0, 2]},
        "b": {"prior": {"dist": "norm", "loc": 0, "scale": 1}},
    })
    b = prior.bounds()
    assert b[0, 0] == 0 and b[0, 1] == 2
    assert not np.isfinite(b[1, 0])
    b2 = prior.bounds(confidence_for_unbounded=0.95)
    assert np.isclose(b2[1, 0], stats.norm.ppf(0.025), atol=1e-6)
    assert b2[0, 0] == 0  # bounded params unaffected


def test_reference_pdfs():
    prior = make_prior({
        "a": {"prior": [0, 2], "ref": 1.3},
        "b": {"prior": [0, 1], "ref": {"dist": "norm", "loc": 0.5,
                                       "scale": 0.01}},
        "c": {"prior": [0, 1]},
    })
    pts = np.array([prior.reference(warn_if_no_ref=False,
                                    random_state=i) for i in range(50)])
    assert np.all(pts[:, 0] == 1.3)
    assert abs(pts[:, 1].mean() - 0.5) < 0.01
    assert pts[:, 2].std() > 0.1  # falls back to prior
    var = prior.reference_variances()
    assert np.isnan(var[0]) and np.isclose(var[1], 1e-4)
    # batched jax version
    import jax

    batch = np.asarray(prior.reference_jax(jax.random.key(0), (100,)))
    assert batch.shape == (100, 3)
    assert np.all(batch[:, 0] == 1.3)


def test_periodic_wrap():
    import jax.numpy as jnp

    prior = make_prior({
        "phi": {"prior": [0, 1], "periodic": True},
        "x": {"prior": [0, 10]},
    })
    wrapped = np.asarray(prior.reduce_periodic(jnp.array([1.25, 11.0])))
    assert np.isclose(wrapped[0], 0.25, atol=1e-6)
    assert np.isclose(wrapped[1], 11.0)  # non-periodic untouched


def test_periodic_requires_bounds():
    with pytest.raises(LoggedError):
        make_prior({"phi": {"prior": {"dist": "norm"}, "periodic": True}})


def test_sample_from_prior():
    prior = make_prior({"a": {"prior": [0, 2]}, "b": {"prior": [-1, 1]}})
    s = prior.sample(2000, random_state=0)
    assert s.shape == (2000, 2)
    assert abs(s[:, 0].mean() - 1.0) < 0.05


def test_external_prior_stats_lambda_traces():
    """External priors written with scipy-stats idioms (e.g. the Planck SZ
    joint prior) must trace into the jitted posterior (dists.traced_stats)
    and agree with scipy on the host path."""
    import scipy.stats as st

    from cobaya_tpu.models.model import get_model

    info = {
        "params": {"a": [0, 10, 5, 1, 0.5], "b": [0, 10, 5, 1, 0.5]},
        "likelihood": {"gaussian_mixture": {
            "means": [[5.0, 5.0]], "covs": [np.eye(2).tolist()],
            "input_params": ["a", "b"]}},
        "prior": {
            "SZ": "lambda a, b: stats.norm.logpdf(a+1.6*b, loc=9.5, scale=3.0)",
            "soft": "lambda a: stats.halfnorm.logpdf(a, scale=4.0)",
        },
    }
    model = get_model(info)
    fn = model.make_logposterior_fn()
    import jax

    import jax.numpy as jnp

    logpost, logpriors, *_ = jax.jit(fn)(jnp.array([4.0, 5.0]))
    expected_sz = st.norm.logpdf(4.0 + 1.6 * 5.0, loc=9.5, scale=3.0)
    expected_soft = st.halfnorm.logpdf(4.0, scale=4.0)
    assert np.isclose(float(logpriors[1]), expected_sz, atol=1e-5)
    assert np.isclose(float(logpriors[2]), expected_soft, atol=1e-5)
    # host path agrees
    lp = model.logposterior({"a": 4.0, "b": 5.0})
    assert np.isclose(lp.logpriors[1], expected_sz, atol=1e-5)
    assert np.isclose(float(logpost),
                      float(sum(lp.logpriors)) + float(sum(lp.loglikes)),
                      atol=1e-4)
