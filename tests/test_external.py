"""External (user-supplied) likelihood and prior functions.

Behavioral contract of the reference's external-function matrix
(tests/test_likelihood_external.py, test_prior_external.py,
common_external.py): string lambdas (with scipy.stats), plain callables,
mixed sets, import_module specs, derived-parameter returns, and bound
methods — each sampled end-to-end, with recorded chi2/prior columns
reproduced by direct evaluation on the stored samples.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run
from cobaya_tpu.utils.conventions import chi2_name

RING_STR = ("lambda x, y: stats.norm.logpdf(np.sqrt(x**2 + y**2), "
            "loc=0.5, scale=0.1)")


def ring_logp(x, y):
    from scipy import stats

    return stats.norm.logpdf(np.sqrt(x**2 + y**2), loc=0.5, scale=0.1)


def gauss_y_logp(y):
    from scipy import stats

    return stats.norm.logpdf(y, loc=0, scale=0.2)


def ring_logp_derived(x, y):
    return ring_logp(x, y), {"r": np.sqrt(x**2 + y**2),
                             "theta": np.arctan2(x, y) / np.pi}


class RingHolder:
    def logp_args(self, x, y):
        return ring_logp(x, y)

    def logp_kwargs(self, x=None, y=None):
        return ring_logp(x, y)

    def logp_catchall(self, **kwargs):
        return ring_logp(**kwargs)


GAUSS_STR = "lambda y: stats.norm.logpdf(y, loc=0, scale=0.2)"


def _base_info(max_samples=40):
    return {
        "params": {
            "x": {"prior": {"min": 0, "max": 1}, "proposal": 0.05,
                  "ref": 0.4},
            "y": {"prior": {"min": -1, "max": 1}, "proposal": 0.05,
                  "ref": 0.3},
        },
        "sampler": {"mcmc": {"seed": 3, "n_chains": 4,
                             "max_samples": max_samples, "burn_in": 0,
                             "measure_speeds": False,
                             "records_per_epoch": max_samples,
                             "fetch_chains": 4}},
    }


def _run_likelihood_case(info_likelihood, check=("ring",)):
    info = _base_info()
    info["likelihood"] = info_likelihood
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    x = np.asarray(sample["x"], float)
    y = np.asarray(sample["y"], float)
    expected = {"ring": ring_logp(x, y), "gauss_y": gauss_y_logp(y)}
    for name in check:
        np.testing.assert_allclose(
            np.asarray(sample[chi2_name(name)], float),
            -2 * expected[name], rtol=1e-4, atol=1e-4,
        )
    return sampler, sample


def test_external_likelihood_string():
    _run_likelihood_case({"ring": RING_STR})


def test_external_likelihood_callable():
    _run_likelihood_case({"ring": ring_logp})


def test_external_likelihood_mixed():
    _run_likelihood_case({"ring": ring_logp, "gauss_y": GAUSS_STR},
                         check=("ring", "gauss_y"))


def test_external_likelihood_import_spec():
    _run_likelihood_case({
        "ring": "import_module('test_external').ring_logp"
    })


def test_external_likelihood_derived():
    info = _base_info()
    info["likelihood"] = {"ring": {"external": ring_logp_derived,
                                   "output_params": ["r", "theta"]}}
    info["params"].update({"r": {"min": 0, "max": 2},
                           "theta": {"min": -0.5, "max": 0.5}})
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    x = np.asarray(sample["x"], float)
    y = np.asarray(sample["y"], float)
    np.testing.assert_allclose(np.asarray(sample["r"], float),
                               np.sqrt(x**2 + y**2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sample["theta"], float),
                               np.arctan2(x, y) / np.pi, rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("method", ["logp_args", "logp_kwargs"])
def test_external_likelihood_bound_method(method):
    _run_likelihood_case({"ring": getattr(RingHolder(), method)})


def test_external_likelihood_catchall_kwargs():
    _run_likelihood_case({"ring": {
        "external": RingHolder().logp_catchall,
        "input_params": ["x", "y"],
    }})


def _run_prior_case(info_prior):
    info = _base_info()
    info["likelihood"] = {"one": None}
    info["prior"] = info_prior
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    x = np.asarray(sample["x"], float)
    y = np.asarray(sample["y"], float)
    # total prior = sum of the per-prior columns
    cols = [c for c in sample.columns if c.startswith("minuslogprior__")]
    total = sum(np.asarray(sample[c], float) for c in cols)
    np.testing.assert_allclose(
        np.asarray(sample["minuslogprior"], float), total,
        rtol=1e-4, atol=1e-4,
    )
    # the flat box contributes -log(2); externals add their logp
    base = -np.log(2.0)
    expected = base + ring_logp(x, y)
    if len(info_prior) > 1:
        expected = expected + gauss_y_logp(y)
    np.testing.assert_allclose(
        -np.asarray(sample["minuslogprior"], float), expected,
        rtol=1e-4, atol=1e-4,
    )


def test_external_prior_string():
    _run_prior_case({"ring": RING_STR})


def test_external_prior_callable():
    _run_prior_case({"ring": ring_logp})


def test_external_prior_mixed():
    _run_prior_case({"ring": RING_STR, "gauss_y": gauss_y_logp})


def test_external_prior_import_spec():
    _run_prior_case({"ring": "import_module('test_external').ring_logp"})
