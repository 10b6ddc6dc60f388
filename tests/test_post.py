"""post(): importance reweighting — add/remove priors and likelihoods.

Mirrors /root/reference/tests/test_post.py semantics on analytic Gaussians.
"""

import numpy as np
import pytest

from cobaya_tpu.post import post
from cobaya_tpu.run import run
from cobaya_tpu.utils.tools import KL_norm

mean = np.array([0.30245268, 0.61884443])
cov = np.array([[0.00796336, -0.0014805], [-0.0014805, 0.00561415]])
target_mean = mean + np.array([0.05, -0.03])


def _sample_gaussian(seed=4):
    info = {
        "params": {
            "a": {"prior": [0, 1]},
            "b": {"prior": [0, 1]},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [mean.tolist()], "covs": [cov.tolist()],
            "input_params": ["a", "b"],
        }},
        "sampler": {"mcmc": {"seed": seed, "n_chains": 128,
                             "max_samples": 20000, "Rminus1_stop": 0.02,
                             "Rminus1_cl_stop": 0.5}},
    }
    _, sampler = run(info)
    return info, sampler.products(skip_samples=0.5)["sample"]


def test_post_add_prior():
    """Adding an external prior shifts the posterior accordingly."""
    info, sample = _sample_gaussian()
    import jax.numpy as jnp

    # extra gaussian prior on 'a' tightens it around 0.2
    post_info = {
        "params": info["params"],
        "likelihood": info["likelihood"],
        "post": {
            "suffix": "p",
            "add": {"prior": {
                "extra": "lambda a: -0.5 * ((a - 0.2) / 0.05)**2"
            }},
        },
    }
    updated, result = post(post_info, sample)
    s = result.sample
    assert "extra" in s.prior_names
    # reweighted mean of 'a' pulled toward 0.2
    w = s.weights
    a_mean = np.average(s["a"], weights=w)
    a_orig = np.average(sample["a"], weights=sample.weights)
    assert a_mean < a_orig
    # analytic check: product of two gaussians in a
    var_a = cov[0, 0]
    var_new = 1 / (1 / var_a + 1 / 0.05**2)
    mean_new_a = var_new * (mean[0] / var_a + 0.2 / 0.05**2)
    assert abs(a_mean - mean_new_a) < 0.02


def test_post_remove_and_add_likelihood():
    """Swapping the likelihood reproduces sampling from the new one."""
    info, sample = _sample_gaussian()
    shifted_mean = (mean + [0.02, -0.02]).tolist()
    post_info = {
        "params": info["params"],
        "likelihood": info["likelihood"],
        "post": {
            "suffix": "s",
            "remove": {"likelihood": ["gaussian_mixture"]},
            "add": {"likelihood": {"shifted": {
                "class": "gaussian_mixture",
                "means": [shifted_mean], "covs": [cov.tolist()],
                "input_params": ["a", "b"],
            }}},
        },
    }
    updated, result = post(post_info, sample)
    s = result.sample
    assert "shifted" in s.like_names
    assert "gaussian_mixture" not in s.like_names
    w = s.weights
    est_mean = np.array([np.average(s["a"], weights=w),
                         np.average(s["b"], weights=w)])
    d = s.sampled_values() - est_mean
    est_cov = np.einsum("n,ni,nj->ij", w, d, d) / w.sum()
    kl = KL_norm(np.array(shifted_mean), cov, est_mean, est_cov)
    assert kl < 0.1, kl


def test_post_add_derived():
    info, sample = _sample_gaussian()
    post_info = {
        "params": info["params"],
        "likelihood": info["likelihood"],
        "post": {
            "suffix": "d",
            "add": {"params": {"apb": {"derived": "lambda a, b: a + b"}}},
        },
    }
    updated, result = post(post_info, sample)
    s = result.sample
    assert "apb" in s.derived_params
    assert np.allclose(s["apb"], s["a"] + s["b"], atol=1e-5)


def test_post_output_files(tmp_path):
    info, sample = _sample_gaussian()
    prefix = str(tmp_path / "chains" / "g")
    post_info = {
        "params": info["params"],
        "likelihood": info["likelihood"],
        "post": {
            "suffix": "x",
            "output": prefix,
            "add": {"params": {"apb": {"derived": "lambda a, b: a + b"}}},
        },
    }
    post(post_info, sample)
    import os

    assert os.path.exists(prefix + ".post.x.1.txt")
    assert os.path.exists(prefix + ".post.x.updated.yaml")
