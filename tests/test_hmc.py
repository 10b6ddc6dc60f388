"""HMC sampler: accuracy on correlated Gaussians, step-size adaptation."""

import numpy as np
import pytest

from cobaya_tpu.run import run

from common import check_gaussian, random_gaussian_info


def test_hmc_gaussian_accuracy():
    info = random_gaussian_info(dim=4, random_state=41)
    info["sampler"] = {"hmc": {"seed": 8, "n_chains": 64,
                               "leapfrog_steps": 8,
                               "learn_every": 120,
                               "max_samples": 8000,
                               "Rminus1_cl_stop": 0.5}}
    _, sampler = run(info)
    assert sampler.converged
    kl = check_gaussian(info, sampler.products(skip_samples=0.5)["sample"])
    assert kl < 0.07
    # HMC decorrelates much faster than random-walk Metropolis
    assert sampler._acceptance_rate > 0.5


def test_hmc_step_size_adapts():
    info = random_gaussian_info(dim=2, random_state=43)
    info["sampler"] = {"hmc": {"seed": 8, "n_chains": 32,
                               "step_size": 1.5,  # deliberately too large
                               "leapfrog_steps": 8,
                               "learn_every": 100,
                               "max_samples": 1500,
                               "Rminus1_stop": 1e-6,
                               "Rminus1_cl_stop": 1e-6}}
    _, sampler = run(info)
    assert sampler._eps < 1.5  # adapted downward


def test_hmc_rejects_callback_models():
    from cobaya_tpu.utils.log import LoggedError

    def host_like(a):
        return float(-0.5 * a**2)

    info = {
        "params": {"a": {"prior": [-3, 3], "ref": 0.0, "proposal": 0.5}},
        "likelihood": {"host": {"external": host_like, "jittable": False,
                                "input_params": ["a"]}},
        "sampler": {"hmc": {"seed": 1, "n_chains": 8, "max_samples": 50}},
    }
    with pytest.raises(LoggedError):
        run(info)


def test_hmc_with_ensemble_remix():
    """The remix move is kernel-independent (exact MH on the shared carry):
    it must compose with the HMC epoch kernel. Regression: HMC's
    _build_epoch_fn override used to skip the remix construction entirely,
    leaving _remix_fn unset (AttributeError at the first epoch dispatch)."""
    info = random_gaussian_info(dim=3, random_state=47)
    info["sampler"] = {"hmc": {"seed": 9, "n_chains": 32,
                               "leapfrog_steps": 6,
                               "learn_every": 90,
                               "max_samples": 4000,
                               "ensemble_remix": True,
                               "Rminus1_cl_stop": 0.5}}
    _, sampler = run(info)
    assert sampler._remix_fn is not None
    assert sampler.converged
    kl = check_gaussian(info, sampler.products(skip_samples=0.5)["sample"])
    assert kl < 0.07
