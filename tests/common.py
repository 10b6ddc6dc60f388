"""Shared test harness: random Gaussian posteriors + KL accuracy check.

Mirrors the reference test strategy (/root/reference/tests/common_sampler.py):
build a random Gaussian(-mixture) model, run the full pipeline, and require
KL(truth || sample-estimated Gaussian) below tolerance.
"""

import numpy as np

from cobaya_tpu.likelihoods.gaussian_mixture import info_random_gaussian_mixture
from cobaya_tpu.utils.tools import KL_norm

KL_tolerance = 0.07


def random_gaussian_info(dim=2, n_modes=1, random_state=42, derived=False):
    # stds well inside the prior box so truncation is negligible (reference
    # harness uses O_std in [0.01, 0.05] of the range, common_sampler.py:20)
    ranges = [[-1, 1] for _ in range(dim)]
    return info_random_gaussian_mixture(
        ranges, n_modes=n_modes, input_params_prefix="a_",
        output_params_prefix="b_", derived=derived, random_state=random_state,
        O_std_min=0.01, O_std_max=0.05,
    )


def check_gaussian(info, sample, tol=KL_tolerance):
    """KL between the true Gaussian and the sample-estimated one."""
    like = info["likelihood"]["gaussian_mixture"]
    mean_true = np.asarray(like["means"][0])
    cov_true = np.asarray(like["covs"][0])
    mean_est = sample.mean()
    cov_est = sample.cov()
    kl = KL_norm(mean_true, cov_true, mean_est, cov_est)
    assert kl <= tol, f"KL divergence too large: {kl} > {tol}"
    return kl
