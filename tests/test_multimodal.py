"""Multimodal posteriors: mode recovery with many walkers / nested sampling.

Mirrors the reference's cluster-recovery checks (common_sampler.py:170-180):
all modes of a well-separated mixture must be populated.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run

MEANS = [[0.25, 0.25], [0.75, 0.75]]
COV = [[0.001, 0.0], [0.0, 0.001]]


def _info(sampler):
    return {
        "params": {
            "a_0": {"prior": [0, 1]},
            "a_1": {"prior": [0, 1]},
        },
        "likelihood": {"gaussian_mixture": {
            "means": MEANS, "covs": [COV, COV],
            "input_params_prefix": "a_",
        }},
        "sampler": sampler,
    }


def _mode_fractions(sample):
    x = sample.sampled_values()
    w = sample.weights
    d0 = np.linalg.norm(x - MEANS[0], axis=1)
    d1 = np.linalg.norm(x - MEANS[1], axis=1)
    near0 = (w * (d0 < 0.15)).sum() / w.sum()
    near1 = (w * (d1 < 0.15)).sum() / w.sum()
    return near0, near1


def test_mcmc_walkers_populate_both_modes():
    # with many walkers started from the prior, both modes stay populated
    # (R-1 across modes never converges, correctly: bound by max_samples)
    info = _info({"mcmc": {"seed": 6, "n_chains": 256,
                           "max_samples": 3000, "learn_proposal": False,
                           "covmat": np.array(COV) * 4,
                           "covmat_params": ["a_0", "a_1"]}})
    _, sampler = run(info)
    near0, near1 = _mode_fractions(
        sampler.products(skip_samples=0.5)["sample"]
    )
    assert near0 > 0.2 and near1 > 0.2, (near0, near1)
    assert near0 + near1 > 0.95
    assert not sampler.converged  # between-mode variance keeps R-1 high


def test_nested_recovers_modes_and_evidence():
    info = _info({"nested": {"seed": 12, "nlive": 400,
                             "precision_criterion": 1e-3}})
    _, sampler = run(info)
    near0, near1 = _mode_fractions(sampler.products()["sample"])
    # equal-weight modes
    assert near0 > 0.25 and near1 > 0.25, (near0, near1)
    # evidence: two gaussians (weight 1/2 each) in a unit box -> logZ ~ 0
    assert abs(sampler.logZ) < 4 * sampler.logZstd + 0.1, (
        sampler.logZ, sampler.logZstd,
    )


def test_nested_cluster_decomposition():
    info = _info({"nested": {"seed": 12, "nlive": 300,
                             "precision_criterion": 1e-2}})
    _, sampler = run(info)
    clusters = sampler.products()["clusters"]
    assert clusters is not None and len(clusters) == 2
    masses = sorted(c["mass_fraction"] for c in clusters.values())
    assert masses[0] > 0.25  # near-equal-weight modes
    # per-cluster evidences sum back to the total
    logZs = [c["logZ"] for c in clusters.values()]
    total = np.logaddexp.reduce(logZs)
    assert np.isclose(total, sampler.logZ, atol=1e-6)
    # cluster means sit on the true modes
    centers = sorted(
        float(np.average(c["sample"]["a_0"], weights=c["sample"].weights))
        for c in clusters.values()
    )
    assert abs(centers[0] - 0.25) < 0.05 and abs(centers[1] - 0.75) < 0.05
