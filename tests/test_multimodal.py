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


def test_live_point_clustering_helper():
    """_cluster_live_points identifies two well-separated live-point blobs
    and builds per-cluster whitening transforms (PolyChord-style
    cluster-aware evolution)."""
    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.samplers.nested.nested import Nested

    info = _info({"nested": {"nlive": 60, "seed": 1}})
    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    sampler = Nested(info["sampler"]["nested"], model, output=None)
    rng = np.random.default_rng(0)
    u = np.concatenate([
        rng.normal(0.25, 0.02, (40, 2)), rng.normal(0.75, 0.02, (40, 2)),
    ])
    labels, whitens = sampler._cluster_live_points(u)
    assert labels is not None
    assert whitens.shape[0] == 2
    # the two blobs separate cleanly
    assert len(set(labels[:40])) == 1 and len(set(labels[40:])) == 1
    assert labels[0] != labels[-1]
    # whitening scale ~ local std (0.02), far below the global (~0.25)
    for c in range(2):
        scale = np.sqrt(np.trace(whitens[c, 0] @ whitens[c, 0].T) / 2)
        assert 0.01 < scale < 0.05, scale
    # a single blob returns no clustering
    labels1, whitens1 = sampler._cluster_live_points(
        rng.normal(0.5, 0.05, (80, 2))
    )
    assert labels1 is None and whitens1 is None


def test_nested_cluster_evolution_runs():
    """Nested sampling with cluster_evolution on a bimodal target: correct
    evidence and both modes populated (cluster-aware whitening active)."""
    info = _info({"nested": {
        "nlive": 200, "num_repeats": "2d", "seed": 2,
        "cluster_evolution": True, "cluster_every": 5,
    }})
    from cobaya_tpu.run import run as _run

    _, sampler = _run(info)
    prods = sampler.products()
    near0, near1 = _mode_fractions(prods["sample"])
    assert near0 > 0.2 and near1 > 0.2, (near0, near1)
    # evidence: mixture of 2 gaussians over the unit square, logZ ~ 0
    assert abs(prods["logZ"]) < max(3 * prods["logZstd"], 0.15), (
        prods["logZ"], prods["logZstd"]
    )
