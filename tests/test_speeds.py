"""Speed hierarchy: blocking, oversampling, and actual evaluation counts.

Mirrors the reference's ``body_of_test_speeds``
(/root/reference/tests/common_sampler.py:193-372): two likelihoods with
declared speeds and real Python call counters; assert the ratio of actual
evaluation counts matches the blocks x oversampling prediction within
tolerance, and that chain rows reproduce the likelihood values exactly.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run

TOL = 0.12  # reference uses 10%; slight slack for schedule truncation


def _make_info(oversample_power=0.4, blocking=None, n_chains=8,
               max_samples=1200):
    counts = {"slow": 0, "fast": 0}
    mean_s = np.array([0.4, 0.6])
    mean_f = np.array([0.5, 0.5])

    def slow_like(a0, a1):
        counts["slow"] += 1
        return float(
            -0.5 * ((a0 - mean_s[0]) ** 2 + (a1 - mean_s[1]) ** 2) / 0.01
        )

    def fast_like(b0, b1):
        counts["fast"] += 1
        return float(
            -0.5 * ((b0 - mean_f[0]) ** 2 + (b1 - mean_f[1]) ** 2) / 0.01
        )

    mcmc = {
        "seed": 21, "n_chains": n_chains, "max_samples": max_samples,
        "learn_every": 200, "Rminus1_stop": 1e-6, "Rminus1_cl_stop": 1e-6,
        "burn_in": 0, "measure_speeds": False,
    }
    if blocking is not None:
        mcmc["blocking"] = blocking
    else:
        mcmc["oversample_power"] = oversample_power
    info = {
        "params": {
            "a0": {"prior": [0, 1], "ref": 0.4, "proposal": 0.05},
            "a1": {"prior": [0, 1], "ref": 0.6, "proposal": 0.05},
            "b0": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
            "b1": {"prior": [0, 1], "ref": 0.5, "proposal": 0.05},
        },
        "likelihood": {
            "slow": {"external": slow_like, "speed": 1, "jittable": False,
                     "input_params": ["a0", "a1"]},
            "fast": {"external": fast_like, "speed": 100, "jittable": False,
                     "input_params": ["b0", "b1"]},
        },
        "sampler": {"mcmc": mcmc},
    }
    return info, counts


def _expected_ratio(oversample_fast, n_slow=2, n_fast=2):
    # per cycle: slow block visited n_slow times, fast block
    # n_fast * oversample times; slow like recomputed only on slow steps,
    # fast like on every step (slow moves drag fast params)
    slow_steps = n_slow
    total_steps = n_slow + n_fast * oversample_fast
    return total_steps / slow_steps


def test_count_ratio_oversampling():
    info, counts = _make_info(oversample_power=0.4)
    _, sampler = run(info)
    assert len(sampler._blocks) == 2
    over = sampler._oversampling
    assert over[0] == 1 and over[1] > 1
    ratio = counts["fast"] / counts["slow"]
    expected = _expected_ratio(over[1])
    assert abs(ratio / expected - 1) < TOL, (ratio, expected, over)


def test_count_ratio_manual_blocking():
    info, counts = _make_info(
        blocking=[(1, ["a0", "a1"]), (4, ["b0", "b1"])]
    )
    _, sampler = run(info)
    ratio = counts["fast"] / counts["slow"]
    expected = _expected_ratio(4)
    assert abs(ratio / expected - 1) < TOL, (ratio, expected)


def test_chain_rows_reproduce_likelihoods():
    """Stored chi2 columns match recomputing the likes at stored points."""
    info, counts = _make_info(oversample_power=0.4, n_chains=4,
                              max_samples=600)
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    rows = sample.data[-50:]
    ia = sample.columns.index("a0")
    for row in rows[::7]:
        a0, a1, b0, b1 = row[ia:ia + 4]
        chi2_slow = row[sample.columns.index("chi2__slow")]
        expected = ((a0 - 0.4) ** 2 + (a1 - 0.6) ** 2) / 0.01
        assert np.isclose(chi2_slow, expected, rtol=1e-3, atol=1e-3)
        chi2_fast = row[sample.columns.index("chi2__fast")]
        expected_f = ((b0 - 0.5) ** 2 + (b1 - 0.5) ** 2) / 0.01
        assert np.isclose(chi2_fast, expected_f, rtol=1e-3, atol=1e-3)


def test_blocked_sampler_still_correct():
    """Posterior moments stay correct under blocking + caching."""
    info, counts = _make_info(oversample_power=0.4, n_chains=64,
                              max_samples=4000)
    info["sampler"]["mcmc"]["Rminus1_stop"] = 0.02
    info["sampler"]["mcmc"]["Rminus1_cl_stop"] = 0.5
    _, sampler = run(info)
    s = sampler.products(skip_samples=0.5)["sample"]
    mu = s.mean()
    assert np.allclose(mu, [0.4, 0.6, 0.5, 0.5], atol=0.02), mu


def test_nested_speed_grades_count_ratio():
    """Graded nested sampling: slow components recompute only on slow-block
    slice passes (reference test_polychord.py:85-102 capability)."""
    counts = {"slow": 0, "fast": 0}

    def slow_like(a0, a1):
        counts["slow"] += 1
        return float(-0.5 * ((a0 - 0.45) ** 2 + (a1 - 0.55) ** 2) / 0.01)

    def fast_like(b0, b1):
        counts["fast"] += 1
        return float(-0.5 * ((b0 - 0.5) ** 2 + (b1 - 0.5) ** 2) / 0.01)

    info = {
        "params": {
            "a0": [0, 1], "a1": [0, 1], "b0": [0, 1], "b1": [0, 1],
        },
        "likelihood": {
            "slow": {"external": slow_like, "speed": 1, "jittable": False,
                     "input_params": ["a0", "a1"]},
            "fast": {"external": fast_like, "speed": 100, "jittable": False,
                     "input_params": ["b0", "b1"]},
        },
        "sampler": {"nested": {
            "seed": 3, "nlive": 100, "num_repeats": 8,
            "precision_criterion": 0.5, "max_ndead": 400,
            "do_clustering": False,
        }},
    }
    from cobaya_tpu.run import run

    _, sampler = run(info)
    assert len(sampler._repeats_plan) == 2
    reps = dict(sampler._repeats_plan)
    reps_slow, reps_fast = reps[0], reps[1]
    # fast like evaluated on every pass; slow only on slow-block passes
    expected = (reps_slow + reps_fast) / reps_slow
    ratio = counts["fast"] / counts["slow"]
    assert abs(ratio / expected - 1) < 0.25, (ratio, expected, counts)
    assert np.isfinite(sampler.logZ)
