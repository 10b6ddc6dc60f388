"""Fast-dragging: posterior accuracy under the drag kernel.

Mirrors the reference's exact-statistics drag test
(/root/reference/tests/test_mcmc.py:130-144): posterior means/stds of a
two-likelihood fast/slow model recovered to ~0.03.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run


def _drag_info(temperature=1):
    import jax.numpy as jnp

    cov_s = np.array([[0.01, 0.006], [0.006, 0.01]])
    prec_s = np.linalg.inv(cov_s)

    def slow_like(x0, x1):
        v = jnp.stack([x0 - 0.4, x1 - 0.6])
        return -0.5 * v @ jnp.asarray(prec_s) @ v

    def fast_like(y0, y1):
        return -0.5 * ((y0 - 0.5) ** 2 + (y1 - 0.3) ** 2) / 0.02**2

    return {
        "params": {
            "x0": {"prior": [0, 1], "ref": 0.4, "proposal": 0.05},
            "x1": {"prior": [0, 1], "ref": 0.6, "proposal": 0.05},
            "y0": {"prior": [0, 1], "ref": 0.5, "proposal": 0.01},
            "y1": {"prior": [0, 1], "ref": 0.3, "proposal": 0.01},
        },
        "likelihood": {
            "slow": {"external": slow_like, "speed": 1,
                     "input_params": ["x0", "x1"]},
            "fast": {"external": fast_like, "speed": 50,
                     "input_params": ["y0", "y1"]},
        },
        "sampler": {"mcmc": {
            "seed": 5, "n_chains": 128, "drag": True,
            "max_samples": 6000, "Rminus1_stop": 0.01,
            "Rminus1_cl_stop": 0.5, "temperature": temperature,
        }},
    }, cov_s


@pytest.mark.parametrize("temperature", [1, 2])
def test_drag_results(temperature):
    info, cov_s = _drag_info(temperature)
    _, sampler = run(info)
    assert sampler.drag
    assert sampler._drag_interp_steps >= 1
    s = sampler.products(skip_samples=0.5)["sample"]
    mu = s.mean()
    std = np.sqrt(np.diag(s.cov()))
    expected_mu = [0.4, 0.6, 0.5, 0.3]
    expected_std = [np.sqrt(cov_s[0, 0]), np.sqrt(cov_s[1, 1]), 0.02, 0.02]
    assert np.allclose(mu, expected_mu, atol=0.03), mu
    assert np.allclose(std, expected_std, atol=0.03), std


def test_drag_with_callbacks_counts():
    """Dragging with host-callback components: slow evaluated once per
    cycle, fast twice per interpolation step (+once in the full eval)."""
    counts = {"slow": 0, "fast": 0}

    def slow_like(x0):
        counts["slow"] += 1
        return float(-0.5 * (x0 - 0.4) ** 2 / 0.01)

    def fast_like(y0):
        counts["fast"] += 1
        return float(-0.5 * (y0 - 0.6) ** 2 / 0.01)

    info = {
        "params": {
            "x0": {"prior": [0, 1], "ref": 0.4, "proposal": 0.05},
            "y0": {"prior": [0, 1], "ref": 0.6, "proposal": 0.05},
        },
        "likelihood": {
            "slow": {"external": slow_like, "speed": 1, "jittable": False,
                     "input_params": ["x0"]},
            "fast": {"external": fast_like, "speed": 50, "jittable": False,
                     "input_params": ["y0"]},
        },
        "sampler": {"mcmc": {
            "seed": 15, "n_chains": 8, "drag": True, "max_samples": 300,
            "Rminus1_stop": 1e-6, "Rminus1_cl_stop": 1e-6,
            "measure_speeds": False, "learn_proposal": False,
        }},
    }
    _, sampler = run(info)
    n_drag = sampler._drag_interp_steps
    expected = 1 + 2 * n_drag
    ratio = counts["fast"] / counts["slow"]
    assert abs(ratio / expected - 1) < 0.05, (ratio, expected, n_drag)
