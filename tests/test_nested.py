"""Nested sampler: evidence accuracy and posterior recovery.

Mirrors the reference evidence test (tests/common_sampler.py:182-189):
logZ within 2 sigma of the analytic value for a Gaussian in a box.
"""

import numpy as np
import pytest

from cobaya_tpu.run import run

from common import check_gaussian, random_gaussian_info


def test_nested_evidence_and_posterior():
    dim = 2
    info = random_gaussian_info(dim=dim, random_state=31)
    info["sampler"] = {"nested": {"seed": 11, "nlive": 200,
                                  "precision_criterion": 1e-3}}
    _, sampler = run(info)
    # analytic evidence: gaussian well inside the box -> Z = 1/V_prior
    ranges = [[-1, 1]] * dim
    logZ_true = -np.sum(np.log([r[1] - r[0] for r in ranges]))
    assert abs(sampler.logZ - logZ_true) < 2.5 * sampler.logZstd + 0.05, (
        sampler.logZ, logZ_true, sampler.logZstd,
    )
    kl = check_gaussian(info, sampler.products()["sample"], tol=0.2)


def test_polychord_alias():
    info = random_gaussian_info(dim=2, random_state=37)
    info["sampler"] = {"polychord": {
        "seed": 13, "nlive": 150, "precision_criterion": 1e-2,
        # PolyChord-specific options accepted & ignored
        "do_clustering": True, "nprior": "10d", "feedback": 0,
    }}
    _, sampler = run(info)
    logZ_true = -np.log(4.0)
    assert abs(sampler.logZ - logZ_true) < 3 * sampler.logZstd + 0.1
    products = sampler.products()
    assert set(products) >= {"sample", "logZ", "logZstd", "clusters"}


def test_nested_external_prior_chain_columns(tmp_path):
    """External priors appear in their own minuslogprior__ column and the
    chain satisfies minuslogpost == minuslogprior + chi2/2."""
    info = random_gaussian_info(dim=2, random_state=41)
    info["prior"] = {"tilt": "lambda a__0: -0.5 * (a__0 / 0.5) ** 2"}
    info["sampler"] = {"nested": {"seed": 17, "nlive": 100,
                                  "precision_criterion": 1e-2}}
    info["output"] = str(tmp_path / "np")
    _, sampler = run(info)
    s = sampler.products()["sample"]
    assert "minuslogprior__tilt" in s.columns
    a0 = np.asarray(s["a__0"], float)
    np.testing.assert_allclose(
        np.asarray(s["minuslogprior__tilt"], float),
        0.5 * (a0 / 0.5) ** 2, rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s["minuslogpost"], float),
        np.asarray(s["minuslogprior"], float)
        + 0.5 * np.asarray(s["chi2"], float),
        rtol=1e-5, atol=1e-4,
    )
    # reloading the written chain passes the consistency check (no warning
    # would assert here, but loading must reproduce the same stats)
    from cobaya_tpu.io.output import load_samples

    re = load_samples(str(tmp_path / "np"))[0]
    np.testing.assert_allclose(re.mean(), s.mean(), rtol=1e-5, atol=1e-6)


def test_nested_checkpoint_resume(tmp_path):
    """A nested run killed mid-flight resumes from its checkpoint and
    matches the uninterrupted run's evidence (reference capability:
    PolyChord read_resume, polychord.py:146-153)."""
    dim = 2
    base = {"seed": 23, "nlive": 100, "precision_criterion": 1e-3,
            "checkpoint_every": 2, "batch_size": 12}
    # uninterrupted run (no output)
    info = random_gaussian_info(dim=dim, random_state=51)
    info["sampler"] = {"nested": dict(base)}
    _, full = run(info)
    # interrupted run: stop after a few generations via max_ndead
    info_a = random_gaussian_info(dim=dim, random_state=51)
    info_a["sampler"] = {"nested": dict(base, max_ndead=97)}
    info_a["output"] = str(tmp_path / "ck")
    _, part = run(info_a)
    assert part.logZstd == np.inf or part.logZ != full.logZ  # stopped early
    import os
    assert os.path.exists(str(tmp_path / "ck.nested.state.npz"))
    # resume to completion
    info_b = random_gaussian_info(dim=dim, random_state=51)
    info_b["sampler"] = {"nested": dict(base)}
    info_b["output"] = str(tmp_path / "ck")
    _, resumed = run(info_b, resume=True)
    assert resumed._resume_state is None  # state was consumed
    logZ_true = -np.log(4.0)
    assert abs(resumed.logZ - logZ_true) < 3 * resumed.logZstd + 0.1, (
        resumed.logZ, logZ_true, resumed.logZstd)
    # agreement with the uninterrupted run within the combined error
    tol = 3 * np.hypot(full.logZstd, resumed.logZstd) + 0.05
    assert abs(resumed.logZ - full.logZ) < tol, (
        resumed.logZ, full.logZ, tol)


def test_nested_resume_process_count_guard(tmp_path):
    """Changing nlive between checkpoint and resume must error clearly."""
    from cobaya_tpu.utils.log import LoggedError

    info = random_gaussian_info(dim=2, random_state=53)
    info["sampler"] = {"nested": {"seed": 29, "nlive": 64,
                                  "checkpoint_every": 1, "batch_size": 8,
                                  "max_ndead": 33,
                                  "precision_criterion": 1e-3}}
    info["output"] = str(tmp_path / "g")
    run(info)
    info2 = random_gaussian_info(dim=2, random_state=53)
    info2["sampler"] = {"nested": {"seed": 29, "nlive": 128,
                                   "checkpoint_every": 1, "batch_size": 8,
                                   "precision_criterion": 1e-3}}
    info2["output"] = str(tmp_path / "g")
    with pytest.raises(LoggedError, match="stored live points"):
        run(info2, resume=True)
