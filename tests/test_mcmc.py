"""MCMC sampler: accuracy, adaptation, checkpoint/resume, output files."""

import os

import numpy as np
import pytest

from cobaya_tpu.run import run

from common import check_gaussian, random_gaussian_info


def test_mcmc_gaussian_accuracy():
    info = random_gaussian_info(dim=3, random_state=7)
    info["sampler"] = {"mcmc": {"seed": 3, "n_chains": 128,
                                "max_samples": 50000}}
    _, sampler = run(info)
    # discard the pre-convergence transient (reference harness uses
    # skip_samples=0.5, common_sampler.py:114)
    kl = check_gaussian(info, sampler.products(skip_samples=0.5)["sample"])
    assert sampler.converged
    assert kl < 0.07


def test_mcmc_nested_rminus1_groups():
    """End-to-end run with superchain-grouped (nested) R-1: converges in
    far fewer steps than per-walker R-1 allows, and the posterior is still
    recovered to the harness KL tolerance."""
    info = random_gaussian_info(dim=3, random_state=7)
    info["sampler"] = {"mcmc": {"seed": 3, "n_chains": 128,
                                "Rminus1_n_groups": 8,
                                "max_samples": 50000}}
    _, sampler = run(info)
    assert sampler._r_groups == 8
    kl = check_gaussian(info, sampler.products(skip_samples=0.5)["sample"])
    assert sampler.converged
    assert kl < 0.07
    # group-clustered starts: any non-divisor group request is clamped
    info["sampler"]["mcmc"].update({"Rminus1_n_groups": 7, "seed": 4,
                                    "max_samples": 2000})
    _, sampler2 = run(info)
    assert sampler2.n_chains % sampler2._r_groups == 0


def test_mcmc_max_steps_per_dispatch_equivalence():
    """Chunked epoch dispatch (max_steps_per_dispatch) must reproduce the
    single-dispatch run: same seed, same step sequence, same samples."""
    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.samplers.sampler import get_sampler

    info = random_gaussian_info(dim=3, random_state=13)
    base = {"seed": 21, "n_chains": 16, "max_samples": 600,
            "learn_every": 120, "records_per_epoch": 24,
            "Rminus1_stop": 1e-9, "Rminus1_cl_stop": 1e6}
    results = []
    for extra in ({}, {"max_steps_per_dispatch": 35}):
        model = get_model({k: v for k, v in info.items() if k != "sampler"})
        sampler = get_sampler({"mcmc": dict(base, **extra)}, model)
        if extra:
            # 24 records x thin 5: limit 35 -> 7 rec/call? must divide 24
            assert sampler._dispatch_chunk_recs(24, 5) == 6
        sampler.run()
        xs = np.concatenate([r["x"] for r in sampler._records], axis=0)
        results.append(xs)
    np.testing.assert_allclose(results[0], results[1], rtol=2e-5,
                               atol=1e-6)


def test_mcmc_derived_and_chi2_in_chain():
    info = random_gaussian_info(dim=2, random_state=11, derived=True)
    info["sampler"] = {"mcmc": {"seed": 5, "n_chains": 64,
                                "max_samples": 20000,
                                "Rminus1_stop": 0.05,
                                "Rminus1_cl_stop": 0.5}}
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    # derived params are the standardized residuals: check one row exactly
    like = info["likelihood"]["gaussian_mixture"]
    mean = np.asarray(like["means"][0])
    cov = np.asarray(like["covs"][0])
    from cobaya_tpu.utils.tools import inverse_cholesky

    invL = inverse_cholesky(cov)
    row = sample.data[10]
    x = row[2:4]
    derived = row[4:6]
    assert np.allclose(derived, invL @ (x - mean), atol=1e-4)
    # chi2 column equals -2 loglike
    from scipy.stats import multivariate_normal

    chi2_col = sample[f"chi2__gaussian_mixture"][10]
    expected = -2 * multivariate_normal(mean, cov).logpdf(x)
    assert np.isclose(chi2_col, expected, atol=1e-3)


def test_mcmc_output_and_resume(tmp_path):
    prefix = str(tmp_path / "chains" / "gauss")
    info = random_gaussian_info(dim=2, random_state=13)
    info["output"] = prefix
    info["sampler"] = {"mcmc": {"seed": 7, "n_chains": 32,
                                "max_samples": 300,
                                "output_chains": 2}}
    _, sampler = run(info)
    assert not sampler.converged  # max_samples hit
    n_first = sampler.n_steps
    assert os.path.exists(prefix + ".input.yaml")
    assert os.path.exists(prefix + ".updated.yaml")
    assert os.path.exists(prefix + ".1.txt")
    assert os.path.exists(prefix + ".mcmc.state.npz")
    assert os.path.exists(prefix + ".mcmc.checkpoint")
    assert os.path.exists(prefix + ".mcmc.covmat")
    # chain file round-trips
    from cobaya_tpu.io.collection import SampleCollection

    loaded = SampleCollection.load(prefix + ".1.txt")
    assert len(loaded) > 0
    # resume continues from stored state
    info["sampler"]["mcmc"]["max_samples"] = 600
    _, sampler2 = run(info, resume=True)
    assert sampler2.n_steps > n_first


def test_mcmc_resume_allow_changes(tmp_path):
    """--allow-changes skips the resume-consistency diff (ref run.py:129)."""
    prefix = str(tmp_path / "chains" / "gac")
    info = random_gaussian_info(dim=2, random_state=23)
    info["output"] = prefix
    info["sampler"] = {"mcmc": {"seed": 7, "n_chains": 16,
                                "max_samples": 100}}
    run(info)
    # change a param prior: incompatible resume must fail...
    name = next(iter(info["params"]))
    info["params"][name]["prior"] = {"min": -20, "max": 20}
    info["sampler"]["mcmc"]["max_samples"] = 200
    from cobaya_tpu.utils.log import LoggedError

    with pytest.raises(LoggedError):
        run(info, resume=True)
    # ...unless changes are explicitly allowed
    _, sampler = run(info, resume=True, allow_changes=True)
    assert sampler.n_steps > 0


def test_mcmc_force_overwrites(tmp_path):
    prefix = str(tmp_path / "chains" / "g2")
    info = random_gaussian_info(dim=2, random_state=17)
    info["output"] = prefix
    info["sampler"] = {"mcmc": {"seed": 7, "n_chains": 16,
                                "max_samples": 100}}
    run(info)
    # rerunning without resume/force fails
    from cobaya_tpu.utils.log import LoggedError

    with pytest.raises(LoggedError):
        run(info)
    run(info, force=True)  # succeeds


def test_mcmc_seed_reproducible():
    info = random_gaussian_info(dim=2, random_state=19)
    info["sampler"] = {"mcmc": {"seed": 42, "n_chains": 16,
                                "max_samples": 200}}
    _, s1 = run(info)
    _, s2 = run(info)
    m1 = s1.products()["sample"].mean()
    m2 = s2.products()["sample"].mean()
    assert np.allclose(m1, m2)


def test_mcmc_periodic_param():
    """Posterior on a periodic parameter wraps correctly."""
    info = {
        "params": {"phi": {"prior": [0, 1], "periodic": True}},
        "likelihood": {
            "wrapgauss": {
                # bimodal at the seam: peak at phi=0 == phi=1
                "external": lambda phi: -0.5 * (
                    np.minimum(phi, 1 - phi) / 0.05) ** 2,
                "input_params": ["phi"],
            }
        },
        "sampler": {"mcmc": {"seed": 2, "n_chains": 64, "max_samples": 4000,
                             "Rminus1_stop": 0.1, "Rminus1_cl_stop": 1.0}},
    }
    import jax.numpy as jnp

    info["likelihood"]["wrapgauss"]["external"] = (
        lambda phi: -0.5 * (jnp.minimum(phi, 1 - phi) / 0.05) ** 2
    )
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    phi = sample["phi"]
    w = sample.weights
    # mass concentrated near the seam
    near = ((phi < 0.2) | (phi > 0.8))
    assert (w * near).sum() / w.sum() > 0.95


def test_mcmc_temperature():
    """Tempered chain detempered reproduces the posterior moments."""
    info = random_gaussian_info(dim=2, random_state=23)
    info["sampler"] = {"mcmc": {"seed": 9, "n_chains": 128,
                                "temperature": 2,
                                "max_samples": 30000,
                                "Rminus1_stop": 0.02,
                                "Rminus1_cl_stop": 0.4}}
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    assert sample.temperature == 2
    check_gaussian(info, sample, tol=0.1)


def test_resume_unconverges_on_stricter_criteria(tmp_path):
    prefix = str(tmp_path / "chains" / "g3")
    info = random_gaussian_info(dim=2, random_state=29)
    info["output"] = prefix
    info["sampler"] = {"mcmc": {"seed": 7, "n_chains": 64,
                                "max_samples": 30000,
                                "Rminus1_stop": 0.05,
                                "Rminus1_cl_stop": 1.0}}
    _, s1 = run(info)
    assert s1.converged
    # resume with the same criteria: nothing more to do
    _, s2 = run(info, resume=True)
    assert s2.converged and s2.n_steps == s1.n_steps
    # stricter criterion: resumes sampling
    info["sampler"]["mcmc"]["Rminus1_stop"] = 0.02
    _, s3 = run(info, resume=True)
    assert s3.n_steps > s1.n_steps
    assert s3.converged


def test_cycled_proposal_directions():
    """'proposal_directions: cycled' reproduces the reference's SO(n)
    column cycling (reference proposal.py:58-82) and still samples the
    target correctly."""
    import numpy as np

    from cobaya_tpu.ops.proposal import (
        BlockedProposal, DirectionCycler, build_blocked_proposal,
        random_SO_N,
    )

    rng = np.random.default_rng(0)
    # Haar SO(n): orthogonal, det +1
    R = random_SO_N(5, rng)
    assert np.allclose(R @ R.T, np.eye(5), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    # cycler: within one cycle, a block's directions are orthonormal
    prop = build_blocked_proposal(np.eye(5), [[0, 1, 2], [3, 4]])
    cyc = DirectionCycler(prop, rng)
    sched = np.array([0, 0, 0, 1, 1, 0, 0, 0])
    dirs = cyc.directions_for(sched)
    blk0_first = dirs[:3, :3]  # float32 output -> 1e-6 tolerance
    assert np.allclose(blk0_first @ blk0_first.T, np.eye(3), atol=1e-6)
    blk0_second = dirs[5:, :3]
    assert np.allclose(blk0_second @ blk0_second.T, np.eye(3), atol=1e-6)
    # fresh rotation after the wrap
    assert not np.allclose(blk0_first, blk0_second)
    # block-1 columns live on the last two j-positions, orthonormal
    assert np.allclose(dirs[3:5, :3], 0)
    assert np.allclose(dirs[3:5, 3:] @ dirs[3:5, 3:].T, np.eye(2),
                       atol=1e-6)
    # end-to-end sampling accuracy with the cycled kernel
    from cobaya_tpu.run import run

    info = {
        "params": {
            "x": {"prior": [-1, 1], "ref": 0.1, "proposal": 0.05},
            "y": {"prior": [-1, 1], "ref": -0.1, "proposal": 0.05},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [[0.1, -0.1]],
            "covs": [[[0.0016, 0.0008], [0.0008, 0.0016]]],
            "input_params": ["x", "y"],
        }},
        "sampler": {"mcmc": {
            "seed": 7, "n_chains": 64, "proposal_directions": "cycled",
            "Rminus1_stop": 0.01, "Rminus1_cl_stop": 0.3,
            "max_samples": 20000,
        }},
    }
    _, sampler = run(info)
    s = sampler.products(skip_samples=0.5)["sample"]
    assert np.allclose(s.mean(), [0.1, -0.1], atol=0.01)
    assert np.allclose(np.sqrt(np.diag(s.cov())), 0.04, atol=0.01)


def test_initial_covmat_inheritance(tmp_path):
    """Initial proposal covariance priority (reference
    test_mcmc_initial_covmat.py): explicit covmat entries win; gaps fill
    from 'proposal', then ref variance / fallback scale, then prior."""
    import numpy as np

    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.samplers.mcmc.mcmc import MCMC
    from cobaya_tpu.samplers.sampler import CovmatSampler

    rng = np.random.default_rng(2)
    dim = 12
    A = rng.normal(size=(dim, dim))
    full_cov = A @ A.T / dim + np.eye(dim)
    scale = CovmatSampler.fallback_covmat_scale
    i_proposal, i_ref, i_prior = [0, 1, 2], [3, 4, 5], [6, 7]
    i_covmat = [i for i in range(dim) if i not in
                i_proposal + i_ref + i_prior]
    params = {}
    for i in range(dim):
        p = f"a_{i}"
        sigma = float(np.sqrt(full_cov[i, i]))
        params[p] = {"prior": {"dist": "norm", "loc": 0, "scale": 1000}}
        if i in i_proposal:
            params[p]["proposal"] = sigma
        elif i in i_ref:
            params[p]["ref"] = {"dist": "norm", "loc": 0,
                                "scale": sigma * np.sqrt(scale)}
        elif i in i_prior:
            params[p]["prior"]["scale"] = sigma * np.sqrt(scale)
    sub = full_cov[np.ix_(i_covmat, i_covmat)]
    sub_params = [f"a_{i}" for i in i_covmat]
    # file-based partial covmat
    covfile = tmp_path / "my.covmat"
    np.savetxt(covfile, sub, header=" ".join(sub_params))
    info = {"likelihood": {"one": None}, "params": params}
    model = get_model(info)
    sampler = MCMC({"covmat": str(covfile), "n_chains": 8,
                    "max_samples": 1, "measure_speeds": False,
                    "seed": 0}, model, output=None)
    got = sampler._proposal.covmat
    for i in range(dim):
        assert np.isclose(got[i, i], full_cov[i, i], rtol=1e-6), i
    assert np.allclose(got[np.ix_(i_covmat, i_covmat)], sub)
    # matrix + covmat_params form
    sampler2 = MCMC({"covmat": sub, "covmat_params": sub_params,
                     "n_chains": 8, "max_samples": 1,
                     "measure_speeds": False, "seed": 0}, model, output=None)
    assert np.allclose(np.diag(sampler2._proposal.covmat), np.diag(got),
                       rtol=1e-6)


def test_output_format_accepted(tmp_path):
    """Reference-exact chains: one row per accepted point, weight = repeats
    (reference collection.py:383-386 semantics beyond thin == 1)."""
    info = random_gaussian_info(dim=2, random_state=13)
    info["sampler"] = {"mcmc": {
        "seed": 9, "n_chains": 8, "max_samples": 400, "learn_every": 100,
        "Rminus1_stop": 1e-6, "burn_in": 0, "measure_speeds": False,
        "output_format": "accepted", "output_chains": 2,
    }}
    info["output"] = str(tmp_path / "acc")
    _, sampler = run(info)
    chain = np.loadtxt(tmp_path / "acc.1.txt")
    weights = chain[:, 0]
    # integer repeat counts summing to the total number of steps
    assert np.allclose(weights, np.round(weights))
    assert weights.sum() == sampler.n_steps
    # consecutive rows are distinct accepted points
    xs = chain[:, 2:4]
    assert not np.any(np.all(xs[1:] == xs[:-1], axis=1))


def test_oversample_thin_spacing():
    """oversample_thin spaces records by the mean per-parameter
    oversampling (reference mcmc.py:377-389)."""
    from tests.test_speeds import _make_info

    for flag, expect_min in ((True, 2), (False, 1)):
        info, _ = _make_info(oversample_power=1.0, n_chains=8,
                             max_samples=200)
        info["sampler"]["mcmc"].update({
            "records_per_epoch": 100000, "oversample_thin": flag,
            "learn_every": 100,
        })
        _, sampler = run(info)
        assert max(sampler._oversampling) > 1
        expected = max(1, int(np.round(
            sum(len(b) * o for b, o in zip(sampler._blocks,
                                           sampler._oversampling))
            / sampler.d
        ))) if flag else 1
        assert sampler._output_thin == expected
        thins = {r["thin"] for r in sampler._records}
        if flag:
            assert thins == {expected} and expected >= expect_min
        else:
            assert thins == {1}


def test_cl_bounds_ring_mechanics():
    """The device CL-bounds ring fills as a circular buffer, wraps, and
    yields a finite device-side CL R-1 once full; a huge Rminus1_cl_stop
    disables the ring entirely (no wasted bandwidth)."""
    from tests.test_speeds import _make_info

    info, _ = _make_info(n_chains=8, max_samples=400)
    info["sampler"]["mcmc"].update({
        "learn_every": 50, "records_per_epoch": 25,
        "cl_bounds_records": 16, "Rminus1_cl_stop": 0.2,
        "Rminus1_stop": 1e-6,  # never stops on means within max_samples
        "seed": 5,
    })
    _, sampler = run(info)
    assert sampler._ring is not None
    assert sampler._ring.shape[0] == 16          # preallocated, fixed shape
    # striding may have halved the valid count to span the recent half
    assert 4 <= sampler._ring_len <= 16 and sampler._ring_stride >= 1
    # CL bound only runs after means converge (reference semantics);
    # exercise the device path directly
    assert np.isfinite(sampler._check_cl_bounds())
    # disabled when the CL test can never bind
    info2, _ = _make_info(n_chains=8, max_samples=100)
    info2["sampler"]["mcmc"].update({
        "learn_every": 50, "Rminus1_cl_stop": 1e6, "seed": 5,
    })
    _, sampler2 = run(info2)
    assert sampler2.cl_bounds_records == 0 and sampler2._ring is None


def test_max_wall_budget():
    """max_wall stops an unconverged run at an epoch boundary."""
    info = random_gaussian_info(dim=2, random_state=21)
    info["sampler"] = {"mcmc": {"seed": 9, "n_chains": 32,
                                "max_samples": 10**9,
                                "Rminus1_stop": 1e-12,  # never converges
                                "max_wall": 1e-6}}
    _, sampler = run(info)
    assert not sampler.converged
    # at least the first dispatched epoch(s) completed, then the budget hit
    assert 0 < sampler.n_steps < 10**9
