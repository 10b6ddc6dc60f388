"""Head-to-head posterior agreement with the ACTUAL reference implementation.

Runs the real cobaya (from /root/reference, with the dependency stubs the
baseline-measurement script installs) and this framework's mcmc on the SAME
correlated-Gaussian posterior, then checks the recovered posterior means and
covariances agree within the joint Monte-Carlo error — the BASELINE.md
"posterior mean/cov agreement with reference" criterion demonstrated by
execution rather than by both sides merely passing their own accuracy tests.

Skips when the reference checkout is not present.  The reference run is the
expensive part (~20 s CPU): one shared module-scoped fixture.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_PATH = "/root/reference"
DIM = 4
SEED = 5
REF_SAMPLES = 24000


def _posterior():
    rng = np.random.default_rng(SEED)
    q, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    eigs = np.geomspace(0.05, 1.0, DIM)
    cov = (q * eigs) @ q.T
    cov = (cov + cov.T) / 2
    mean = rng.normal(0, 1, DIM)
    return mean, cov


def _info(mean, cov, sampler):
    return {
        "params": {
            f"x{i}": {"prior": {"dist": "norm", "loc": 0, "scale": 4},
                      "ref": 0.0}
            for i in range(DIM)
        },
        "likelihood": {"gaussian_mixture": {
            "means": [mean.tolist()], "covs": [cov.tolist()],
            "input_params_prefix": "x",
        }},
        "sampler": sampler,
    }


@pytest.fixture(scope="module")
def reference_moments(tmp_path_factory):
    if not os.path.isdir(os.path.join(REF_PATH, "cobaya")):
        pytest.skip("reference checkout not available")
    # the baseline script installs getdist/portalocker stubs at import and
    # prepends /root/reference to sys.path
    spec = importlib.util.spec_from_file_location(
        "ref_baseline_stubs",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "measure_reference_baseline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_baseline_stubs"] = mod
    spec.loader.exec_module(mod)
    from cobaya.run import run as ref_run

    mean, cov = _posterior()
    info = _info(mean, cov, {"mcmc": {
        "seed": 10, "covmat": cov,
        "covmat_params": [f"x{i}" for i in range(DIM)],
        "Rminus1_stop": 0.005, "max_samples": REF_SAMPLES,
    }})
    # no "output": the reference probes portalocker's __spec__ when writing
    # chain files, which the baseline stub cannot satisfy; products stay in
    # memory exactly as in scripts/measure_reference_baseline.py
    _, sampler = ref_run(info)
    prod = sampler.products()["sample"]
    vals = prod[[f"x{i}" for i in range(DIM)]].to_numpy(float)
    w = prod["weight"].to_numpy(float)
    n = len(vals)
    half, wh = vals[n // 2:], w[n // 2:]
    mu = np.average(half, weights=wh, axis=0)
    dx = half - mu
    cov_est = (wh[:, None] * dx).T @ dx / wh.sum()
    # MC standard error of the mean from 8 weighted blocks (robust to
    # autocorrelation without estimating tau)
    blocks = np.array_split(np.arange(len(half)), 8)
    bmeans = np.stack([
        np.average(half[b], weights=wh[b], axis=0) for b in blocks
    ])
    se = bmeans.std(axis=0, ddof=1) / np.sqrt(len(blocks))
    return {"mean": mu, "cov": cov_est, "se": se,
            "truth_mean": mean, "truth_cov": cov}


def test_posterior_moments_match_reference(reference_moments):
    from cobaya_tpu.run import run

    ref = reference_moments
    info = _info(ref["truth_mean"], ref["truth_cov"], {"mcmc": {
        "seed": 11, "n_chains": 256,
        "covmat": ref["truth_cov"],
        "covmat_params": [f"x{i}" for i in range(DIM)],
        "Rminus1_stop": 0.005, "Rminus1_cl_stop": 1e6,
        "max_samples": 4000,
    }})
    _, sampler = run(info)
    coll = sampler.products()["sample"]
    ours_mean = coll.mean()
    ours_cov = coll.cov()
    # with 256 walkers our MC error is far below the reference's: the
    # cross-framework tolerance is dominated by the reference run's se
    z = np.abs(ours_mean - ref["mean"]) / np.maximum(ref["se"], 1e-9)
    assert np.all(z < 6.0), (z, ours_mean, ref["mean"])
    # covariance entries: MC error ~ sqrt(2/ESS_ref) per unit scale
    scale = np.sqrt(np.outer(np.diag(ref["truth_cov"]),
                             np.diag(ref["truth_cov"])))
    rel = np.abs(ours_cov - ref["cov"]) / scale
    assert rel.max() < 0.25, rel.max()
    # and both recover the analytic truth
    for m, c in ((ours_mean, ours_cov), (ref["mean"], ref["cov"])):
        assert np.all(np.abs(m - ref["truth_mean"])
                      / np.sqrt(np.diag(ref["truth_cov"])) < 0.35)
        assert np.abs(c - ref["truth_cov"]).max() / scale.max() < 0.35


def _install_pybobyqa_stub():
    """The reference's minimize module imports pybobyqa at module scope
    even when method='scipy'; a vocabulary-only stub satisfies the import
    (solve is never called on the scipy path)."""
    import importlib.machinery
    import types

    pb = types.ModuleType("pybobyqa")
    ctl = types.ModuleType("pybobyqa.controller")
    for i, name in enumerate([
        "EXIT_MAXFUN_WARNING", "EXIT_SLOW_WARNING",
        "EXIT_FALSE_SUCCESS_WARNING", "EXIT_INPUT_ERROR",
        "EXIT_TR_INCREASE_ERROR", "EXIT_LINALG_ERROR", "EXIT_SUCCESS",
    ]):
        setattr(ctl, name, 100 + i)
    pb.controller = ctl
    pb.solve = None
    pb.__spec__ = importlib.machinery.ModuleSpec("pybobyqa", None)
    ctl.__spec__ = importlib.machinery.ModuleSpec("pybobyqa.controller",
                                                  None)
    sys.modules["pybobyqa"] = pb
    sys.modules["pybobyqa.controller"] = ctl


def test_map_point_matches_reference(reference_moments):
    """Same posterior, both frameworks' minimize sampler: the MAP points
    and -log(posterior) values must coincide (reference scipy path vs our
    batched L-BFGS)."""
    _install_pybobyqa_stub()
    from cobaya.run import run as ref_run

    from cobaya_tpu.run import run

    mean, cov = (reference_moments["truth_mean"],
                 reference_moments["truth_cov"])
    names = [f"x{i}" for i in range(DIM)]
    info_ref = _info(mean, cov, {"minimize": {
        "method": "scipy", "best_of": 2, "seed": 3}})
    _, ref_sampler = ref_run(info_ref)
    ref_min = ref_sampler.products()["minimum"]
    ref_point = np.array([float(ref_min[n]) for n in names])
    ref_logpost = float(ref_min["minuslogpost"])
    info_ours = _info(mean, cov, {"minimize": {"seed": 4}})
    _, sampler = run(info_ours)
    ours = sampler.products()["minimum"]
    ours_point = np.array([np.asarray(ours[n]).ravel()[0]
                           for n in names])
    ours_logpost = float(np.asarray(ours["minuslogpost"]).ravel()[0])
    sig = np.sqrt(np.diag(cov))
    assert np.all(np.abs(ours_point - ref_point) / sig < 2e-3), (
        ours_point, ref_point)
    np.testing.assert_allclose(ours_logpost, ref_logpost, rtol=1e-6)


def test_logposterior_values_match_reference_exactly(reference_moments):
    """Single-point posterior evaluation: logpost / logprior / loglike from
    the reference's Model and ours must agree to f32 float precision on
    the same inputs (no Monte-Carlo error in this comparison)."""
    from cobaya.model import get_model as ref_get_model

    from cobaya_tpu.models.model import get_model

    mean, cov = (reference_moments["truth_mean"],
                 reference_moments["truth_cov"])
    info = _info(mean, cov, None)
    info.pop("sampler")
    ref_model = ref_get_model(dict(info))
    model = get_model(dict(info))
    rng = np.random.default_rng(7)
    for _ in range(5):
        pt = rng.normal(0, 1.5, DIM)
        ref_lp = ref_model.logposterior(pt)
        lp = model.logposterior(pt)
        # the device path carries float32 state (TPU-native design, full-
        # f32 matmul precision): agreement is bounded by f32 epsilon, far
        # below any formula discrepancy
        np.testing.assert_allclose(lp.logpost, ref_lp.logpost, rtol=1e-6)
        np.testing.assert_allclose(lp.logpriors, ref_lp.logpriors,
                                   rtol=1e-6)
        np.testing.assert_allclose(lp.loglikes, ref_lp.loglikes,
                                   rtol=1e-6)
