"""Auxiliary subsystems: CLI, doc/bib, rotations, coordination fallbacks."""

import numpy as np
import pytest


def test_random_SO_N_is_haar_special_orthogonal():
    import jax

    from cobaya_tpu.ops.rotation import random_SO_N

    keys = jax.random.split(jax.random.key(0), 200)
    qs = np.asarray(jax.vmap(lambda k: random_SO_N(k, 4))(keys))
    for q in qs[:10]:
        assert np.allclose(q @ q.T, np.eye(4), atol=1e-5)
        assert np.isclose(np.linalg.det(q), 1.0, atol=1e-4)
    # columns uniform on the sphere: mean ~ 0
    assert np.all(np.abs(qs[:, :, 0].mean(0)) < 0.15)


def test_chi_squared_and_inverse_cholesky():
    import jax.numpy as jnp

    from cobaya_tpu.ops.rotation import chi_squared, inverse_cholesky_jax

    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    delta = np.array([[0.5, -0.2], [1.0, 0.0]])
    expected = np.einsum("ni,ij,nj->n", delta, np.linalg.inv(cov), delta)
    got = np.asarray(chi_squared(np.linalg.inv(cov), jnp.asarray(delta)))
    assert np.allclose(got, expected, atol=1e-5)
    invL = np.asarray(inverse_cholesky_jax(cov))
    assert np.allclose(invL @ np.linalg.cholesky(cov), np.eye(2), atol=1e-5)


def test_doc_lists_and_prints():
    from cobaya_tpu.doc import doc

    names = doc()
    assert "gaussian_mixture" in names and "mcmc" in names
    text = doc("mcmc", kind="sampler")
    assert "proposal_scale" in text


def test_bib_collects():
    from cobaya_tpu.bib import get_bib_info

    blocks = get_bib_info({
        "likelihood": {"gaussian_mixture": {"means": [[0]], "covs": [[[1]]]}},
        "params": {"x": {"prior": [0, 1]}},
        "sampler": {"mcmc": None},
    })
    assert "framework" in blocks
    assert "gaussian_mixture" in blocks


def test_main_dispatcher_doc(capsys):
    import sys

    from cobaya_tpu.__main__ import run_command

    argv = sys.argv
    sys.argv = ["cobaya_tpu", "doc", "one"]
    try:
        run_command()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "one" in out


def test_coordination_serial_fallbacks():
    from cobaya_tpu.parallel import state as st

    assert st.is_main_process()
    assert st.share(42) == 42
    assert st.gather(7) == [7]
    assert st.allgather("x") == ["x"]
    assert st.scatter([1, 2, 3]) == 1
    assert st.zip_gather([1, 2]) == [(1,), (2,)]
    st.barrier()

    @st.from_root
    def compute():
        return {"a": 1}

    assert compute() == {"a": 1}

    @st.root_only
    def only_root():
        return "done"

    assert only_root() == "done"


def test_process_state_machine():
    from cobaya_tpu.parallel.state import OtherProcessError, ProcessState

    with ProcessState("test") as state:
        state.check_error()  # no peers, no error
    # exceptions propagate (and set the ERROR state)
    with pytest.raises(ValueError):
        with ProcessState("test2"):
            raise ValueError("boom")


def test_sync_errors_decorator():
    from cobaya_tpu.parallel.state import sync_errors

    @sync_errors
    def fine():
        return 5

    assert fine() == 5

    @sync_errors
    def boom():
        raise RuntimeError("x")

    with pytest.raises(RuntimeError):
        boom()


def test_install_api_no_network():
    from cobaya_tpu.install import install

    # nothing to install for built-in analytic components
    ok = install({
        "likelihood": {"one": None},
        "params": {"x": {"prior": [0, 1]}},
    }, test=True)
    assert ok


def test_autoselect_covmat(tmp_path):
    import numpy as np

    from cobaya_tpu.cosmo_input.autoselect_covmat import get_best_covmat

    cov = np.array([[0.04, 0.0], [0.0, 0.09]])
    with open(tmp_path / "base_plikHM_TT.covmat", "w") as f:
        f.write("# a b\n")
        np.savetxt(f, cov)
    with open(tmp_path / "other_BAO.covmat", "w") as f:
        f.write("# c\n")
        np.savetxt(f, [[1.0]])
    best = get_best_covmat({"a": [], "b": ["beta"]}, ["plikHM_TT"],
                           str(tmp_path))
    assert best["name"] == "base_plikHM_TT.covmat"
    assert np.allclose(best["covmat"], cov)


def test_covmat_auto_option(tmp_path):
    import numpy as np

    from cobaya_tpu.run import run

    cov = np.array([[0.0025, 0.0], [0.0, 0.0025]])
    with open(tmp_path / "match_ab.covmat", "w") as f:
        f.write("# a b\n")
        np.savetxt(f, cov)
    info = {
        "params": {
            "a": {"prior": [0, 1], "ref": 0.5},
            "b": {"prior": [0, 1], "ref": 0.5},
        },
        "likelihood": {"gaussian_mixture": {
            "means": [[0.5, 0.5]], "covs": [cov.tolist()],
            "input_params": ["a", "b"],
        }},
        "sampler": {"mcmc": {
            "seed": 3, "n_chains": 8, "max_samples": 60,
            "covmat": "auto", "covmat_dirs": str(tmp_path),
            "learn_proposal": False,
        }},
    }
    _, sampler = run(info)
    assert np.allclose(sampler._proposal.covmat, cov)


def test_evaluate_sampler():
    import numpy as np

    from cobaya_tpu.run import run

    info = {
        "params": {"x": {"prior": [0, 1], "ref": 0.3}},
        "likelihood": {"gaussian_mixture": {
            "means": [[0.5]], "covs": [[[0.01]]], "input_params": ["x"]}},
        "sampler": {"evaluate": {"N": 3, "override": {"x": 0.5}}},
    }
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    assert len(sample) == 3
    assert np.allclose(sample["x"], 0.5)
    # logpost at the peak of the gaussian
    from scipy.stats import norm

    expected = norm(0.5, 0.1).logpdf(0.5)
    assert np.allclose(-sample["minuslogpost"], expected, atol=1e-5)


def test_collection_to_pandas():
    import numpy as np

    from cobaya_tpu.io.collection import SampleCollection

    coll = SampleCollection(sampled_params=["a"], derived_params=[],
                            prior_names=["0"], like_names=["l"])
    coll.add([0.5], weight=2, logpriors=[-1.0], loglikes=[-2.0])
    df = coll.to_pandas()
    assert list(df.columns) == coll.columns
    assert df["weight"][0] == 2


def test_dump_timing():
    from cobaya_tpu.models.model import get_model

    info = {
        "params": {"x": {"prior": [0, 1], "ref": 0.5}},
        "likelihood": {"gaussian_mixture": {
            "means": [[0.5]], "covs": [[[0.01]]], "input_params": ["x"]}},
        "timing": True,
    }
    model = get_model(info)
    for _ in range(3):
        model.logposterior([0.4], cached=False)
    rows = model.dump_timing()
    assert rows and rows[0][2] >= 1  # (name, avg, n_evals)


def test_filelock_blocks_live_and_takes_over_stale(tmp_path):
    import os

    import pytest as _pytest

    from cobaya_tpu.io.output import FileLock
    from cobaya_tpu.utils.log import LoggedError

    base = str(tmp_path / "run")
    lock1 = FileLock(base)
    lock1.acquire()
    lock2 = FileLock(base)
    with _pytest.raises(LoggedError):
        lock2.acquire()  # held by a live process (us)
    lock1.release()
    # stale lock with dead pid gets taken over
    with open(base + ".locked", "w") as f:
        f.write("999999999")
    lock3 = FileLock(base)
    lock3.acquire()
    lock3.release()


def test_device_cl_bounds_statistic():
    """Device ring CL-bound R-1: debiased spread, host parity, pooling."""
    import jax
    import numpy as np

    from cobaya_tpu.ops.convergence import (
        cl_bounds_stats_jax,
        pool_cl_bounds_stats,
        rminus1_cl_bounds,
    )

    rng = np.random.default_rng(0)
    M, C, d = 128, 512, 3
    # identically-distributed walkers: the true bound spread is ZERO; the
    # debiased statistic must be far below the raw quantile-noise floor
    ring = rng.normal(size=(M, C, d))
    dev = jax.device_get(jax.jit(cl_bounds_stats_jax)(ring))
    r_dev = pool_cl_bounds_stats([dev])
    r_raw = rminus1_cl_bounds(
        np.swapaxes(ring, 0, 1), None, confidence=0.95
    ).max()
    assert r_raw > 0.15  # the floor the debias removes
    assert r_dev < 0.6 * r_raw, (r_dev, r_raw)

    # genuinely spread walkers: both statistics see the real signal
    shift = 1.0 * rng.standard_normal((1, C, 1))
    ring2 = ring + shift
    dev2 = jax.device_get(jax.jit(cl_bounds_stats_jax)(ring2))
    r_dev2 = pool_cl_bounds_stats([dev2])
    r_raw2 = rminus1_cl_bounds(
        np.swapaxes(ring2, 0, 1), None, confidence=0.95
    ).max()
    assert np.isclose(r_dev2, r_raw2, rtol=0.1), (r_dev2, r_raw2)

    # pooling two halves of the walker population == pooling all at once
    half1 = jax.device_get(jax.jit(cl_bounds_stats_jax)(ring2[:, :256]))
    half2 = jax.device_get(jax.jit(cl_bounds_stats_jax)(ring2[:, 256:]))
    r_pooled = pool_cl_bounds_stats([half1, half2])
    assert np.isclose(r_pooled, r_dev2, rtol=1e-5), (r_pooled, r_dev2)


def test_pool1d_find_indices():
    """Tolerant retrieval from a 1D computation pool (reference
    tests/test_pools.py:29)."""
    from cobaya_tpu.utils.tools import Pool1D

    rng = np.random.default_rng(5)
    values = rng.random(500)
    pool = Pool1D(values)
    req = rng.choice(values, 100) * (1 + 1e-12)  # tiny relative perturbation
    req[-1] = req[0]  # duplicates allowed
    idx = pool.find_indices(req)
    assert np.allclose(pool[idx], req, atol=1e-8)
    with pytest.raises(ValueError):
        pool.find_indices([2.0])  # out of range


def test_pool2d_find_indices():
    """Tolerant retrieval of 2D pairs (reference tests/test_pools.py:50)."""
    from cobaya_tpu.utils.tools import Pool2D

    rng = np.random.default_rng(7)
    values = rng.random((300, 2))
    pool = Pool2D(values)
    pick = rng.integers(0, len(pool.values), 50)
    req = pool.values[pick] * (1 + 1e-12)
    idx = pool.find_indices(req)
    assert np.allclose(pool[idx], req, atol=1e-8)
    with pytest.raises(ValueError):
        pool.find_indices([[5.0, 5.0]])
    assert pool.d == 2


def test_autoselect_covmat_ranked_cascade(tmp_path):
    """Reference-depth selection: the correct pick needs the full cascade
    (params tie -> likelihood-alias tie -> fewest params -> simplest name),
    not a filename/param-count match.  Mirrors
    /root/reference/cobaya/cosmo_input/autoselect_covmat.py:117-250."""
    import numpy as np

    from cobaya_tpu.cosmo_input.autoselect_covmat import (
        get_best_covmat, get_covmat_database)

    def write(name, params):
        with open(tmp_path / name, "w") as f:
            f.write("# " + " ".join(params) + "\n")
            np.savetxt(f, np.eye(len(params)) * 0.01)

    # all share the model params {H0, omm}; the winner must be picked by
    # the likelihood alias, then by having fewer extra params
    write("base_plikHM_TTTEEE_lowl_lowE.covmat", ["H0", "omm"])
    write("base_w_plikHM_TTTEEE_lowl_lowE.covmat", ["H0", "omm", "w"])
    write("base_lensing_only.covmat", ["H0", "omm"])
    write("base_mnu_BAO.covmat", ["H0", "omm", "mnu"])
    params = {"H0": {}, "omm": {"renames": ["omegam"]}}
    likes = {"planck_high": {"aliases": ["plikHM_TTTEEE"]}}
    best = get_best_covmat(params, likes, str(tmp_path), cached=False)
    assert best["name"] == "base_plikHM_TTTEEE_lowl_lowE.covmat", best
    # renames count toward the parameter score
    write("base_omegam_extra.covmat", ["omegam", "H0", "ns"])
    best2 = get_best_covmat(params, {}, str(tmp_path), cached=False)
    # without likelihood info, both 2-param matches tie on params; the
    # fewest-params rule drops the 3-param files, simplest name wins
    assert best2["name"] in ("base_plikHM_TTTEEE_lowl_lowE.covmat",
                             "base_lensing_only.covmat")
    db = get_covmat_database([str(tmp_path)], cached=False)
    key = next(k for k, v in db.items()
               if v["name"] == "base_mnu_BAO.covmat")
    assert key.base == "base" and "mnu" in key.paramtags
    assert "BAO" in key.datatags


def test_autoselect_covmat_job_item_exact_match(tmp_path):
    """Grid jobs hit exact tag-key matches, including 'without' drops."""
    import numpy as np

    from cobaya_tpu.cosmo_input.autoselect_covmat import get_best_covmat_ext

    with open(tmp_path / "base_mnu_plik_BAO.covmat", "w") as f:
        f.write("# H0 mnu\n")
        np.savetxt(f, np.eye(2))

    class Job:
        param_set = {"mnu"}
        base = "base"

        class data_set:
            names = {"plik", "BAO"}

    got = get_best_covmat_ext([str(tmp_path)], {"H0": {}}, {},
                              cached=False, job_item=Job)
    assert got and got["name"] == "base_mnu_plik_BAO.covmat"

    class Job2(Job):
        class data_set:
            names = {"plik", "BAO", "newdata"}

    got2 = get_best_covmat_ext(
        [str(tmp_path)], {"H0": {}}, {}, cached=False, job_item=Job2,
        cov_map={"without": ["newdata"]})
    assert got2 and got2["name"] == "base_mnu_plik_BAO.covmat"
