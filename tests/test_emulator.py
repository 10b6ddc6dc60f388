"""Device-resident Boltzmann surrogate: physics sanity, table-vs-direct
accuracy, traced-vs-eager parity, and end-to-end cosmology sampling."""

import numpy as np
import pytest

import jax

from cobaya_tpu.models.model import get_model
from cobaya_tpu.theories.emulator import background as bg
from cobaya_tpu.theories.emulator import cmbspec as cs
from cobaya_tpu.theories.emulator import mockdata as md
from cobaya_tpu.theories.emulator import power as pw

FID = dict(md.FIDUCIAL)

COSMO_PARAMS = {
    "ombh2": {"prior": [0.019, 0.026], "ref": 0.02237, "proposal": 1.5e-4},
    "omch2": {"prior": [0.09, 0.15], "ref": 0.12, "proposal": 1.5e-3},
    "H0": {"prior": [55, 80], "ref": 67.36, "proposal": 0.6},
    "tau": {"prior": [0.01, 0.12], "ref": 0.0544, "proposal": 0.008},
    "logA": {"prior": [2.85, 3.25], "ref": 3.044, "proposal": 0.015},
    "ns": {"prior": [0.9, 1.05], "ref": 0.9649, "proposal": 0.004},
}
X_FID = [0.02237, 0.12, 67.36, 0.0544, 3.044, 0.9649]


def test_background_planck_scales():
    """Exact background must land near the known LCDM benchmark values."""
    dens = bg.densities(FID, np)
    zs, rs, dm, th100, zd, rd = bg.acoustic_scales(dens, np)
    assert abs(zs - 1090) < 10
    assert abs(rs - 144.4) < 2.0        # Planck: 144.43 Mpc
    assert abs(th100 - 1.0411) < 0.005  # Planck: 1.04109
    assert abs(rd - 147.1) < 5.0        # EH98 z_drag fit offset ~2%
    assert abs(bg.age_gyr(dens, np) - 13.80) < 0.05
    D, f = bg.growth_at_z(dens, [0.0], np)
    assert abs(D[0] - 1.0) < 1e-10
    assert abs(f[0] - dens["om"] ** 0.55) < 0.01


def test_power_sanity():
    s8 = pw.sigma8_0(bg.densities(FID, np), FID, np)
    assert 0.7 < s8 < 0.95
    k = np.geomspace(1e-3, 5, 100)
    dens = bg.densities(FID, np)
    pl = pw.linear_power(dens, FID, k, [0.0, 1.0], np)
    pnl = pw.halofit_takahashi(dens, FID, k, [0.0, 1.0], pl, np)
    # quasi-linear regime unchanged, nonlinear boosted, growth ordering
    assert abs(pnl[0, 0] / pl[0, 0] - 1) < 0.05
    assert pnl[0, -1] / pl[0, -1] > 2.0
    assert np.all(pl[1] < pl[0])
    # z=1 nonlinear boost smaller than z=0
    assert pnl[1, -1] / pl[1, -1] < pnl[0, -1] / pl[0, -1]


def test_cl_table_matches_direct():
    """Phase-aligned PCA table reproduces the source off-grid to <2%."""
    ranges = {p: tuple(v["prior"]) for p, v in COSMO_PARAMS.items()}
    # table carries un-warp headroom beyond the compared range (the theory
    # class reserves 12% via _table_lmax)
    em = cs.ClEmulator.build(ranges, lmax=800, grid_nodes=3, n_pca=40,
                             ell_stride=6, fixed={"mnu": 0.06})
    ells = np.arange(801)
    use = slice(0, 701)
    rng = np.random.default_rng(7)
    for _ in range(3):
        q = {p: rng.uniform(*r) for p, r in ranges.items()}
        q["mnu"] = 0.06
        direct = cs.acoustic_cls(q, ells, np)
        emu = em.emulate(q, np)
        for spec in cs.SPECTRA:
            scale = np.abs(direct[spec][use]).max()
            assert np.abs(emu[spec][use] - direct[spec][use]).max() \
                < 0.02 * scale, spec


def test_cl_table_warp_basis():
    """Chebyshev-in-r un-warp matches the gather un-warp off-grid.

    The gather un-warp resamples the synthesized spectrum at per-sample
    warped indices (pathologically slow per-walker on TPU); the warp-basis
    path folds the warp into a precompiled Chebyshev expansion evaluated
    by a dense matmul.  Both are approximations of the same resampling, so
    they must agree to well under the table's own 2% error budget."""
    ranges = {p: tuple(v["prior"]) for p, v in COSMO_PARAMS.items()}
    em = cs.ClEmulator.build(ranges, lmax=800, grid_nodes=3, n_pca=40,
                             ell_stride=6, fixed={"mnu": 0.06})
    assert em.warp_domain is not None and em._warp is not None
    rng = np.random.default_rng(3)
    use = slice(2, 701)
    for _ in range(3):
        q = {p: rng.uniform(*r) for p, r in ranges.items()}
        q["mnu"] = 0.06
        fast = em.emulate(q, np)
        slow = em.emulate(q, np, use_warp_basis=False)
        for spec in cs.SPECTRA:
            scale = np.abs(slow[spec][use]).max()
            assert np.abs(fast[spec][use] - slow[spec][use]).max() \
                < 2e-3 * scale, spec


def test_hat_weights_match_multilinear():
    """Dense hat-product weights = exact multilinear corner interpolation."""
    ranges = {p: tuple(v["prior"]) for p, v in COSMO_PARAMS.items()}
    em = cs.ClEmulator.build(ranges, lmax=120, grid_nodes=4, n_pca=8,
                             ell_stride=8, fixed={"mnu": 0.06},
                             phase_align=False)
    names = list(em.axes)
    rng = np.random.default_rng(11)
    for _ in range(4):
        q = {p: rng.uniform(*ranges[p]) for p in names}
        w = em._hat_weights(q, np)
        assert w.shape == (4 ** len(names),)
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
        # brute-force multilinear reference
        tab = em.coeffs["tt"]
        idxs, fracs = [], []
        for p in names:
            nodes = em.axes[p]
            i = np.clip(np.searchsorted(nodes, q[p]) - 1, 0,
                        len(nodes) - 2)
            idxs.append(i)
            fracs.append((q[p] - nodes[i]) / (nodes[i + 1] - nodes[i]))
        ref = 0.0
        for corner in range(2 ** len(names)):
            bits = [(corner >> d) & 1 for d in range(len(names))]
            cw = np.prod([f if b else 1 - f for f, b in zip(fracs, bits)])
            ref = ref + cw * tab[tuple(i + b for i, b in zip(idxs, bits))]
        got = w @ tab.reshape(-1, tab.shape[-1])
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_cl_table_roundtrip(tmp_path):
    ranges = {p: tuple(v["prior"]) for p, v in COSMO_PARAMS.items()}
    em = cs.ClEmulator.build(ranges, lmax=300, grid_nodes=3, n_pca=20,
                             ell_stride=8, fixed={"mnu": 0.06})
    f = str(tmp_path / "table.npz")
    em.save(f)
    em2 = cs.ClEmulator.load(f)
    q = {p: 0.5 * (r[0] + r[1]) for p, r in ranges.items()}
    q["mnu"] = 0.06
    a, b = em.emulate(q, np), em2.emulate(q, np)
    for spec in cs.SPECTRA:
        np.testing.assert_allclose(a[spec], b[spec], rtol=0, atol=1e-10)


def _joint_info(tmp_path, cl_mode="table", with_bao=True, with_sn=True):
    dataset = md.make_pliklite_dataset(str(tmp_path / "plik"), lmin=30,
                                       lmax=500)
    info = {
        "theory": {"emulator": {
            "lmax": 520, "cl_mode": cl_mode, "grid_nodes": 3,
            "ell_stride": 6,
        }},
        "likelihood": {"plik": {
            "class": "cobaya_tpu.likelihoods.base_classes.PlanckPlikLite",
            "dataset_file": dataset,
        }},
        "params": {
            **{k: dict(v) for k, v in COSMO_PARAMS.items()},
            "A_planck": {"prior": [0.9, 1.1], "ref": 1.0,
                         "proposal": 0.002},
            "sigma8": {"derived": True},
            "rdrag": {"derived": True},
            "omegam": {"derived": True},
            "thetastar": {"derived": True},
        },
    }
    if with_bao:
        info["likelihood"]["bao"] = {
            "class": "cobaya_tpu.likelihoods.base_classes.BAO",
            "measurements": md.bao_measurements(),
        }
    if with_sn:
        info["likelihood"]["sn"] = {
            "class": "cobaya_tpu.likelihoods.base_classes.SN",
            "data": md.sn_data().tolist(),
            "marginalize_M": True,
        }
    return info


@pytest.mark.parametrize("cl_mode", ["table", "direct"])
def test_traced_matches_eager_joint(tmp_path, cl_mode):
    """Full cosmology pipeline: jitted device path == eager numpy path."""
    info = _joint_info(tmp_path, cl_mode=cl_mode)
    model = get_model(info)
    assert all(like.jittable for like in model.likelihood.values())
    assert list(model.theory.values())[0].jittable
    x = np.asarray(X_FID + [1.0], float)
    eager = model.logposterior(x)
    with jax.enable_x64(True):
        fn = jax.jit(model.make_logposterior_fn())
        lp, lpri, ll, der = fn(np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(ll), eager.loglikes,
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(der), eager.derived,
                               rtol=2e-4, atol=1e-6)


def test_fiducial_chi2_is_reasonable(tmp_path):
    """chi2 at the true parameters ~ nbins for the synthetic bandpowers."""
    info = _joint_info(tmp_path, with_bao=False, with_sn=False)
    model = get_model(info)
    lp = model.logposterior(np.asarray(X_FID + [1.0], float))
    nb = 3 * len(md._bin_edges(30, 500)) - 3
    chi2 = -2 * lp.loglikes[0]
    assert chi2 < nb + 6 * np.sqrt(2 * nb), chi2
    # derived params at fiducial reproduce the generator's cosmology
    names = list(model.parameterization.derived_params())
    d = dict(zip(names, lp.derived))
    assert abs(d["omegam"] - 0.315) < 0.01
    assert abs(d["rdrag"] - 150.6) < 1.0


def test_pk_interpolator_through_provider(tmp_path):
    info = {
        "theory": {"emulator": {"lmax": 100, "grid_nodes": 3,
                                "ell_stride": 8}},
        "likelihood": {"pklike": {
            "external": lambda _self=None: 0.0,
            "requires": {"Pk_interpolator": {
                "z": [0.0, 0.5], "k_max": 5.0, "nonlinear": True,
                "vars_pairs": [["delta_tot", "delta_tot"]]},
                "sigma8_z": {"z": [0.0, 0.5]},
                "fsigma8": {"z": [0.5]}},
        }},
        "params": {k: dict(v) for k, v in COSMO_PARAMS.items()},
    }
    model = get_model(info)
    model.logposterior(np.asarray(X_FID, float))
    th = list(model.theory.values())[0]
    interp = th.get_Pk_interpolator(nonlinear=True)
    lin = th.get_Pk_interpolator(nonlinear=False)
    assert interp.P(0.0, 1.0) > lin.P(0.0, 1.0)
    assert lin.P(0.5, 0.1) < lin.P(0.0, 0.1)
    s8z = th.get_sigma8_z([0.0, 0.5])
    assert s8z[0] > s8z[1] > 0.3
    fs8 = th.get_fsigma8([0.5])
    assert 0.3 < fs8[0] < 0.7


def test_flagship_covmat_roundtrip(tmp_path, monkeypatch):
    """Packaged-covmat path: harvest script writes the reference text
    format, proposal_covmat() loads it back; name/shape mismatches fall
    back to the diagonal."""
    import importlib.util
    import os

    from cobaya_tpu.theories.emulator import benchmodel as bm

    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "make_flagship_covmat.py")
    spec = importlib.util.spec_from_file_location("make_flagship_covmat",
                                                  script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    harvest = mod.from_npz

    names = bm.sampled_names()
    d = len(names)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(d, d))
    cov_true = a @ a.T / d + np.eye(d)
    npz = tmp_path / "hist.npz"
    np.savez(npz, n=[100, 200], moc=[np.eye(d), cov_true],
             com=[np.eye(d), np.eye(d)])
    out = tmp_path / "flagship.covmat"
    monkeypatch.setattr(bm, "COVMAT_FILE", str(out))
    harvest(str(npz))
    cov, got_names = bm.proposal_covmat()
    assert got_names == names
    np.testing.assert_allclose(cov, (cov_true + cov_true.T) / 2,
                               rtol=1e-6, atol=1e-9)
    # PSD regularization of a noisy (indefinite) epoch covariance
    bad = cov_true.copy()
    bad[0, 0] = -1.0
    np.savez(npz, n=[100], moc=[bad], com=[np.eye(d)])
    harvest(str(npz))
    cov2, _ = bm.proposal_covmat()
    assert np.linalg.eigvalsh(cov2).min() >= 0
    # wrong names -> diagonal fallback
    out.write_text("# a b c\n1 0 0\n0 1 0\n0 0 1\n")
    cov3, _ = bm.proposal_covmat()
    widths = np.array([{**bm.COSMO_PARAMS, **bm.NUISANCE_PARAMS}[p]
                       ["proposal"] for p in names])
    np.testing.assert_allclose(cov3, np.diag(widths ** 2))


def test_flagship_benchmodel_parity(tmp_path):
    """24-sampled-param flagship model (pliklite + CamSpec FG + BAO + SN):
    device path == eager path, chi2(truth) ~ n_data."""
    from cobaya_tpu.theories.emulator import benchmodel as bm

    info = bm.flagship_info(str(tmp_path), pliklite_lmax=400,
                            camspec_lmax=200, grid_nodes=3, ell_stride=8)
    model = get_model(info)
    assert all(like.jittable for like in model.likelihood.values())
    x = np.array([bm.TRUTH[p] for p in bm.sampled_names()])
    eager = model.logposterior(x)
    nb_plik = 3 * (len(md._bin_edges(30, 400)) - 1)
    chi2 = -2 * eager.loglikes[0]
    assert chi2 < nb_plik + 6 * np.sqrt(2 * nb_plik)
    n_cams = 6 * (200 - 30 + 1)
    chi2c = -2 * eager.loglikes[1]
    assert chi2c < n_cams + 6 * np.sqrt(2 * n_cams)
    with jax.enable_x64(True):
        fn = jax.jit(model.make_logposterior_fn())
        ll = np.asarray(fn(np.asarray(x, np.float64))[2])
    np.testing.assert_allclose(ll, eager.loglikes, rtol=3e-4, atol=2e-3)
    # requirement-derived products (BAO's rdrag) must flow even when the
    # caller skips derived output (regression: -inf under return_derived=0)
    lp = model.logposterior(x, return_derived=False)
    assert np.all(np.isfinite(lp.loglikes))


def test_e2e_cosmo_mcmc_short(tmp_path):
    """Short adaptive-MCMC run through the full device cosmology stack."""
    from cobaya_tpu.run import run

    info = _joint_info(tmp_path)
    info["sampler"] = {"mcmc": {
        "max_samples": 300, "n_chains": 8, "seed": 3, "burn_in": 0,
        "measure_speeds": False,
    }}
    upd, sampler = run(info)
    products = sampler.products()
    assert "sample" in products
    col = products["sample"]
    assert len(col) > 0
    # derived columns present and finite
    assert np.isfinite(np.asarray(
        col["sigma8"], float)).all()


def test_minimize_flagship_map(tmp_path):
    """Batched L-BFGS MAP on the device cosmology stack recovers truth.

    The synthetic datasets are generated at the fiducial, so the
    max-posterior point must land near it (cosmology block) with a higher
    posterior than the truth's own (MAP >= any point by definition up to
    optimizer tolerance)."""
    from cobaya_tpu.run import run

    info = _joint_info(tmp_path, with_sn=False)
    info["sampler"] = {"minimize": {"seed": 1, "best_of": 4}}
    _, sampler = run(info)
    model = get_model({k: v for k, v in info.items() if k != "sampler"})
    x_true = np.asarray(X_FID + [1.0], float)
    lp_true = model.logposterior(x_true, return_derived=False).logpost
    assert -sampler.result["fun"] >= lp_true - 0.5
    x_map = sampler.result["x"]
    # cosmology block lands within the prior and close to truth (loose:
    # tau/logA partially degenerate at lmax 520)
    names = list(model.parameterization.sampled_params())
    for i, p in enumerate(names[:6]):
        lo, hi = COSMO_PARAMS[p]["prior"]
        assert lo < x_map[i] < hi
    assert abs(x_map[2] - 67.36) < 2.0        # H0
    assert abs(x_map[5] - 0.9649) < 0.02      # ns


def test_cosmo_walkers_shard_across_devices(tmp_path):
    """Flagship-style cosmology walkers shard over the 8-device mesh."""
    from cobaya_tpu.samplers.sampler import get_sampler

    assert len(jax.devices()) == 8  # conftest forces 8 virtual devices
    info = _joint_info(tmp_path, with_bao=False, with_sn=False)
    model = get_model(info)
    sampler = get_sampler({"mcmc": {"seed": 5, "n_chains": 16,
                                    "max_samples": 40, "burn_in": 0,
                                    "measure_speeds": False}}, model)
    assert sampler._mesh is not None
    sampler.run()
    x = sampler._carry.x
    assert len(x.sharding.device_set) == 8
    assert np.isfinite(np.asarray(sampler._carry.logpost)).all()


def test_post_reweight_flagship(tmp_path):
    """post() importance-reweighting over a cosmology chain: add an H0
    prior, check the reweighted mean shifts toward it."""
    from cobaya_tpu.post import post
    from cobaya_tpu.run import run

    info = _joint_info(tmp_path, with_bao=False, with_sn=False)
    info["sampler"] = {"mcmc": {
        "max_samples": 600, "n_chains": 8, "seed": 7, "burn_in": 0,
        "measure_speeds": False,
    }}
    _, sampler = run(info)
    sample = sampler.products()["sample"]
    post_info = {
        "params": info["params"],
        "likelihood": info["likelihood"],
        "theory": info["theory"],
        "post": {
            "suffix": "h0",
            "add": {"prior": {
                "h0pull": "lambda H0: -0.5 * ((H0 - 70.0) / 0.5)**2"
            }},
        },
    }
    _, result = post(post_info, sample)
    s = result.sample
    assert "h0pull" in s.prior_names
    h0_new = np.average(s["H0"], weights=s.weights)
    h0_old = np.average(sample["H0"], weights=sample.weights)
    assert h0_new > h0_old  # pulled toward 70


def test_nested_flagship_evidence(tmp_path):
    """Nested sampling on the device cosmology stack: finite logZ with a
    sane information content, posterior concentrated near the fiducial.

    Demonstrates the PolyChord-capability sampler on the real (reduced,
    lmax 520) cosmology pipeline rather than an analytic toy; reference
    capability: polychord over CAMB+Planck models."""
    from cobaya_tpu.run import run

    info = _joint_info(tmp_path, with_bao=False, with_sn=False)
    info["sampler"] = {"nested": {"seed": 3, "nlive": 64,
                                  "num_repeats": "1d",
                                  "precision_criterion": 0.05}}
    _, sampler = run(info)
    assert np.isfinite(sampler.logZ)
    assert sampler.logZstd > 0
    s = sampler.products()["sample"]
    h0 = np.average(s["H0"], weights=s.weights)
    h0_sd = np.sqrt(np.average((s["H0"] - h0) ** 2, weights=s.weights))
    # synthetic data generated at the fiducial: posterior must sit on it
    assert abs(h0 - 67.36) < max(5 * h0_sd, 2.5)
    # the run terminated with a usable evidence error bar
    assert sampler.logZstd < 2.0
