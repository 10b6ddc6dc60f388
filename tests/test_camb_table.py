"""Boltzmann-backed Cl-table pathway: generator script + accuracy budgets.

Covers VERDICT round-3 item 4: the ``cl_mode: table`` production pathway
must have (a) a generator for real-CAMB tables (scripts/make_cl_table.py),
(b) a committed table artifact exercising the load path, and (c) quantified
accuracy numbers — table-vs-source ΔD_l/D_l and the induced flagship
log-posterior distortion — not just self-consistency.

The CAMB-sourced accuracy test runs when ``camb`` is importable (gated the
same way as tests/test_cosmo_stored.py); the committed-artifact tests run
everywhere.  Measured budgets (documented in docs/cosmology.md):

- committed analytic-source table (3 nodes/axis, lmax 1400, PCA 40):
  rms ΔD_l/D_l ≤ 0.9% / 0.6% / 0.6% (TT/TE/EE) at held-out interior
  points over l in [30, 1200].
"""

import os

import numpy as np
import pytest

from cobaya_tpu.theories.emulator import cmbspec as cs
from cobaya_tpu.theories.emulator.emulator import DEFAULT_RANGES

TABLE_FILE = os.path.join(
    os.path.dirname(__file__), "..", "cobaya_tpu", "theories", "emulator",
    "tables", "cl_analytic_l1400_n3.npz",
)


def _interior_draws(rng, n):
    return [
        {**{k: rng.uniform(lo + 0.1 * (hi - lo), hi - 0.1 * (hi - lo))
            for k, (lo, hi) in DEFAULT_RANGES.items()}, "mnu": 0.06}
        for _ in range(n)
    ]


def test_committed_table_loads_and_meets_budget():
    """The shipped artifact reproduces its source to <1.5% rms (TT/TE/EE)
    at held-out interior points (measured: 0.9%/0.6%/0.6%)."""
    tab = cs.ClEmulator.load(TABLE_FILE)
    assert tab.lmax >= 1400 and tab.lA_ref > 0
    rng = np.random.default_rng(3)
    sl = slice(30, 1201)
    for p in _interior_draws(rng, 6):
        got = tab.emulate(p, np)
        want = cs.acoustic_cls(p, np.arange(tab.lmax + 1), np)
        for s in ("tt", "te", "ee"):
            w, g = want[s][sl], got[s][sl]
            err = np.sqrt(np.mean((g - w) ** 2) / np.mean(w ** 2))
            assert err < 0.015, (s, err)


def test_committed_table_through_theory_class(tmp_path):
    """table_file plumbing: the emulator theory loads the artifact and the
    traced flagship-style posterior evaluates through it."""
    from cobaya_tpu.models.model import get_model

    info = {
        "params": {
            "ombh2": 0.02237, "omch2": 0.12, "tau": 0.0544,
            "logA": {"prior": {"min": 2.9, "max": 3.2}, "ref": 3.044},
            "ns": 0.9649,
            "H0": {"prior": {"min": 60.0, "max": 75.0}, "ref": 67.36},
        },
        "theory": {"emulator": {"lmax": 1200, "cl_mode": "table",
                                "table_file": TABLE_FILE}},
    }
    # a real Cl consumer: the traced pliklite on a synthetic dataset
    from cobaya_tpu.theories.emulator import mockdata as md

    ini = md.make_pliklite_dataset(str(tmp_path / "pl"), lmin=30, lmax=1200)
    info["likelihood"] = {"pliklite": {
        "class": "cobaya_tpu.likelihoods.base_classes.PlanckPlikLite",
        "dataset_file": ini,
    }}
    info["params"]["A_planck"] = 1.0
    model = get_model(info)
    fn = model.make_logposterior_fn()
    lp = fn(np.array([3.044, 67.36]))[0]
    assert np.isfinite(float(lp))


def test_table_mode_posterior_shift_budget(tmp_path):
    """Induced flagship parameter-posterior shift of ``cl_mode: table``.

    Measured as the first-order MAP displacement Sigma @ grad(Δlogp) at
    truth, in units of the per-parameter posterior sigma — the number the
    round-3 verdict asked for.  Measured values at lmax 1100 on the
    Planck-precision synthetic flagship: **1.06 sigma (tau) with 3
    grid nodes/axis, 0.67 sigma (ns) with the production 4 nodes**
    (documented in docs/cosmology.md with the accuracy discussion; the
    exact ``direct`` mode has zero shift by construction)."""
    import jax
    import jax.numpy as jnp

    from cobaya_tpu.models.model import get_model
    from cobaya_tpu.theories.emulator import benchmodel as bm

    kw = dict(pliklite_lmax=1100, camspec_lmax=1000, with_derived=False)
    info_d = bm.flagship_info(str(tmp_path / "d"), cl_mode="direct", **kw)
    info_t = bm.flagship_info(str(tmp_path / "d"), cl_mode="table", **kw)
    info_t["theory"]["emulator"].update({"grid_nodes": 3})
    fn_d = get_model(info_d).make_logposterior_fn()
    fn_t = get_model(info_t).make_logposterior_fn()
    names = bm.sampled_names()
    cov, cov_names = bm.proposal_covmat()
    assert cov_names == names
    x0 = jnp.asarray([bm.TRUTH[p] for p in names])
    g = jax.grad(lambda x: fn_t(x)[0] - fn_d(x)[0])(x0)
    assert np.all(np.isfinite(np.asarray(g)))
    shift = cov @ np.asarray(g, float)
    z = np.abs(shift) / np.sqrt(np.diag(cov))
    # regression bound ~40% above the measured 1.06 sigma for 3 nodes
    assert z.max() < 1.5, dict(zip(names, np.round(z, 3)))


# --------------------------------------------------------------------------
# real-CAMB source (gated on installed CAMB)
# --------------------------------------------------------------------------

def test_camb_sourced_table_accuracy():
    """Build a small table from real CAMB and pin ΔD_l/D_l against direct
    CAMB at a held-out point (the reference's product contract,
    /root/reference/cobaya/theories/camb/camb.py:675-774)."""
    pytest.importorskip("camb")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "make_cl_table",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "make_cl_table.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    lmax = 600
    ranges = {k: v for k, v in DEFAULT_RANGES.items()}
    source = mod.make_camb_source()
    tab = cs.ClEmulator.build(
        {p: tuple(r) for p, r in ranges.items()}, lmax=lmax,
        grid_nodes=3, n_pca=40, source=source, fixed={"mnu": 0.06},
        ell_stride=6,
    )
    point = {k: 0.5 * (lo + hi) + 0.13 * (hi - lo)
             for k, (lo, hi) in ranges.items()}
    point["mnu"] = 0.06
    got = tab.emulate(point, np)
    # camb_row returns the physical EE; emulate() restores the analytic
    # bump it subtracted at build, so the two are directly comparable
    want = mod.camb_row((point, np.arange(lmax + 1, dtype=float), lmax))
    sl = slice(30, int(lmax * 0.85))
    for s in ("tt", "te", "ee"):
        w, g = want[s][sl], got[s][sl]
        err = np.sqrt(np.mean((g - w) ** 2) / np.mean(w ** 2))
        assert err < 0.02, (s, err)
