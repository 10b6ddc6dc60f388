"""Synthetic cosmology datasets generated from the surrogate theory.

Produces Planck-like bandpower datasets (plik-lite format), BAO and SN
tables with realistic noise levels, all computed from the emulator's own
fiducial spectra — so a sampling run on the synthetic data is a *closed*
inference problem: the true parameters are known, the likelihood math is
the same device code used with real released data, and posterior-recovery
accuracy is checkable.  Powers the cosmology benchmark (bench.py), the
examples, and the emulator integration tests.

The plik-lite file layout matches what
:class:`~cobaya_tpu.likelihoods.base_classes.PlanckPlikLite` reads (the
format of the released plik_lite_2018 package, reference
/root/reference/cobaya/likelihoods/base_classes/planck_pliklite.py:57-127).
Weights are chosen so each bandpower is the plain mean of D_l over the bin
(in FIRAS muK^2), keeping the synthetic data interpretable.
"""

from __future__ import annotations

import os

import numpy as np

from ...utils.conventions import Const
from . import background as bg
from . import cmbspec as cs

FIDUCIAL = {"ombh2": 0.02237, "omch2": 0.1200, "H0": 67.36, "tau": 0.0544,
            "logA": 3.044, "ns": 0.9649, "mnu": 0.06}

# Planck-ish effective noise: T/P rms in muK-arcmin, beam FWHM in arcmin
NOISE_T_ARCMIN = 33.0
NOISE_P_ARCMIN = 70.0
BEAM_FWHM_ARCMIN = 7.0
FSKY = 0.57


def _noise_nl(ells: np.ndarray, muk_arcmin: float) -> np.ndarray:
    """Knox noise D_l (muK^2): white noise deconvolved by the beam."""
    arcmin = np.pi / 180.0 / 60.0
    theta = BEAM_FWHM_ARCMIN * arcmin
    nl = (muk_arcmin * arcmin) ** 2 * np.exp(
        ells * (ells + 1) * theta ** 2 / (8.0 * np.log(2.0)))
    return ells * (ells + 1) / (2 * np.pi) * nl


def _bin_edges(lmin: int, lmax: int) -> np.ndarray:
    """plik-lite-style bins: Delta-l 5 to 1000, 9 to 2000, 17 beyond."""
    edges = [lmin]
    while edges[-1] <= lmax:
        l = edges[-1]
        width = 5 if l < 1000 else (9 if l < 2000 else 17)
        edges.append(l + width)
    edges[-1] = lmax + 1
    return np.asarray(edges)


def make_pliklite_dataset(path: str, fiducial: dict | None = None,
                          lmin: int = 30, lmax: int = 2508,
                          seed: int = 0, use_cl=("tt", "te", "ee")) -> str:
    """Write a synthetic plik-lite dataset under ``path``; returns the ini.

    Bandpowers are the fiducial surrogate D_l binned (mean per bin) plus a
    correlated draw from the Knox bandpower covariance; the covariance is
    diagonal per bin but carries the full TTxTE/TTxEE/TExEE same-bin
    correlations of the Knox formula.
    """
    os.makedirs(path, exist_ok=True)
    fid = dict(FIDUCIAL, **(fiducial or {}))
    rng = np.random.default_rng(seed)
    ells_full = np.arange(lmax + 1)
    dls = cs.acoustic_cls(fid, ells_full, np)

    edges = _bin_edges(lmin, lmax)
    nb = len(edges) - 1
    blmin = edges[:-1]
    blmax = edges[1:] - 1
    ls = np.arange(lmax + 1 - lmin) + lmin  # weights file rows
    # weights such that the binning matrix rows average D_l over the bin:
    # the reader applies w_l * 2 pi / (l (l+1)) to D_l vectors
    widths = np.concatenate([np.full(b1 - b0 + 1, b1 - b0 + 1.0)
                             for b0, b1 in zip(blmin, blmax)])
    weights = ls * (ls + 1.0) / (2 * np.pi) / widths

    nlt = _noise_nl(ells_full.astype(float), NOISE_T_ARCMIN)
    nlp = _noise_nl(ells_full.astype(float), NOISE_P_ARCMIN)
    spec_pairs = {"tt": ("tt", "tt"), "te": ("tt", "ee"), "ee": ("ee", "ee")}

    def binned(v):
        return np.array([v[b0:b1 + 1].mean() for b0, b1 in
                         zip(blmin, blmax)])

    # per-l Knox covariances between the three spectra
    tot_tt = dls["tt"] + nlt
    tot_ee = dls["ee"] + nlp
    tot_te = dls["te"]
    nu = (2.0 * ells_full + 1.0) * FSKY
    var_l = {
        ("tt", "tt"): 2.0 * tot_tt ** 2 / nu,
        ("ee", "ee"): 2.0 * tot_ee ** 2 / nu,
        ("te", "te"): (tot_te ** 2 + tot_tt * tot_ee) / nu,
        ("tt", "te"): 2.0 * tot_tt * tot_te / nu,
        ("tt", "ee"): 2.0 * tot_te ** 2 / nu,
        ("te", "ee"): 2.0 * tot_ee * tot_te / nu,
    }

    def binned_cov(pair):
        v = var_l[pair]
        return np.array([v[b0:b1 + 1].sum() / (b1 - b0 + 1.0) ** 2
                         for b0, b1 in zip(blmin, blmax)])

    names = ["tt", "te", "ee"]
    nb_tot = 3 * nb
    cov = np.zeros((nb_tot, nb_tot))
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            pair = (a, b) if (a, b) in var_l else (b, a)
            d = binned_cov(pair)
            cov[i * nb + np.arange(nb), j * nb + np.arange(nb)] = d
    mean = np.concatenate([binned(dls[s]) for s in names])
    draw = mean + np.linalg.cholesky(
        cov + np.eye(nb_tot) * 1e-12 * cov.diagonal().max()
    ) @ rng.standard_normal(nb_tot)

    data = np.column_stack([np.arange(nb_tot), draw])
    np.savetxt(os.path.join(path, "data.dat"), data)
    np.savetxt(os.path.join(path, "blmin.dat"), blmin - lmin, fmt="%d")
    np.savetxt(os.path.join(path, "blmax.dat"), blmax - lmin, fmt="%d")
    np.savetxt(os.path.join(path, "weights.dat"), weights)
    np.savetxt(os.path.join(path, "cov.dat"), cov)
    ini = os.path.join(path, "pliklite_synthetic.dataset")
    with open(ini, "w") as f:
        f.write(
            f"use_cl = {' '.join(use_cl)}\n"
            f"nbintt = {nb}\nnbinte = {nb}\nnbinee = {nb}\n"
            f"lmax = {lmax}\nbin_lmin_offset = {lmin}\n"
            "data = data.dat\nblmin = blmin.dat\nblmax = blmax.dat\n"
            "weights = weights.dat\ncov_file = cov.dat\n"
        )
    return ini


CAMSPEC_FG_FIDUCIAL = {
    "aps100": 200.0, "aps143": 60.0, "aps217": 60.0, "psr": 0.7,
    "acib217": 50.0, "cibr": 0.9, "ncib": 0.0, "cibrun": 0.0,
    "asz143": 5.0, "xi": 0.1, "aksz": 1.0,
    "dust100": 1.0, "dust143": 1.0, "dust217": 1.0, "dust143x217": 1.0,
}
# per-frequency effective noise (muK-arcmin) and beams (arcmin)
_CAMSPEC_NOISE = {"100": (70.0, 9.7), "143": (33.0, 7.3),
                  "217": (47.0, 5.0)}


def make_camspec_dataset(path: str, fiducial: dict | None = None,
                         fg_fiducial: dict | None = None, lmin: int = 30,
                         lmax: int = 600, seed: int = 4) -> str:
    """Write a synthetic CamSpec-format dataset; returns the ini path.

    Layout matches what :class:`~...base_classes.camspec.CamSpec` reads
    (reference planck_2018_CamSpec_python.py formats): per-ell Cl-hat
    columns for the four TT cross-spectra + TE/EE, data_ranges, foreground
    templates reaching the l=3000 pivot, and a float64 Knox-diagonal
    covariance.  Data = fiducial surrogate D_l + fiducial foregrounds +
    a noise draw, so chi2(true params) ~ n_data.
    """
    os.makedirs(path, exist_ok=True)
    fid = dict(FIDUCIAL, **(fiducial or {}))
    fg_fid = dict(CAMSPEC_FG_FIDUCIAL, **(fg_fiducial or {}))
    rng = np.random.default_rng(seed)
    ells = np.arange(lmax + 1)
    dls = cs.acoustic_cls(fid, ells, np)

    # foreground templates (l(l+1)Cl/2pi, start at l=2, reach pivot 3000)
    ls_t = np.arange(2, 3501)

    def wtemp(fname, values):
        np.savetxt(os.path.join(path, fname),
                   np.column_stack([ls_t, values]))

    wtemp("sz143.dat", 6.0 * (ls_t / 3000.0) ** 0.9)
    wtemp("ksz.dat", 3.0 * np.ones_like(ls_t, float))
    wtemp("tszxcib.dat", 2.0 * (ls_t / 3000.0) ** 0.6)
    wtemp("cib217.dat", 60.0 * (ls_t / 3000.0) ** 0.8)
    for f, amp in (("dust100.dat", 6.0), ("dust143.dat", 8.0),
                   ("dust217.dat", 60.0), ("dust143x217.dat", 22.0)):
        wtemp(f, amp * (ls_t / 200.0) ** -0.4)

    names = ["100x100", "143x143", "217x217", "143x217", "TE", "EE"]
    freqs = [("100", "100"), ("143", "143"), ("217", "217"),
             ("143", "217")]
    with open(os.path.join(path, "ranges.dat"), "w") as f:
        for name in names:
            f.write(f"{name} {lmin} {lmax}\n")

    # instantiate the likelihood machinery once just to evaluate the
    # fiducial foreground model with the exact template conventions
    from ...likelihoods.base_classes.camspec import CamSpec

    spectra = np.zeros((lmax + 1, 6))
    np.savetxt(os.path.join(path, "spectra.dat"), spectra)
    n_per = lmax - lmin + 1
    nX = 6 * n_per
    # Knox noise is uncorrelated across (ell, spectrum): store the
    # covariance as its diagonal (a length-nX vector) — the dense nX x nX
    # binary the released data uses would be ~1.1 GB at full ell range,
    # all zeros off-diagonal (placeholder ones so the class initializes;
    # overwritten with the real variances below)
    np.savetxt(os.path.join(path, "covdiag.dat"), np.ones(nX))
    ini = os.path.join(path, "camspec_synthetic.dataset")
    with open(ini, "w") as f:
        f.write(
            "cl_hat_file = spectra.dat\ndata_ranges = ranges.dat\n"
            "covmat_fiducial_diag = covdiag.dat\n"
            "sz143file = sz143.dat\nkszfile = ksz.dat\n"
            "tszxcibfile = tszxcib.dat\ncib217file = cib217.dat\n"
            "dust100file = dust100.dat\ndust143file = dust143.dat\n"
            "dust217file = dust217.dat\ndust143x217file = dust143x217.dat\n"
        )
    helper = CamSpec({"dataset_file": ini, "use_cl": names},
                     name="camspec_mockgen")
    fg = helper.get_foregrounds(fg_fid)  # (4, lmax+1) D_l

    def nl(freq, pol):
        arcmin = np.pi / 180.0 / 60.0
        rms, beam = _CAMSPEC_NOISE[freq]
        if pol:
            rms *= 2.0
        theta = beam * arcmin
        white = (rms * arcmin) ** 2 * np.exp(
            ells * (ells + 1.0) * theta ** 2 / (8 * np.log(2)))
        return ells * (ells + 1.0) / (2 * np.pi) * white

    nu = (2.0 * ells + 1.0) * FSKY
    model = np.zeros((lmax + 1, 6))
    var = np.zeros((lmax + 1, 6))
    for i, (f1, f2) in enumerate(freqs):
        sig = dls["tt"] + fg[i]
        model[:, i] = sig
        a = dls["tt"] + fg[i] + nl(f1, False)
        b = dls["tt"] + fg[i] + nl(f2, False)
        var[:, i] = (sig ** 2 + a * b) / nu if f1 != f2 \
            else 2.0 * a ** 2 / nu
    model[:, 4] = dls["te"]
    var[:, 4] = (dls["te"] ** 2
                 + (dls["tt"] + nl("143", False))
                 * (dls["ee"] + nl("143", True))) / nu
    model[:, 5] = dls["ee"]
    var[:, 5] = 2.0 * (dls["ee"] + nl("143", True)) ** 2 / nu

    spectra = model + rng.standard_normal(model.shape) * np.sqrt(
        np.maximum(var, 1e-30))
    spectra[:2] = 0.0
    np.savetxt(os.path.join(path, "spectra.dat"), spectra)
    diag = np.concatenate([var[lmin:lmax + 1, i] for i in range(6)])
    np.savetxt(os.path.join(path, "covdiag.dat"), np.maximum(diag, 1e-30))
    return ini


def bao_measurements(fiducial: dict | None = None, seed: int = 1,
                     frac_err: float = 0.012):
    """Synthetic BAO table [(z, value, err, observable), ...] at fiducial."""
    fid = dict(FIDUCIAL, **(fiducial or {}))
    dens = bg.densities(fid, np)
    rng = np.random.default_rng(seed)
    _, _, _, _, _, rd = bg.acoustic_scales(dens, np)
    from . import power as pw

    rows = []
    for z, obs in [(0.15, "DV_over_rs"), (0.38, "DM_over_rs"),
                   (0.38, "Hz_rs"), (0.51, "DM_over_rs"), (0.51, "Hz_rs"),
                   (0.61, "DM_over_rs"), (0.61, "Hz_rs"),
                   (1.48, "DH_over_rs"), (2.33, "DH_over_rs"),
                   (0.38, "f_sigma8"), (0.51, "f_sigma8")]:
        H = float(bg.hubble(dens, [z], np)[0])
        dm = float(bg.comoving_radial_distance(dens, [z], np)[0])
        dh = Const.c_km_s / H
        dv = (dm ** 2 * z * dh) ** (1.0 / 3.0)
        if obs == "f_sigma8":
            D, f = bg.growth_at_z(dens, [z], np)
            val = float(f[0] * D[0] * pw.sigma8_0(dens, fid, np))
            err = 0.03
        else:
            val = {"DV_over_rs": dv / rd, "DM_over_rs": dm / rd,
                   "DH_over_rs": dh / rd, "Hz_rs": H * rd}[obs]
            err = abs(val) * frac_err
        rows.append((z, float(val + rng.normal(0, err)), float(err), obs))
    return rows


def sn_data(fiducial: dict | None = None, n: int = 40, seed: int = 2,
            sigma_mu: float = 0.12, M_true: float = -19.3):
    """Synthetic SN (z, m_b, err) rows: m = 5 log10(d_L/Mpc) + 25 + M."""
    fid = dict(FIDUCIAL, **(fiducial or {}))
    dens = bg.densities(fid, np)
    rng = np.random.default_rng(seed)
    zs = np.sort(rng.uniform(0.02, 1.1, n))
    dc = np.asarray(bg.comoving_radial_distance(dens, zs, np))
    dl = dc * (1 + zs)
    mu = 5 * np.log10(dl) + 25.0
    mb = mu + M_true + rng.normal(0, sigma_mu, n)
    return np.column_stack([zs, mb, np.full(n, sigma_mu)])
