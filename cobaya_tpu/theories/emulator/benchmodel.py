"""The flagship cosmology benchmark model: Planck-like, fully on device.

One canonical 24-sampled-parameter inference setup shared by ``bench.py``, the
CPU reference-baseline script, the driver entry point and the tests:

- theory: :class:`EmulatorCosmology` (phase-aligned Cl table; exact
  background; EH98+halofit P(k)) — jittable, zero host involvement;
- likelihoods: synthetic plik-lite TTTEEE at full Planck ell range
  (calibration nuisance), synthetic CamSpec with the full 15-parameter
  foreground model + 4 calibrations, BAO (distances, H, f sigma8) and SN
  (M-marginalized) — every one evaluated by its ``logp_jax`` device path;
- sampled parameters: 6 LCDM + A_planck + 13 foregrounds + 4 calibrations
  (the CIB spectral shape is a fixed input, as in real analyses).

The datasets are generated deterministically from the surrogate's own
fiducial (:mod:`.mockdata`), so truth is known and posterior recovery is
assertable.  Mirrors the reference's Planck-baseline workload
(/root/reference/cobaya/cosmo_input/input_database.py presets) at the
structural level: same parameter count, same likelihood families, same
speed hierarchy (slow theory block + fast nuisance block).
"""

from __future__ import annotations

import os

import numpy as np

from . import mockdata as md

COSMO_PARAMS = {
    "ombh2": {"prior": {"min": 0.019, "max": 0.026}, "ref": 0.02237,
              "proposal": 1.5e-4, "latex": r"\Omega_\mathrm{b} h^2"},
    "omch2": {"prior": {"min": 0.09, "max": 0.15}, "ref": 0.12,
              "proposal": 1.5e-3, "latex": r"\Omega_\mathrm{c} h^2"},
    "H0": {"prior": {"min": 55.0, "max": 80.0}, "ref": 67.36,
           "proposal": 0.6, "latex": r"H_0"},
    # Gaussian "lowE-equivalent" tau prior: with no low-ell likelihood in
    # the synthetic dataset, tau is constrained only through A_s e^{-2tau};
    # real analyses without lowE use exactly this prior (reference preset
    # vocabulary: /root/reference/cobaya/cosmo_input/input_database.py)
    "tau": {"prior": {"dist": "norm", "loc": 0.0544, "scale": 0.0073},
            "ref": 0.0544, "proposal": 0.006,
            "latex": r"\tau_\mathrm{reio}"},
    "logA": {"prior": {"min": 2.85, "max": 3.25}, "ref": 3.044,
             "proposal": 0.015, "latex": r"\log(10^{10} A_\mathrm{s})"},
    "ns": {"prior": {"min": 0.9, "max": 1.05}, "ref": 0.9649,
           "proposal": 0.004, "latex": r"n_\mathrm{s}"},
}

_FG = md.CAMSPEC_FG_FIDUCIAL
NUISANCE_PARAMS = {
    "A_planck": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.0025},
                 "ref": 1.0, "proposal": 0.002},
    "aps100": {"prior": {"min": 0.0, "max": 400.0}, "ref": _FG["aps100"],
               "proposal": 10.0},
    "aps143": {"prior": {"min": 0.0, "max": 200.0}, "ref": _FG["aps143"],
               "proposal": 4.0},
    "aps217": {"prior": {"min": 0.0, "max": 200.0}, "ref": _FG["aps217"],
               "proposal": 4.0},
    "psr": {"prior": {"min": 0.0, "max": 1.0}, "ref": _FG["psr"],
            "proposal": 0.05},
    "acib217": {"prior": {"min": 0.0, "max": 200.0},
                "ref": _FG["acib217"], "proposal": 4.0},
    "cibr": {"prior": {"min": 0.0, "max": 1.0}, "ref": _FG["cibr"],
             "proposal": 0.03},
    "ncib": {"prior": {"min": -2.0, "max": 2.0}, "ref": _FG["ncib"],
             "proposal": 0.06},
    "cibrun": {"prior": {"min": -1.0, "max": 1.0}, "ref": _FG["cibrun"],
               "proposal": 0.06},
    "asz143": {"prior": {"min": 0.0, "max": 20.0}, "ref": _FG["asz143"],
               "proposal": 0.6},
    "xi": {"prior": {"min": 0.0, "max": 0.5}, "ref": _FG["xi"],
           "proposal": 0.03},
    "aksz": {"prior": {"min": 0.0, "max": 10.0}, "ref": _FG["aksz"],
             "proposal": 0.4},
    # Gaussian dust-amplitude priors, as in the real CamSpec analyses
    # (the galactic template amplitude is calibrated externally)
    "dust100": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.2},
                "ref": 1.0, "proposal": 0.06},
    "dust143": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.2},
                "ref": 1.0, "proposal": 0.06},
    "dust217": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.2},
                "ref": 1.0, "proposal": 0.06},
    "dust143x217": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.2},
                    "ref": 1.0, "proposal": 0.06},
    "cal0": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.001},
             "ref": 1.0, "proposal": 0.0008},
    "cal2": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.001},
             "ref": 1.0, "proposal": 0.0008},
    "calTE": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.01},
              "ref": 1.0, "proposal": 0.005},
    "calEE": {"prior": {"dist": "norm", "loc": 1.0, "scale": 0.01},
              "ref": 1.0, "proposal": 0.005},
}

TRUTH = {**{p: v["ref"] for p, v in COSMO_PARAMS.items()},
         **{p: v["ref"] for p, v in NUISANCE_PARAMS.items()}}

DERIVED = ("sigma8", "omegam", "rdrag", "thetastar")

# CIB spectral shape fixed to the template, as in the real CamSpec/plik
# analyses (only the amplitude acib217 is sampled): a free amplitude x
# index x running manifold is unconstrained by a single-ell-range TT fit
# and real runs never sample it.
FIXED_PARAMS = ("ncib", "cibrun")


def sampled_names() -> list:
    """Sampled-parameter order of the flagship model."""
    return [p for p in list(COSMO_PARAMS) + list(NUISANCE_PARAMS)
            if p not in FIXED_PARAMS]


# Joint Gaussian prior on the SZ combination, mirroring the real Planck
# analyses' "SZ prior" (ksz + 1.6 A_sz = 9.5 +- 3; e.g. the reference's
# CamSpec/plik runs): pure jnp arithmetic, so it traces onto the device
# posterior (models/model.py logp_traced path).
EXTERNAL_PRIORS = {
    "SZ": "lambda asz143, aksz: -0.5 * ((aksz + 1.6 * asz143 - 9.5) / 3.0) ** 2",
}


def make_datasets(root: str, pliklite_lmax: int = 2508,
                  camspec_lmax: int = 2000) -> dict:
    """Generate (or reuse) the synthetic datasets under ``root``.

    Cache directories are keyed by lmax so changing the ell range never
    reuses a stale dataset.
    """
    plik_dir = os.path.join(root, f"plik_l{pliklite_lmax}")
    plik_ini = os.path.join(plik_dir, "pliklite_synthetic.dataset")
    if not os.path.exists(plik_ini):
        plik_ini = md.make_pliklite_dataset(
            plik_dir, lmin=30, lmax=pliklite_lmax)
    # "v2": diagonal-vector covariance format (covmat_fiducial_diag) — a
    # cached pre-v2 directory would resurrect the ~1.1 GB dense binary
    cams_dir = os.path.join(root, f"camspec_l{camspec_lmax}v2")
    cams_ini = os.path.join(cams_dir, "camspec_synthetic.dataset")
    if not os.path.exists(cams_ini):
        cams_ini = md.make_camspec_dataset(
            cams_dir, lmin=30, lmax=camspec_lmax)
    return {"pliklite": plik_ini, "camspec": cams_ini}


def flagship_info(datasets_root: str, pliklite_lmax: int = 2508,
                  camspec_lmax: int = 2000, grid_nodes: int = 4,
                  ell_stride: int = 6, with_derived: bool = True,
                  cl_mode: str = "direct") -> dict:
    """Full model info dict (no sampler block).

    ``cl_mode: direct`` (default) evaluates the analytic acoustic source
    in the trace — pure VPU elementwise math, ~3.7 ms/step at 4096
    walkers on a v5e chip.  ``table`` exercises the PCA grid-emulator
    pathway (production architecture for real-Boltzmann tables): hat-
    product coefficient interpolation + Chebyshev-in-r phase un-warp,
    both dense matmuls — gather-free, so it batches cleanly at large
    walker counts too.
    """
    paths = make_datasets(datasets_root, pliklite_lmax, camspec_lmax)
    params = {**{k: dict(v) for k, v in COSMO_PARAMS.items()},
              **{k: dict(v) for k, v in NUISANCE_PARAMS.items()}}
    # dispersed reference distributions (reference preset practice,
    # input_database.py): walkers must NOT all start at one point, or the
    # between-walker variance starts at zero and R-1 is meaningless until
    # the cloud has diffused; out-of-prior draws are resampled by Prior
    for name, spec in params.items():
        if name in FIXED_PARAMS:
            params[name] = {"value": TRUTH[name]}
            continue
        spec["ref"] = {"dist": "norm", "loc": spec["ref"],
                       "scale": 2.0 * spec["proposal"]}
    if with_derived:
        for d in DERIVED:
            params[d] = {"derived": True}
    return {
        "theory": {"emulator": {
            "lmax": max(pliklite_lmax, camspec_lmax),
            "cl_mode": cl_mode, "grid_nodes": grid_nodes,
            "ell_stride": ell_stride,
        }},
        "likelihood": {
            "pliklite": {
                "class":
                    "cobaya_tpu.likelihoods.base_classes.PlanckPlikLite",
                "dataset_file": paths["pliklite"],
            },
            "camspec": {
                "class": "cobaya_tpu.likelihoods.base_classes.CamSpec",
                "dataset_file": paths["camspec"],
                "use_cl": ["100x100", "143x143", "217x217", "143x217",
                           "TE", "EE"],
            },
            "bao": {
                "class": "cobaya_tpu.likelihoods.base_classes.BAO",
                "measurements": md.bao_measurements(),
            },
            "sn": {
                "class": "cobaya_tpu.likelihoods.base_classes.SN",
                "data": md.sn_data().tolist(),
                "marginalize_M": True,
            },
        },
        "prior": dict(EXTERNAL_PRIORS),
        "params": params,
    }


#: packaged posterior covmat (reference text format: '# names' header +
#: matrix), produced by ``scripts/make_flagship_covmat.py`` — a Laplace
#: approximation at the synthetic truth (refreshable from a converged
#: run's within-walker statistics) — the exact analogue of the covmat
#: files real Planck analyses ship with their chains (reference covmat
#: database, /root/reference/cobaya/cosmo_input/covmats).
COVMAT_FILE = os.path.join(os.path.dirname(__file__), "flagship.covmat")


def proposal_covmat(packaged: bool = True) -> tuple[np.ndarray, list]:
    """Proposal covmat + parameter-name order for the flagship model.

    Prefers the packaged correlated covariance (the foreground block has
    strong degeneracy directions the diagonal can't express); falls back
    to a diagonal built from the per-parameter proposal widths.
    """
    names = sampled_names()
    if packaged and os.path.exists(COVMAT_FILE):
        with open(COVMAT_FILE, encoding="utf-8") as f:
            file_names = f.readline().lstrip("#").split()
        cov = np.atleast_2d(np.loadtxt(COVMAT_FILE))
        if file_names == names and cov.shape == (len(names),) * 2:
            return cov, names
    widths = np.array([
        {**COSMO_PARAMS, **NUISANCE_PARAMS}[p]["proposal"] for p in names
    ])
    return np.diag(widths ** 2), names
