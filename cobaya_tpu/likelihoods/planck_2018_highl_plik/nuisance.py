"""Nuisance-parameter defaults for the Planck 2018 plik likelihoods.

The published Planck 2018 baseline foreground/calibration model (reference:
cobaya/likelihoods/planck_2018_highl_plik/params_{TT,TE,EE}.yaml,
params_calib_{temp,pol}.yaml, base_classes/planck_calib.yaml,
prior_SZ.yaml): CIB/tSZ/kSZ amplitudes, galactic dust, point sources,
sub-pixel and correlated-noise factors, per-frequency calibrations, and the
joint SZ degeneracy prior.  Values are the Planck-wiki analysis settings.
"""

from __future__ import annotations


def _flat(lo, hi, ref_loc, ref_scale, proposal, latex, rename,
          ref_dist="norm") -> dict:
    return {
        "prior": {"dist": "uniform", "min": lo, "max": hi},
        "ref": {"dist": ref_dist, "loc": ref_loc, "scale": ref_scale},
        "proposal": proposal, "latex": latex, "renames": rename,
    }


def _gauss(loc, scale, ref_loc, ref_scale, proposal, latex, rename) -> dict:
    return {
        "prior": {"dist": "norm", "loc": loc, "scale": scale},
        "ref": {"dist": "norm", "loc": ref_loc, "scale": ref_scale},
        "proposal": proposal, "latex": latex, "renames": rename,
    }


# overall Planck calibration (base_classes/planck_calib.yaml)
params_calib: dict = {
    "A_planck": _gauss(1, 0.0025, 1, 0.002, 0.0005,
                       r"y_\mathrm{cal}", "calPlanck"),
}

# temperature calibration factors (params_calib_temp.yaml)
params_calib_temp: dict = {
    "calib_100T": _gauss(1.0002, 0.0007, 1.0002, 0.001, 0.0005,
                         r"c_{100}", "cal0"),
    "calib_217T": _gauss(0.99805, 0.00065, 0.99805, 0.001, 0.0005,
                         r"c_{217}", "cal2"),
}

# polarization calibrations, fixed to the recommended values
# (params_calib_pol.yaml; quoted uncertainties ±0.01)
params_calib_pol: dict = {
    "A_pol": 1,
    "calib_100P": 1.021,
    "calib_143P": 0.966,
    "calib_217P": 1.040,
}

# TT foregrounds (params_TT.yaml): CIB, tSZ, kSZ, galactic dust,
# sub-pixel effect, point sources
params_TT: dict = {
    "cib_index": -1.3,
    "A_cib_217": _flat(0, 200, 67, 10, 1.2,
                       r"A^\mathrm{CIB}_{217}", "acib217"),
    "xi_sz_cib": _flat(0, 1, 0, 0.1, 0.1,
                       r"\xi^{\mathrm{tSZ}\times\mathrm{CIB}}", "xi",
                       ref_dist="halfnorm"),
    "A_sz": _flat(0, 10, 7, 2, 0.6, r"A^\mathrm{tSZ}_{143}", "asz143"),
    "ksz_norm": _flat(0, 10, 0, 3, 1, r"A^\mathrm{kSZ}", "aksz",
                      ref_dist="halfnorm"),
    "gal545_A_100": _gauss(8.6, 2, 7, 2, 1,
                           r"A^\mathrm{dustTT}_{100}", "kgal100"),
    "gal545_A_143": _gauss(10.6, 2, 9, 2, 1,
                           r"A^\mathrm{dustTT}_{143}", "kgal143"),
    "gal545_A_143_217": _gauss(
        23.5, 8.5, 21, 4, 1.5,
        r"A^\mathrm{dustTT}_{\mathrm{143}\times\mathrm{217}}", "kgal143217"),
    "gal545_A_217": _gauss(91.9, 20, 80, 15, 2,
                           r"A^\mathrm{dustTT}_{217}", "kgal217"),
    "A_sbpx_100_100_TT": 1,
    "A_sbpx_143_143_TT": 1,
    "A_sbpx_143_217_TT": 1,
    "A_sbpx_217_217_TT": 1,
    "ps_A_100_100": _flat(0, 400, 257, 24, 17,
                          r"A^\mathrm{PS}_{100}", "aps100"),
    "ps_A_143_143": _flat(0, 400, 47, 10, 3,
                          r"A^\mathrm{PS}_{143}", "aps143"),
    "ps_A_143_217": _flat(
        0, 400, 40, 12, 2,
        r"A^\mathrm{PS}_{\mathrm{143}\times\mathrm{217}}", "aps143217"),
    "ps_A_217_217": _flat(0, 400, 104, 13, 2.5,
                          r"A^\mathrm{PS}_{217}", "aps217"),
}

# TE galactic dust (params_TE.yaml)
params_TE: dict = {
    "galf_TE_index": -2.4,
    "galf_TE_A_100": _gauss(0.130, 0.042, 0.130, 0.1, 0.1,
                            r"A^\mathrm{dustTE}_{100}", "galfTE100"),
    "galf_TE_A_100_143": _gauss(
        0.130, 0.036, 0.130, 0.1, 0.1,
        r"A^\mathrm{dustTE}_{\mathrm{100}\times\mathrm{143}}",
        "galfTE100143"),
    "galf_TE_A_100_217": _gauss(
        0.46, 0.09, 0.46, 0.10, 0.10,
        r"A^\mathrm{dustTE}_{\mathrm{100}\times\mathrm{217}}",
        "galfTE100217"),
    "galf_TE_A_143": _gauss(0.207, 0.072, 0.207, 0.100, 0.100,
                            r"A^\mathrm{dustTE}_{143}", "galfTE143"),
    "galf_TE_A_143_217": _gauss(
        0.69, 0.09, 0.69, 0.1, 0.1,
        r"A^\mathrm{dustTE}_{\mathrm{143}\times\mathrm{217}}",
        "galfTE143217"),
    "galf_TE_A_217": _gauss(1.938, 0.54, 1.938, 0.2, 0.2,
                            r"A^\mathrm{dustTE}_{217}", "galfTE217"),
}

# EE galactic dust fixed to the central prior values, plus end-to-end
# correlated noise and sub-pixel factors (params_EE.yaml)
params_EE: dict = {
    "galf_EE_index": -2.4,
    "galf_EE_A_100": {"value": 0.055,
                      "latex": r"A^\mathrm{dustEE}_{100}",
                      "renames": "galfEE100"},
    "galf_EE_A_100_143": {
        "value": 0.040,
        "latex": r"A^\mathrm{dustEE}_{\mathrm{100}\times\mathrm{143}}",
        "renames": "galfEE100143"},
    "galf_EE_A_100_217": {
        "value": 0.094,
        "latex": r"A^\mathrm{dustEE}_{\mathrm{100}\times\mathrm{217}}",
        "renames": "galfEE100217"},
    "galf_EE_A_143": {"value": 0.086,
                      "latex": r"A^\mathrm{dustEE}_{143}",
                      "renames": "galfEE143"},
    "galf_EE_A_143_217": {
        "value": 0.21,
        "latex": r"A^\mathrm{dustEE}_{\mathrm{143}\times\mathrm{217}}",
        "renames": "galfEE143217"},
    "galf_EE_A_217": {"value": 0.70,
                      "latex": r"A^\mathrm{dustEE}_{217}",
                      "renames": "galfEE217"},
    "A_cnoise_e2e_100_100_EE": 1,
    "A_cnoise_e2e_143_143_EE": 1,
    "A_cnoise_e2e_217_217_EE": 1,
    "A_sbpx_100_100_EE": 1,
    "A_sbpx_100_143_EE": 1,
    "A_sbpx_100_217_EE": 1,
    "A_sbpx_143_143_EE": 1,
    "A_sbpx_143_217_EE": 1,
    "A_sbpx_217_217_EE": 1,
}

# joint tSZ-kSZ degeneracy prior (prior_SZ.yaml); traces on device via
# the dists.traced_stats facade
prior_SZ: dict = {
    "SZ": "lambda ksz_norm, A_sz: "
          "stats.norm.logpdf(ksz_norm+1.6*A_sz, loc=9.5, scale=3.0)",
}
