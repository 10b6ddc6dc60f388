"""Nuisance-parameter defaults for the Planck 2018 CamSpec likelihood.

Published CamSpec 2018 foreground/calibration model (reference:
cobaya/likelihoods/planck_2018_highl_CamSpec/params_{TT,TE,EE}_CamSpec.yaml
+ prior_SZ_CamSpec.yaml): point sources, CIB, tSZ/kSZ, galactic dust
rescalings, per-spectrum calibrations, and the joint SZ degeneracy prior.
"""

from __future__ import annotations

from ..planck_2018_highl_plik.nuisance import _flat, _gauss, params_calib

params_TT: dict = {
    "aps100": _flat(0, 360, 153, 27, 27, r"A^{PS}_{100}", None),
    "aps143": _flat(0, 270, 54.9, 4.5, 4.5, r"A^{PS}_{143}", None),
    "aps217": _flat(0, 450, 55.8, 7.2, 7.2, r"A^{PS}_{217}", None),
    "acib217": _flat(0, 80, 55.5, 3, 3, r"A^{CIB}_{217}", None),
    "asz143": _flat(0, 10, 4, 1, 1, r"A^{tSZ}_{143}", None),
    "psr": _flat(0, 1, 0.91, 0.04, 0.04, r"r^{PS}_{143\times217}", None),
    "cibr": _flat(0, 1, 0.5, 0.1, 0.1, r"r^{CIB}_{143\times217}", None),
    "ncib": {"value": 0, "latex": r"\gamma^{CIB}"},
    "cibrun": {"value": 0, "latex": r"d\ln\gamma^{CIB}/d\ln l"},
    "xi": _flat(0, 1, 0.1, 0.2, 0.2, r"\xi^{tSZ-CIB}", None),
    "aksz": _flat(0, 10, 1, 0.7, 0.7, r"A^{kSZ}", None),
    "dust100": _gauss(1, 0.2, 1, 0.1, 0.1, r"A^{\rm dust}_{100}", None),
    "dust143": _gauss(1, 0.2, 1, 0.1, 0.1, r"A^{\rm dust}_{143}", None),
    "dust217": _gauss(1, 0.2, 1, 0.1, 0.1, r"A^{\rm dust}_{217}", None),
    "dust143x217": _gauss(1, 0.2, 1, 0.1, 0.1,
                          r"A^{\rm dust}_{143\times217}", None),
    "cal0": _gauss(1, 0.002, 1, 0.0004, 0.0004, r"c_{100}", None),
    "cal2": _gauss(1, 0.002, 1, 0.001, 0.001, r"c_{217}", None),
    "calTE": _gauss(1, 0.02, 1, 0.005, 0.005, r"c_{TE}", None),
    "calEE": _gauss(1, 0.02, 1, 0.005, 0.005, r"c_{EE}", None),
}

# drop the renames=None placeholders the helpers insert
for _spec in (*params_TT.values(),):
    if isinstance(_spec, dict) and _spec.get("renames", "x") is None:
        _spec.pop("renames")

params_full: dict = {**params_calib, **params_TT}

prior_SZ: dict = {
    "SZ": "lambda aksz, asz143: "
          "stats.norm.logpdf(aksz+1.6*asz143, loc=9.5, scale=3.0)",
}
