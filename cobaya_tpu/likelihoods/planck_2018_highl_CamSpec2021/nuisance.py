"""Nuisance-parameter defaults for the CamSpec 2021 / NPIPE likelihoods.

Published CamSpec 12.6 power-law foreground-residual model (reference:
cobaya/likelihoods/planck_2018_highl_CamSpec2021/params_TT_CamSpec.yaml,
params_{TE,EE}_CamSpec.yaml, params_fixedcal{TE,EE}.yaml,
params_TT_CamSpec_fixedcalpol.yaml; the NPIPE package ships identical
files).  Amplitude/tilt residuals per spectrum plus per-spectrum
calibrations; the SZ prior is not active for this model (commented out in
the reference yamls).
"""

from __future__ import annotations

from ..planck_2018_highl_plik.nuisance import _flat, _gauss, params_calib

__all__ = ["params_calib", "params_TT", "params_TT_fixedcalpol",
           "params_TE", "params_EE", "params_fixedcalTE",
           "params_fixedcalEE"]


def _amp(label):
    return _flat(0, 50, {"143": 10, "217": 20, "143x217": 10}[label], 1, 1,
                 r"A^{\rm power}_{%s}" % label.replace("x", r"\times"), None)


def _tilt(label):
    return _flat(0, 5, 1, 0.2, 0.2,
                 r"\gamma^{\rm power}_{%s}" % label.replace("x", r"\times"),
                 None)


params_TT: dict = {
    "use_fg_residual_model": 0,
    "cal0": 1,
    "cal2": 1,
    "amp_100": 0,
    "amp_143": _amp("143"),
    "amp_217": _amp("217"),
    "amp_143x217": _amp("143x217"),
    "n_100": 1,
    "n_143": _tilt("143"),
    "n_217": _tilt("217"),
    "n_143x217": _tilt("143x217"),
}

params_TE: dict = {
    "calTE": _gauss(1, 0.01, 1, 0.01, 0.01, r"c_{TE}", None),
}
params_EE: dict = {
    "calEE": _gauss(1, 0.01, 1, 0.01, 0.01, r"c_{EE}", None),
}
params_TT_fixedcalpol: dict = {"calEE": 1, "calTE": 1}
params_fixedcalTE: dict = {"calTE": 1}
params_fixedcalEE: dict = {"calEE": 1}

for _block in (params_TT, params_TE, params_EE):
    for _spec in _block.values():
        if isinstance(_spec, dict) and _spec.get("renames", "x") is None:
            _spec.pop("renames")
