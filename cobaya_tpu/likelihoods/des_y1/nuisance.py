"""Nuisance-parameter defaults for the DES Y1 3x2pt likelihoods.

Published DES Y1 analysis settings (reference:
cobaya/likelihoods/des_y1/{clustering,galaxy_galaxy,shear,joint}.yaml):
lens/source photo-z shifts, per-bin galaxy bias, shear calibrations, and
the nonlinear-alignment intrinsic-alignment model.
"""

from __future__ import annotations

from ..planck_2018_highl_plik.nuisance import _gauss


def _dz(idx, loc, scale, ref_loc, kind) -> dict:
    return _gauss(loc, scale, ref_loc, 0.01 if kind == "s" else 0.005,
                  0.01 if kind == "s" else 0.005,
                  r"\Delta z_\mathrm{%s,DES}^%d" % (kind, idx), None)


def _bias(idx, ref_loc) -> dict:
    return {
        "prior": {"min": 0.8, "max": 3},
        "ref": {"dist": "norm", "loc": ref_loc, "scale": 0.05},
        "proposal": 0.05, "latex": r"b_\mathrm{DES}^%d" % idx,
    }


def _shear_m(idx) -> dict:
    return _gauss(0.012, 0.023, 0.012, 0.005, 0.005,
                  r"m_\mathrm{DES}^%d" % idx, None)


def _ia(latex) -> dict:
    return {
        "prior": {"min": -5, "max": 5},
        "ref": {"dist": "norm", "loc": 1, "scale": 0.2},
        "proposal": 0.2, "latex": latex,
    }


# lens photo-z shifts + per-bin bias (clustering side)
params_lens: dict = {
    "DES_DzL1": _dz(1, 0.001, 0.008, 0.002, "l"),
    "DES_DzL2": _dz(2, 0.002, 0.007, 0.001, "l"),
    "DES_DzL3": _dz(3, 0.001, 0.007, 0.003, "l"),
    "DES_DzL4": _dz(4, 0.003, 0.010, 0.0, "l"),
    "DES_DzL5": _dz(5, 0.000, 0.010, 0.0, "l"),
    "DES_b1": _bias(1, 1.45),
    "DES_b2": _bias(2, 1.55),
    "DES_b3": _bias(3, 1.65),
    "DES_b4": _bias(4, 1.80),
    "DES_b5": _bias(5, 2.00),
}

# source photo-z shifts + shear calibration + intrinsic alignment
params_source: dict = {
    "DES_DzS1": _dz(1, -0.001, 0.016, 0.002, "s"),
    "DES_DzS2": _dz(2, -0.019, 0.013, -0.015, "s"),
    "DES_DzS3": _dz(3, 0.009, 0.011, 0.007, "s"),
    "DES_DzS4": _dz(4, -0.018, 0.022, -0.018, "s"),
    "DES_m1": _shear_m(1),
    "DES_m2": _shear_m(2),
    "DES_m3": _shear_m(3),
    "DES_m4": _shear_m(4),
    "DES_AIA": _ia(r"A_\mathrm{IA,DES}"),
    "DES_alphaIA": _ia(r"\alpha_\mathrm{IA,DES}"),
    "DES_z0IA": {"value": 0.62, "latex": r"z_{0\mathrm{IA,DES}}"},
}

for _block in (params_lens, params_source):
    for _spec in _block.values():
        if isinstance(_spec, dict) and _spec.get("renames", "x") is None:
            _spec.pop("renames")

params_joint: dict = {**params_lens, **params_source}
