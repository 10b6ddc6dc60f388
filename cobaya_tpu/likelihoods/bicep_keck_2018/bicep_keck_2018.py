"""BICEP/Keck BB likelihood with the published foreground model.

Capability parity with
/root/reference/cobaya/likelihoods/bicep_keck_2018/__init__.py (BK18,
arXiv:2110.00483): multi-frequency BB bandpower matrices with the matrix
Hamimeche-Lewis likelihood (base class) and the dust + synchrotron
foreground model — power laws in ell (pivot 80) with modified-blackbody /
power-law frequency scalings (pivots 353 / 23 GHz) integrated over each
map's measured bandpass, band-center error corrections (gamma_corr +
gamma_95/150/220), dust-sync correlation, and frequency/ell-dependent
foreground decorrelation (delta_dust / delta_sync with flat/lin/quad ell
scaling, Vansyngel-style exponential remap).

Maps without a bandpass file use the analytic delta-bandpass scalings at
their effective band centers (``map_freqs_ghz``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ...utils.conventions import Const
from ..base_classes.cmblikes_matrix import CMBlikesMatrix

_GHZ = 1e9
_T_CMB = Const.T_CMB
_H_OVER_K = Const.h_J_s / Const.kB_J_K  # K per Hz
_GHZ_KELVIN = _H_OVER_K * _GHZ  # K per GHz

_DUST_PIVOT_GHZ = 353.0
_SYNC_PIVOT_GHZ = 23.0
_ELL_PIVOT = 80.0


def _dcdt(nu_ghz) -> float:
    """dB_nu/dT at T_CMB up to frequency-independent factors (thermo units)."""
    x = _GHZ_KELVIN * np.asarray(nu_ghz) / _T_CMB
    return x**4 * np.exp(x) / np.expm1(x) ** 2


def greybody_scaling(nu_ghz: float, beta: float, Tdust: float,
                     nu0_ghz: float = _DUST_PIVOT_GHZ) -> float:
    """Modified-blackbody dust scaling in CMB thermodynamic units
    (delta-bandpass limit)."""
    x = _GHZ_KELVIN * nu_ghz / Tdust
    x0 = _GHZ_KELVIN * nu0_ghz / Tdust
    planck_ratio = (nu_ghz / nu0_ghz) ** 3 * np.expm1(x0) / np.expm1(x)
    return (nu_ghz / nu0_ghz) ** beta * planck_ratio * (
        _dcdt(nu0_ghz) / _dcdt(nu_ghz)
    )


def sync_scaling(nu_ghz: float, beta: float,
                 nu0_ghz: float = _SYNC_PIVOT_GHZ) -> float:
    """Synchrotron power-law scaling in CMB thermodynamic units
    (delta-bandpass limit)."""
    return (nu_ghz / nu0_ghz) ** (2 + beta) * (
        _dcdt(nu0_ghz) / _dcdt(nu_ghz)
    )


class Bandpass(NamedTuple):
    """Measured frequency response with precomputed integrals."""

    nu: np.ndarray  # GHz
    weight: np.ndarray
    dnu: np.ndarray
    th_dust: float  # thermo-conversion integral over the dust pivot's
    th_sync: float  # ... and over the sync pivot's
    nu_bar: float  # band center of mass (GHz)


def load_bandpass(path: str, fpivot_dust: float = _DUST_PIVOT_GHZ,
                  fpivot_sync: float = _SYNC_PIVOT_GHZ) -> Bandpass:
    """Read a two-column (nu_GHz, response) bandpass file and precompute
    the thermodynamic-temperature conversion integrals."""
    table = np.loadtxt(path, ndmin=2)
    nu, weight = table[:, 0], table[:, 1]
    dnu = np.hstack([nu[1] - nu[0], (nu[2:] - nu[:-2]) / 2, nu[-1] - nu[-2]])
    th_int = np.sum(dnu * weight * _dcdt(nu))
    return Bandpass(
        nu=nu, weight=weight, dnu=dnu,
        th_dust=float(th_int / _dcdt(fpivot_dust)),
        th_sync=float(th_int / _dcdt(fpivot_sync)),
        nu_bar=float(np.sum(dnu * weight * nu) / np.sum(dnu * weight)),
    )


def dust_scaling_bandpass(beta: float, Tdust: float, bp: Bandpass,
                          nu0: float = _DUST_PIVOT_GHZ,
                          bandcenter_err: float = 1.0) -> float:
    """Greybody dust scaling integrated over the bandpass, with the
    band-center-error correction."""
    gb_int = np.sum(
        bp.dnu * bp.weight * bp.nu ** (3 + beta)
        / np.expm1(_GHZ_KELVIN * bp.nu / Tdust)
    )
    gb0 = nu0 ** (3 + beta) / np.expm1(_GHZ_KELVIN * nu0 / Tdust)
    th_err = gb_err = 1.0
    if bandcenter_err != 1:
        nu_bar = _GHZ_KELVIN * bp.nu_bar
        th_err = bandcenter_err**4 * (
            np.exp(nu_bar * (bandcenter_err - 1) / _T_CMB)
            * np.expm1(nu_bar / _T_CMB) ** 2
            / np.expm1(nu_bar * bandcenter_err / _T_CMB) ** 2
        )
        gb_err = bandcenter_err ** (3 + beta) * (
            np.expm1(nu_bar / Tdust)
            / np.expm1(nu_bar * bandcenter_err / Tdust)
        )
    return float((gb_int / gb0) / bp.th_dust * (gb_err / th_err))


def sync_scaling_bandpass(beta: float, bp: Bandpass,
                          nu0: float = _SYNC_PIVOT_GHZ,
                          bandcenter_err: float = 1.0) -> float:
    """Power-law synchrotron scaling integrated over the bandpass."""
    pl_int = np.sum(bp.dnu * bp.weight * bp.nu ** (2 + beta))
    pl0 = nu0 ** (2 + beta)
    th_err = pl_err = 1.0
    if bandcenter_err != 1:
        nu_bar = _GHZ_KELVIN * bp.nu_bar
        th_err = bandcenter_err**4 * (
            np.exp(nu_bar * (bandcenter_err - 1) / _T_CMB)
            * np.expm1(nu_bar / _T_CMB) ** 2
            / np.expm1(nu_bar * bandcenter_err / _T_CMB) ** 2
        )
        pl_err = bandcenter_err ** (2 + beta)
    return float((pl_int / pl0) / bp.th_sync * (pl_err / th_err))


def decorrelation(delta: float, nu0: float, nu1: float, nupivot, rat,
                  lform: str = "flat"):
    """Cross-frequency foreground decorrelation factor, remapped onto
    [0, 1] with an exponential (Vansyngel et al. 2017)."""
    scl_nu = np.log(nu0 / nu1) ** 2 / np.log(nupivot[0] / nupivot[1]) ** 2
    scl_ell = {"lin": rat, "quad": rat**2}.get(lform, 1.0)
    if delta > 1:  # non-physical branch, kept for validation tests
        return 2.0 - np.exp(np.log(2.0 - delta) * scl_nu * scl_ell)
    return np.exp(np.log(delta) * scl_nu * scl_ell)


def _dcdt_jax(nu_ghz):
    import jax.numpy as jnp

    x = _GHZ_KELVIN * jnp.asarray(nu_ghz) / _T_CMB
    return x ** 4 * jnp.exp(x) / jnp.expm1(x) ** 2


def _bandcenter_corrections_jax(nu_bar_ghz, bandcenter_err, Tdust, beta_d,
                                beta_s):
    """Traced (th_err, gb_err, pl_err): exact identities at err == 1, so no
    branch is needed (cf. the host path's ``if bandcenter_err != 1``)."""
    import jax.numpy as jnp

    nu_bar = _GHZ_KELVIN * nu_bar_ghz
    th_err = bandcenter_err ** 4 * (
        jnp.exp(nu_bar * (bandcenter_err - 1) / _T_CMB)
        * jnp.expm1(nu_bar / _T_CMB) ** 2
        / jnp.expm1(nu_bar * bandcenter_err / _T_CMB) ** 2
    )
    gb_err = bandcenter_err ** (3 + beta_d) * (
        jnp.expm1(nu_bar / Tdust)
        / jnp.expm1(nu_bar * bandcenter_err / Tdust)
    )
    pl_err = bandcenter_err ** (2 + beta_s)
    return th_err, gb_err, pl_err


def _decorrelation_jax(delta, nu0, nu1, nupivot, rat, lform):
    import jax.numpy as jnp

    scl_nu = jnp.log(nu0 / nu1) ** 2 \
        / np.log(nupivot[0] / nupivot[1]) ** 2
    scl_ell = {"lin": rat, "quad": rat ** 2}.get(lform, 1.0)
    delta = jnp.asarray(delta)
    hi = 2.0 - jnp.exp(
        jnp.log(jnp.maximum(2.0 - delta, 1e-30)) * scl_nu * scl_ell
    )
    lo = jnp.exp(jnp.log(jnp.maximum(delta, 1e-30)) * scl_nu * scl_ell)
    return jnp.where(delta > 1, hi, lo)


class bicep_keck_2018(CMBlikesMatrix):
    type = "CMB"

    install_options = {
        "download_url":
            "http://bicepkeck.org/BK18_datarelease/BK18_cosmomc.tgz",
        "directory": "bicep_keck_2018",
    }

    field = "bb"
    map_freqs_ghz: Optional[list] = None  # effective band centers per map
    bandpass_files: Optional[dict] = None  # map name -> bandpass file
    lform_dust_decorr: str = "flat"
    lform_sync_decorr: str = "flat"

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
        "delta_dust": 1.0,
        "delta_sync": 1.0,
        "gamma_corr": 0.0,
        "gamma_95": 0.0,
        "gamma_150": 0.0,
        "gamma_220": 0.0,
    }

    def init_params(self, ini):
        super().init_params(ini)
        self.fpivot_dust = ini.float("fpivot_dust", _DUST_PIVOT_GHZ)
        self.fpivot_sync = ini.float("fpivot_sync", _SYNC_PIVOT_GHZ)
        self.fpivot_dust_decorr = (
            ini.array_float("fpivot_dust_decorr", "217 353")
            if ini.string("fpivot_dust_decorr", "") else
            np.array([217.0, 353.0])
        )
        self.fpivot_sync_decorr = (
            ini.array_float("fpivot_sync_decorr", "22 33")
            if ini.string("fpivot_sync_decorr", "") else
            np.array([22.0, 33.0])
        )
        self.lform_dust_decorr = ini.string(
            "lform_dust_decorr", self.lform_dust_decorr)
        self.lform_sync_decorr = ini.string(
            "lform_sync_decorr", self.lform_sync_decorr)
        # per-map bandpass: a measured response file when available,
        # else a delta function at the effective band center
        self.bandpasses: list[Optional[Bandpass]] = []
        freqs = list(self.map_freqs_ghz or []) or None
        if freqs is None and ini.string("map_freqs_ghz", ""):
            freqs = list(ini.array_float("map_freqs_ghz"))
        self.map_freqs = np.zeros(self.nmaps)
        for i, name in enumerate(self.map_names):
            path = (self.bandpass_files or {}).get(name) \
                or ini.relativeFileName(f"bandpass[{name}]", "")
            if path:
                bp = load_bandpass(path, self.fpivot_dust, self.fpivot_sync)
                self.bandpasses.append(bp)
                self.map_freqs[i] = bp.nu_bar
            elif freqs is not None:
                self.bandpasses.append(None)
                self.map_freqs[i] = freqs[i]
            else:
                from ...utils.log import LoggedError

                raise LoggedError(
                    self.log, "Map '%s' needs a bandpass file or an entry "
                    "in map_freqs_ghz.", name,
                )

    def _bandcenter_errors(self, p) -> np.ndarray:
        gamma_corr = p.get("gamma_corr", 0.0)
        err = np.ones(self.nmaps)
        for i, name in enumerate(self.map_names):
            for band in ("95", "150", "220"):
                if band in name:
                    err[i] = gamma_corr + p.get(f"gamma_{band}", 0.0) + 1
                    break
        return err

    def _frequency_scalings(self, p):
        Tdust = p.get("BBTdust", 19.6)
        bc_err = self._bandcenter_errors(p)
        f_dust = np.empty(self.nmaps)
        f_sync = np.empty(self.nmaps)
        for i, bp in enumerate(self.bandpasses):
            if bp is not None:
                f_dust[i] = dust_scaling_bandpass(
                    p["BBbetadust"], Tdust, bp, self.fpivot_dust, bc_err[i]
                )
                f_sync[i] = sync_scaling_bandpass(
                    p["BBbetasync"], bp, self.fpivot_sync, bc_err[i]
                )
            else:
                nu = self.map_freqs[i] * bc_err[i]
                f_dust[i] = greybody_scaling(nu, p["BBbetadust"], Tdust,
                                             self.fpivot_dust)
                f_sync[i] = sync_scaling(nu, p["BBbetasync"],
                                         self.fpivot_sync)
        return f_dust, f_sync, bc_err

    def _frequency_scalings_jax(self, p):
        """Traced per-map dust/sync frequency scalings.

        Matches :meth:`_frequency_scalings`; the bandcenter-error correction
        is applied unconditionally (exact no-op at err == 1)."""
        import jax.numpy as jnp

        Tdust = jnp.asarray(p.get("BBTdust", 19.6))
        beta_d = jnp.asarray(p["BBbetadust"])
        beta_s = jnp.asarray(p["BBbetasync"])
        gamma_corr = jnp.asarray(p.get("gamma_corr", 0.0))
        f_dust, f_sync, bc_errs = [], [], []
        for i, (name, bp) in enumerate(zip(self.map_names,
                                           self.bandpasses)):
            err = jnp.asarray(1.0)
            for band in ("95", "150", "220"):
                if band in name:
                    err = gamma_corr + jnp.asarray(
                        p.get(f"gamma_{band}", 0.0)
                    ) + 1
                    break
            bc_errs.append(err)
            if bp is not None:
                nu = jnp.asarray(bp.nu)
                w = jnp.asarray(bp.dnu * bp.weight)
                th_err, gb_err, pl_err = _bandcenter_corrections_jax(
                    bp.nu_bar, err, Tdust, beta_d, beta_s
                )
                gb_int = jnp.sum(
                    w * nu ** (3 + beta_d)
                    / jnp.expm1(_GHZ_KELVIN * nu / Tdust)
                )
                gb0 = self.fpivot_dust ** (3 + beta_d) / jnp.expm1(
                    _GHZ_KELVIN * self.fpivot_dust / Tdust
                )
                f_dust.append(
                    (gb_int / gb0) / bp.th_dust * (gb_err / th_err)
                )
                pl_int = jnp.sum(w * nu ** (2 + beta_s))
                pl0 = self.fpivot_sync ** (2 + beta_s)
                f_sync.append(
                    (pl_int / pl0) / bp.th_sync * (pl_err / th_err)
                )
            else:
                nu = self.map_freqs[i] * err
                x = _GHZ_KELVIN * nu / Tdust
                x0 = _GHZ_KELVIN * self.fpivot_dust / Tdust
                planck_ratio = (nu / self.fpivot_dust) ** 3 \
                    * jnp.expm1(x0) / jnp.expm1(x)
                f_dust.append(
                    (nu / self.fpivot_dust) ** beta_d * planck_ratio
                    * (_dcdt_jax(self.fpivot_dust) / _dcdt_jax(nu))
                )
                f_sync.append(
                    (nu / self.fpivot_sync) ** (2 + beta_s)
                    * (_dcdt_jax(self.fpivot_sync) / _dcdt_jax(nu))
                )
        return f_dust, f_sync, bc_errs

    def theory_cl_matrices_jax(self, cls_dict, params):
        import jax.numpy as jnp

        base = super().theory_cl_matrices_jax(cls_dict, params)
        p = params
        ells = np.arange(base.shape[0], dtype=float)
        rat = np.where(ells > 0, ells / _ELL_PIVOT, 0.0)
        # grad-safe power: exponentiate a strictly-positive base, mask l=0
        rat_safe = np.where(ells > 0, rat, 1.0)
        ell_dust = jnp.where(
            ells > 0,
            jnp.asarray(rat_safe) ** jnp.asarray(p["BBalphadust"]), 0.0,
        )
        ell_sync = jnp.where(
            ells > 0,
            jnp.asarray(rat_safe) ** jnp.asarray(p["BBalphasync"]), 0.0,
        )
        f_dust, f_sync, bc_err = self._frequency_scalings_jax(p)
        dustpow = jnp.asarray(p["BBdust"]) * ell_dust
        syncpow = jnp.asarray(p["BBsync"]) * ell_sync
        dustsyncpow = (
            jnp.asarray(p.get("BBdustsynccorr", 0.0))
            * jnp.sqrt(jnp.asarray(p["BBdust"]) * jnp.asarray(p["BBsync"]))
            * jnp.sqrt(ell_dust * ell_sync)
        )
        delta_dust = jnp.asarray(p.get("delta_dust", 1.0))
        delta_sync = jnp.asarray(p.get("delta_sync", 1.0))
        rows = [[None] * self.nmaps for _ in range(self.nmaps)]
        for i in range(self.nmaps):
            for j in range(i + 1):
                corr_dust = corr_sync = 1.0
                if i != j:
                    # decorrelation factors are exactly 1 at delta == 1,
                    # so no need for the host path's threshold branch
                    corr_dust = _decorrelation_jax(
                        delta_dust,
                        self.map_freqs[i] * bc_err[i],
                        self.map_freqs[j] * bc_err[j],
                        self.fpivot_dust_decorr, jnp.asarray(rat),
                        self.lform_dust_decorr,
                    )
                    corr_sync = _decorrelation_jax(
                        delta_sync,
                        self.map_freqs[i] * bc_err[i],
                        self.map_freqs[j] * bc_err[j],
                        self.fpivot_sync_decorr, jnp.asarray(rat),
                        self.lform_sync_decorr,
                    )
                cl = (
                    f_dust[i] * f_dust[j] * dustpow * corr_dust
                    + f_sync[i] * f_sync[j] * syncpow * corr_sync
                    + (f_dust[i] * f_sync[j] + f_sync[i] * f_dust[j])
                    * dustsyncpow
                )
                rows[i][j] = cl
                if i != j:
                    rows[j][i] = cl
        fg = jnp.stack([
            jnp.stack([rows[i][j] for j in range(self.nmaps)], axis=-1)
            for i in range(self.nmaps)
        ], axis=-2)  # (lmax+1, nmaps, nmaps)
        return base + fg

    def theory_cl_matrices(self, cls_dict, params) -> np.ndarray:
        base = super().theory_cl_matrices(cls_dict, params)  # CMB part
        p = params
        ells = np.arange(base.shape[0], dtype=float)
        with np.errstate(divide="ignore"):
            rat = np.where(ells > 0, ells / _ELL_PIVOT, 0.0)
            ell_dust = np.where(ells > 0, rat ** p["BBalphadust"], 0.0)
            ell_sync = np.where(ells > 0, rat ** p["BBalphasync"], 0.0)
        f_dust, f_sync, bc_err = self._frequency_scalings(p)
        dustpow = p["BBdust"] * ell_dust
        syncpow = p["BBsync"] * ell_sync
        dustsyncpow = (
            p.get("BBdustsynccorr", 0.0)
            * np.sqrt(p["BBdust"] * p["BBsync"])
            * np.sqrt(ell_dust * ell_sync)
        )
        delta_dust = p.get("delta_dust", 1.0)
        delta_sync = p.get("delta_sync", 1.0)
        need_dust_decorr = abs(delta_dust - 1) > 1e-5
        need_sync_decorr = abs(delta_sync - 1) > 1e-5
        fg = np.zeros_like(base)
        for i in range(self.nmaps):
            for j in range(i + 1):
                corr_dust = corr_sync = 1.0
                if i != j and need_dust_decorr:
                    corr_dust = decorrelation(
                        delta_dust,
                        self.map_freqs[i] * bc_err[i],
                        self.map_freqs[j] * bc_err[j],
                        self.fpivot_dust_decorr, rat,
                        self.lform_dust_decorr,
                    )
                if i != j and need_sync_decorr:
                    corr_sync = decorrelation(
                        delta_sync,
                        self.map_freqs[i] * bc_err[i],
                        self.map_freqs[j] * bc_err[j],
                        self.fpivot_sync_decorr, rat,
                        self.lform_sync_decorr,
                    )
                cl = (
                    f_dust[i] * f_dust[j] * dustpow * corr_dust
                    + f_sync[i] * f_sync[j] * syncpow * corr_sync
                    + (f_dust[i] * f_sync[j] + f_sync[i] * f_dust[j])
                    * dustsyncpow
                )
                fg[:, i, j] += cl
                if i != j:
                    fg[:, j, i] += cl
        return base + fg
