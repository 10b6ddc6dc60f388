"""Abstract Boltzmann-code interface (cosmology theory contract).

Capability parity with /root/reference/cobaya/theories/cosmo/boltzmannbase.py:
the ``must_provide`` requirement vocabulary (``Cl``, ``unlensed_Cl``,
``Pk_interpolator``, ``Pk_grid``, ``sigma_R``, ``Hubble``, distances,
``sigma8_z``, ``fsigma8``, ``source_Cl``, derived params), z-pool caching of
requested redshift grids, CMB unit factors, and the bicubic (log k, log P)
power-spectrum interpolator.

Concrete backends (CAMB, CLASS) subclass this and run as host-callback
components (``jittable = False``): the vmapped sampler batches all walkers'
parameter sets into one host call per step, which the backend can farm out
across CPU processes — the framework's "slow block".
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Optional

import numpy as np

from ...models.theory import Theory
from ...utils.conventions import Const
from ...utils.log import LoggedError
from ...utils.tools import Pool1D, Pool2D


class BoltzmannBase(Theory):
    """Base class for Boltzmann-solver theory codes."""

    jittable = False  # external native codes bridge through host callbacks
    renames: Optional[dict] = None
    extra_args: Optional[dict] = None

    _at_resume_prefer_new = ["extra_args"]

    def initialize(self):
        self.extra_args = dict(self.extra_args or {})
        self._must_provide: dict[str, Any] = {}
        self.collectors: dict[str, Any] = {}
        self._z_pools: dict[str, Pool1D | Pool2D] = {}

    def get_allow_agnostic(self):
        return True

    def translate_param(self, p: str) -> str:
        return (self.renames or {}).get(p, p)

    # ------------------------------------------------------------------
    # requirement negotiation
    # ------------------------------------------------------------------
    def must_provide(self, **requirements):
        """Register products that other components need.

        Vocabulary (reference boltzmannbase.py:85-268):
        ``Cl={'tt': lmax, ...}``, ``unlensed_Cl``, ``Hubble={'z': [...]}``,
        ``angular_diameter_distance``, ``angular_diameter_distance_2``,
        ``comoving_radial_distance``, ``Omega_b/cdm/nu_massive``,
        ``Pk_interpolator/Pk_grid={'z':..., 'k_max':..., 'vars_pairs':...,
        'nonlinear':...}``, ``sigma_R``, ``sigma8_z``, ``fsigma8``,
        ``source_Cl``; anything else is assumed to be a parameter the code
        can compute as derived.
        """
        super().must_provide(**requirements)
        for req, spec in requirements.items():
            spec = spec or {}
            if req in ("Cl", "unlensed_Cl", "lensed_scal_Cl"):
                current = self._must_provide.get(req, {})
                for cl, lmax in spec.items():
                    current[cl.lower()] = max(current.get(cl.lower(), 0),
                                              int(lmax))
                self._must_provide[req] = current
            elif req in ("Hubble", "Omega_b", "Omega_cdm", "Omega_nu_massive",
                         "angular_diameter_distance",
                         "comoving_radial_distance", "sigma8_z", "fsigma8"):
                self._merge_z_req(req, spec)
            elif req == "angular_diameter_distance_2":
                pool = self._z_pools.setdefault(req, Pool2D())
                pool.update(spec["z_pairs"])
                self._must_provide[req] = {"z_pairs": pool.values}
            elif req in ("Pk_interpolator", "Pk_grid", "sigma_R"):
                current = self._must_provide.get(req, {})
                merged = dict(current)
                for k, v in spec.items():
                    if k == "z":
                        zs = np.unique(np.concatenate([
                            np.atleast_1d(current.get("z", [])),
                            np.atleast_1d(v)]))
                        merged["z"] = zs
                    elif k in ("k_max", "R_max"):
                        merged[k] = max(current.get(k, 0), v)
                    elif k == "vars_pairs":
                        pairs = {tuple(p) for p in current.get(
                            "vars_pairs", [])}
                        pairs.update(tuple(p) for p in _norm_pairs(v))
                        merged["vars_pairs"] = sorted(pairs)
                    else:
                        merged[k] = v
                self._must_provide[req] = merged
            elif req == "source_Cl":
                current = self._must_provide.get(req, {})
                current.update(spec)
                self._must_provide[req] = current
            elif req == "CAMBdata":
                self._must_provide[req] = {}
            else:
                # bare parameter-like requirement -> derived param request
                self._must_provide.setdefault("derived_params", set()).add(
                    req
                )
        return None

    def _merge_z_req(self, req: str, spec: Mapping):
        pool = self._z_pools.setdefault(req, Pool1D())
        pool.update(spec.get("z", []))
        self._must_provide[req] = {"z": pool.values, **{
            k: v for k, v in spec.items() if k != "z"
        }}

    def requested(self) -> dict:
        return dict(self._must_provide)

    # ------------------------------------------------------------------
    # traced product export (device-side likelihood math)
    # ------------------------------------------------------------------
    # z-pool requirements exported verbatim as fixed-shape arrays
    _Z_EXPORTS = ("Hubble", "angular_diameter_distance",
                  "comoving_radial_distance", "fsigma8", "sigma8_z",
                  "Omega_b", "Omega_cdm", "Omega_nu_massive")
    # number of k points on the exported P(k) grid (must match the grid the
    # backend stores in the state; the CAMB/CLASS wrappers use 200)
    pk_grid_points: int = 200

    def _pk_export_entries(self):
        """(key, nz, pair, nonlinear) tuples for the negotiated Pk grids."""
        entries = []
        seen = set()
        for req in ("Pk_interpolator", "Pk_grid"):
            spec = self._must_provide.get(req)
            if spec is None:
                continue
            nz = len(np.atleast_1d(spec.get("z", [0.0])))
            for pair in _norm_pairs(spec.get("vars_pairs")):
                if pair in seen:
                    continue
                seen.add(pair)
                tag = f"{pair[0]}_{pair[1]}"
                entries.append((f"Pk_k_{tag}", nz, pair, None))
                entries.append((f"Pk_nl_{tag}", nz, pair, True))
                entries.append((f"Pk_lin_{tag}", nz, pair, False))
        return entries

    def callback_output_spec(self) -> dict:
        """Fixed-shape numeric products for the jit bridge.

        Jittable likelihoods downstream read these as traced arrays via
        :class:`~cobaya_tpu.theories.cosmo.traced.TracedCosmoProducts`, so
        all bandpower/covariance math stays on device; conventions
        documented there.
        """
        import jax
        import jax.numpy as jnp

        dt = jnp.zeros(0).dtype  # honors jax_enable_x64
        spec: dict[str, Any] = {}
        mp = self._must_provide
        for cl, lmax in mp.get("Cl", {}).items():
            spec[f"Cl_{cl}"] = jax.ShapeDtypeStruct((int(lmax) + 1,), dt)
        if "Cl" in mp:
            spec["T_cmb"] = jax.ShapeDtypeStruct((), dt)
        for req in self._Z_EXPORTS:
            if req in mp:
                n = len(np.atleast_1d(mp[req]["z"]))
                spec[req] = jax.ShapeDtypeStruct((n,), dt)
        if "angular_diameter_distance_2" in mp:
            n = len(mp["angular_diameter_distance_2"]["z_pairs"])
            spec["angular_diameter_distance_2"] = jax.ShapeDtypeStruct(
                (n,), dt
            )
        for p in sorted(mp.get("derived_params", ())):
            spec[p] = jax.ShapeDtypeStruct((), dt)
        nk = int(self.pk_grid_points)
        for key, nz, _pair, nonlinear in self._pk_export_entries():
            shape = (nk,) if nonlinear is None else (nz, nk)
            spec[key] = jax.ShapeDtypeStruct(shape, dt)
        return spec

    def callback_export(self, state: dict) -> dict:
        """Flatten a computed state into the declared spec keys."""
        out: dict[str, Any] = {}
        mp = self._must_provide
        cl_state = state.get("Cl") or {}
        for cl, lmax in mp.get("Cl", {}).items():
            vec = np.zeros(int(lmax) + 1)
            src = np.asarray(cl_state.get(cl, []))[: int(lmax) + 1]
            vec[: len(src)] = src
            out[f"Cl_{cl}"] = vec
        if "Cl" in mp:
            out["T_cmb"] = self._T_cmb_of_state(state)
        for key, _nz, pair, nonlinear in self._pk_export_entries():
            state_key = ("Pk_grid", True if nonlinear is None else
                         nonlinear) + tuple(pair)
            if state_key in state:
                z, k, pk = state[state_key]
                out[key] = np.asarray(k) if nonlinear is None \
                    else np.asarray(pk)
        # z-grid quantities and derived params are already flat in the
        # state / derived dict and flow through the bridge by name
        return out

    def _T_cmb_of_state(self, state: dict) -> float:
        """CMB temperature [K] of this state (for traced unit factors)."""
        return Const.T_CMB

    def _get_z_dependent(self, quantity: str, z) -> np.ndarray:
        pool = self._z_pools.get(quantity)
        if pool is None:
            raise LoggedError(
                self.log, "'%s' was not requested with must_provide.",
                quantity,
            )
        idx = pool.indices(z)
        values = self.current_state.get(quantity)
        return np.asarray(values)[idx]

    # ------------------------------------------------------------------
    # product getters (contract used by likelihoods)
    # ------------------------------------------------------------------
    def _cmb_unit_factor(self, units: str, T_cmb: float) -> float:
        """Conversion from dimensionless C_l to requested units."""
        units_factors = {
            "1": 1.0,
            "muK2": (T_cmb * 1e6) ** 2,
            "K2": T_cmb**2,
            "FIRASmuK2": (Const.T_CMB * 1e6) ** 2,
            "FIRASK2": Const.T_CMB**2,
        }
        try:
            return units_factors[units]
        except KeyError as exc:
            raise LoggedError(
                self.log, "Unknown CMB units '%s' (available: %s)",
                units, list(units_factors),
            ) from exc

    def _cl_dict_with_units(self, key: str, ell_factor: bool, units: str):
        """Convert a stored raw dimensionless Cl dict to requested units.

        The lensing potential 'pp' is dimensionless (no unit factor) and its
        conventional ell factor is [l(l+1)]^2/2pi (reference camb.py:305).
        """
        raw = self.current_state.get(key)
        if raw is None:
            raise LoggedError(
                self.log, "'%s' not computed; was it requested via "
                "must_provide?", key,
            )
        cl = dict(raw)
        ells = cl["ell"]
        factor = self._cmb_unit_factor(
            units, self._T_cmb_of_state(self.current_state)
        )
        ell_fac = ells * (ells + 1) / (2 * np.pi) if ell_factor else 1.0
        out = {"ell": ells}
        for name, val in cl.items():
            if name == "ell":
                continue
            if name == "pp":
                out[name] = val * ((ells * (ells + 1.0)) ** 2 / (2 * np.pi)
                                   if ell_factor else 1.0)
            else:
                out[name] = val * factor * ell_fac
        return out

    def get_Cl(self, ell_factor: bool = False, units: str = "FIRASmuK2"):
        """Lensed Cl dict; backends store raw dimensionless Cl under 'Cl'."""
        return self._cl_dict_with_units("Cl", ell_factor, units)

    def get_unlensed_Cl(self, ell_factor: bool = False,
                        units: str = "FIRASmuK2"):
        return self._cl_dict_with_units("unlensed_Cl", ell_factor, units)

    def get_Hubble(self, z, units: str = "km/s/Mpc"):
        factors = {"km/s/Mpc": 1.0, "1/Mpc": 1.0 / Const.c_km_s}
        if units not in factors:
            raise LoggedError(self.log, "Unknown H units '%s'", units)
        return self._get_z_dependent("Hubble", z) * factors[units]

    def get_Omega_b(self, z):
        return self._get_z_dependent("Omega_b", z)

    def get_Omega_cdm(self, z):
        return self._get_z_dependent("Omega_cdm", z)

    def get_Omega_nu_massive(self, z):
        return self._get_z_dependent("Omega_nu_massive", z)

    def get_angular_diameter_distance(self, z):
        return self._get_z_dependent("angular_diameter_distance", z)

    def get_angular_diameter_distance_2(self, z_pairs):
        pool = self._z_pools["angular_diameter_distance_2"]
        idx = pool.indices(z_pairs)
        return np.asarray(
            self.current_state["angular_diameter_distance_2"]
        )[idx]

    def get_comoving_radial_distance(self, z):
        return self._get_z_dependent("comoving_radial_distance", z)

    def get_sigma8_z(self, z):
        return self._get_z_dependent("sigma8_z", z)

    def get_fsigma8(self, z):
        return self._get_z_dependent("fsigma8", z)

    def get_Pk_grid(self, var_pair=("delta_tot", "delta_tot"),
                    nonlinear: bool = True):
        """(z, k, P) arrays: k in 1/Mpc, P in Mpc^3, both ascending —
        the reference contract (boltzmannbase.py:533-542)."""
        key = ("Pk_grid", bool(nonlinear)) + tuple(var_pair)
        try:
            return self.current_state[key]
        except KeyError as exc:
            raise LoggedError(
                self.log, "Pk_grid%s was not computed. Requested: %r",
                key, list(self.current_state),
            ) from exc

    def get_Pk_interpolator(self, var_pair=("delta_tot", "delta_tot"),
                            nonlinear: bool = True, extrap_kmin=None,
                            extrap_kmax=None):
        z, k, pk = self.get_Pk_grid(var_pair=var_pair, nonlinear=nonlinear)
        log_p = np.all(pk > 0)
        return PowerSpectrumInterpolator(
            z, k, pk, logP=log_p, extrap_kmin=extrap_kmin,
            extrap_kmax=extrap_kmax,
        )

    def get_sigma_R(self, var_pair=("delta_tot", "delta_tot")):
        key = ("sigma_R",) + tuple(var_pair)
        return self.current_state[key]

    def get_source_Cl(self):
        return self.current_state.get("source_Cl")

    def get_auto_covmat(self, params_info, likes_info):
        """Hook: look up a precomputed proposal covmat for this model."""
        return None


def _norm_pairs(vars_pairs) -> list[tuple[str, str]]:
    if not vars_pairs:
        return [("delta_tot", "delta_tot")]
    vp = list(vars_pairs)
    if vp and isinstance(vp[0], str):
        vp = [vp]
    return [tuple(p) for p in vp]


class PowerSpectrumInterpolator:
    """Bicubic interpolator in (z, log k) of (log) P(z, k).

    Capability parity with the reference's RectBivariateSpline subclass
    (boltzmannbase.py:630): ``P(z, k)``, ``logP(z, k)``, optional
    power-law extrapolation beyond the tabulated k-range.
    """

    def __init__(self, z, k, P_or_logP, logP: bool = False,
                 extrap_kmin=None, extrap_kmax=None):
        from scipy.interpolate import RectBivariateSpline

        self.z = np.atleast_1d(np.asarray(z, float))
        self.k = np.asarray(k, float)
        self.islog = logP
        values = np.atleast_2d(np.asarray(P_or_logP, float))
        if values.shape == (len(self.k), len(self.z)):
            values = values.T
        self._input_kmin, self._input_kmax = self.k[0], self.k[-1]
        self.extrap_kmin = extrap_kmin or self._input_kmin
        self.extrap_kmax = extrap_kmax or self._input_kmax
        logk = np.log(self.k)
        table = np.log(values) if logP else values
        kz = min(3, len(self.z) - 1)
        self._spline = RectBivariateSpline(self.z, logk, table,
                                           ky=min(3, len(self.k) - 1), kx=kz)
        # power-law extrapolation slopes at the edges
        self._slope_lo = (table[:, 1] - table[:, 0]) / (logk[1] - logk[0])
        self._slope_hi = (table[:, -1] - table[:, -2]) / (
            logk[-1] - logk[-2]
        )

    @property
    def input_kmin(self):
        return self._input_kmin

    @property
    def input_kmax(self):
        return self._input_kmax

    @property
    def kmin(self):
        return self.extrap_kmin

    @property
    def kmax(self):
        return self.extrap_kmax

    def check_ranges(self, z, k):
        z, k = np.atleast_1d(z), np.atleast_1d(k)
        if np.any(k < self.kmin) or np.any(k > self.kmax):
            raise ValueError(
                f"k out of range [{self.kmin}, {self.kmax}]"
            )
        if np.any(z < self.z[0]) or np.any(z > self.z[-1]):
            raise ValueError(f"z out of range [{self.z[0]}, {self.z[-1]}]")

    def logP(self, z, k, grid=None):
        if not self.islog:
            return np.log(self.P(z, k, grid=grid))
        return self._eval(z, k, grid=grid)

    def P(self, z, k, grid=None):
        if self.islog:
            return np.exp(self._eval(z, k, grid=grid))
        return self._eval(z, k, grid=grid)

    def _eval(self, z, k, grid=None):
        self.check_ranges(z, k)
        z_arr, k_arr = np.atleast_1d(z), np.atleast_1d(k)
        if grid is None:
            grid = z_arr.size > 1 or k_arr.size > 1
        logk = np.log(np.clip(k_arr, self._input_kmin, self._input_kmax))
        if grid:
            out = self._spline(z_arr, logk, grid=True)
        else:
            out = self._spline.ev(z_arr, logk)
        # power-law extrapolation outside the tabulated range (log space)
        if self.islog:
            lo = k_arr < self._input_kmin
            hi = k_arr > self._input_kmax
            for mask, slope, kedge in (
                (lo, self._slope_lo, self._input_kmin),
                (hi, self._slope_hi, self._input_kmax),
            ):
                if not np.any(mask):
                    continue
                dlogk = np.log(k_arr[mask] / kedge)
                if grid:
                    out = np.atleast_2d(out)
                    s = np.interp(z_arr, self.z, slope)
                    out[:, mask] += s[:, None] * dlogk[None, :]
                else:
                    s = np.interp(z_arr[mask] if z_arr.size > 1
                                  else np.full(mask.sum(), z_arr[0]),
                                  self.z, slope)
                    out[mask] += s * dlogk
        result = np.squeeze(out)
        return result if result.shape else float(result)

    def __call__(self, *args, **kwargs):
        return self._spline(*args, **kwargs)
