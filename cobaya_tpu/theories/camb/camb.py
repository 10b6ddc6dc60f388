"""CAMB Boltzmann-code wrapper (external Fortran package).

Capability parity with /root/reference/cobaya/theories/camb/camb.py: loads an
externally-installed ``camb`` python package (via path or site-packages),
translates the ``must_provide`` vocabulary into CAMBparams settings, computes
requested products (Cls, background quantities, matter power) per parameter
point, extracts derived parameters, and provides the installer hooks.

TPU-native role: CAMB runs on the HOST as the slow block.  The component is
``jittable = False``, so the vmapped sampler routes it through the batched
``pure_callback`` bridge: every step delivers the whole walker batch's
parameter sets in one host call, which the bridge fans out over a thread
pool (set ``callback_pool: N`` in the theory info, or
``COBAYA_TPU_CALLBACK_POOL``; CAMB's Fortran core releases the GIL so
threads scale) — amortizing slow evaluations the way the reference does
across MPI ranks.  Dragging and oversampling reuse the cached transfers via
the helper theory, so fast blocks never re-enter the host.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from typing import Any, Optional

import numpy as np

from ...models.component import ComponentNotInstalledError, load_external_module
from ...models.theory import HelperTheory
from ...utils.log import LoggedError
from ..cosmo.boltzmannbase import BoltzmannBase

# initial-power / amplitude-rescaling parameters: cheap to apply on cached
# transfer functions, so they stay with the host when the transfers helper
# splits the calculation (reference camb.py:1161 CambTransfers)
_INITIAL_POWER_PARAMS = frozenset({
    "As", "ns", "nrun", "nrunrun", "r", "At", "nt", "ntrun", "Alens",
    "pivot_scalar", "pivot_tensor",
})


class CAMB(BoltzmannBase):
    """CAMB interface (requires the external ``camb`` package)."""

    file_base_name = "camb"

    path: Optional[str] = None
    extra_args: Optional[dict] = None
    ignore_obsolete: bool = False
    external_primordial_pk: bool = False
    # split transfer functions into a helper theory so that initial-power /
    # non-linear parameter moves reuse cached transfers (the fast/slow
    # hierarchy inside one Boltzmann code, reference camb.py:1161-1250)
    use_transfer_helper: bool = True
    renames: Optional[dict] = {
        "omegabh2": "ombh2", "omegach2": "omch2", "omegal": "omega_de",
        "omegak": "omk", "yhe": "YHe", "yheused": "YHe", "YpBBN": "Y_p",
    }
    _min_camb_version = "1.5"

    def initialize(self):
        super().initialize()
        self.camb = self.get_camb_module(self.path, self.packages_path)
        self._base_params: dict = {}
        self._transfer_requested = False
        self._transfers: Optional["CambTransfers"] = None
        if self.use_transfer_helper:
            self._transfers = CambTransfers(
                self, self.get_name() + ".transfers",
                {"stop_at_error": self.stop_at_error},
                timing=bool(self.timer),
            )

    def get_helper_theories(self):
        if self._transfers is not None:
            return {self._transfers.get_name(): self._transfers}
        return {}

    @classmethod
    def get_camb_module(cls, path=None, packages_path=None):
        search_path = path
        if not search_path and packages_path:
            candidate = os.path.join(packages_path, "code", "CAMB")
            if os.path.isdir(candidate):
                search_path = candidate
        try:
            return load_external_module(
                "camb", path=search_path, min_version=cls._min_camb_version,
            )
        except ComponentNotInstalledError:
            raise ComponentNotInstalledError(
                None,
                "CAMB is not installed. Install it with "
                "`cobaya-tpu install camb` or `pip install camb`.",
            )

    def get_can_provide_params(self):
        return [
            "H0", "omegam", "omega_de", "YHe", "Y_p", "DHBBN", "zrei", "taurex",
            "age", "zstar", "rstar", "thetastar", "DAstar", "zdrag", "rdrag",
            "kd", "thetad", "zeq", "keq", "thetaeq", "thetarseq", "sigma8",
            "As", "ns", "theta_MC_100", "N_eff",
        ]

    _all_supported_params = (
        "ombh2", "omch2", "omnuh2", "omk", "H0", "cosmomc_theta",
        "thetastar", "As", "ns", "nrun", "nrunrun", "r", "At", "nt",
        "ntrun", "tau", "zrei", "mnu", "nnu", "num_massive_neutrinos",
        "YHe", "meffsterile", "Alens", "w", "wa", "cs2", "dark_energy_model",
        "TCMB", "pivot_scalar", "pivot_tensor",
    )

    def get_can_support_params(self):
        # sigma8 may replace As as the power amplitude input: spectra are
        # computed with the default As and rescaled (reference camb.py:731)
        if self.external_primordial_pk:
            # P_k(k) comes from another theory: no initial-power params here
            not_power = [p for p in self._all_supported_params
                         if p not in _INITIAL_POWER_PARAMS or p == "Alens"]
            if self._transfers is not None:
                return ["Alens"]
            return not_power
        if self._transfers is not None:
            # transfer/background params route to the helper
            return [p for p in self._all_supported_params
                    if p in _INITIAL_POWER_PARAMS] + ["sigma8"]
        return list(self._all_supported_params) + ["sigma8"]

    def must_provide(self, **requirements):
        out = super().must_provide(**requirements)
        if self._transfers is None:
            return out
        from ...models.theory import check_requirement

        out = check_requirement(out)
        perts = ("Cl", "unlensed_Cl", "source_Cl", "Pk_interpolator",
                 "Pk_grid", "sigma_R", "sigma8_z", "fsigma8")
        out["CAMB_transfers"] = {
            "needs_perts": any(k in self._must_provide for k in perts),
            "non_linear": "Cl" in self._must_provide,
        }
        if self.external_primordial_pk and out["CAMB_transfers"][
            "needs_perts"
        ]:
            out["primordial_scalar_pk"] = None
        return out

    def initialize_with_params(self):
        if "sigma8" in (self.input_params or []) and "As" in (
            self.input_params or []
        ):
            raise LoggedError(
                self.log, "Both As and sigma8 given as input: the power "
                "amplitude would be ill-defined.",
            )
        super().initialize_with_params()

    # ------------------------------------------------------------------
    def _set_params(self, params_values: Mapping) -> Any:
        args = {self.translate_param(p): v for p, v in params_values.items()
                if p != "sigma8"}
        args.update(self.extra_args or {})
        # lmax from Cl requirements
        cls_req = self._must_provide.get("Cl", {})
        if cls_req:
            args.setdefault("lmax", max(cls_req.values()) + 500)
            args.setdefault("lens_potential_accuracy", 1)
        pk_req = self._must_provide.get("Pk_interpolator") or \
            self._must_provide.get("Pk_grid") or \
            self._must_provide.get("sigma_R")
        if pk_req is not None:
            args.setdefault("redshifts",
                            np.atleast_1d(pk_req.get("z", [0.0]))[::-1])
            # requested k_max is in 1/Mpc; CAMB's transfer kmax is h/Mpc.
            # When h is known from this very point's params, convert
            # exactly; otherwise pad by 2.5x (covers any h >= 0.4) so a
            # wide H0 prior never gets extrapolated/truncated P(k) near
            # the requested k_max.
            h = None
            if "H0" in args and np.isscalar(args["H0"]):
                h = float(args["H0"]) / 100.0
            elif "h" in args and np.isscalar(args["h"]):
                h = float(args["h"])
            pad = (1.0 / h) if h and h > 0 else 2.5
            args.setdefault("kmax", pk_req.get("k_max", 2.0) * pad)
        try:
            pars = self.camb.set_params(**args)
        except Exception as exc:
            raise LoggedError(
                self.log, "Error setting CAMB parameters %r: %s", args, exc
            ) from exc
        # number-count / lensing-window sources (reference camb.py:997-1013)
        src = self._must_provide.get("source_Cl")
        if src and src.get("sources"):
            camb_sources = self.camb.sources
            windows = []
            for _, window in src["sources"].items():
                window = dict(window)
                function = window.pop("function", "gaussian")
                if function == "spline":
                    windows.append(
                        camb_sources.SplinedSourceWindow(**window)
                    )
                else:
                    windows.append(
                        camb_sources.GaussianSourceWindow(**window)
                    )
            pars.SourceWindows = windows
            if "limber" in src:
                pars.SourceTerms.limber_windows = bool(src["limber"])
        return pars

    def _apply_initial_power(self, pars, params_values_dict):
        """Set the host's (fast) initial-power params on a CAMBparams copy."""
        init_power = {}
        for p, v in params_values_dict.items():
            tp = self.translate_param(p)
            if tp == "Alens":
                pars.Alens = v
            elif tp in _INITIAL_POWER_PARAMS:
                init_power[tp] = v
        if init_power:
            pars.InitPower.set_params(**init_power)
        return pars

    def _apply_external_primordial_pk(self, pars):
        """Install the externally-provided primordial P(k) table on
        InitPower (reference camb.py:679-698; scalar only)."""
        ppk = self.provider.get_primordial_scalar_pk()
        ip = pars.InitPower
        if ppk.get("log_regular", True):
            ip.set_scalar_log_regular(ppk["kmin"], ppk["kmax"], ppk["Pk"])
        else:
            ip.set_scalar_table(ppk["k"], ppk["Pk"])
        if hasattr(ip, "effective_ns_for_nonlinear"):
            ip.effective_ns_for_nonlinear = ppk.get(
                "effective_ns_for_nonlinear", 0.97
            )
        return pars

    def _rescale_to_sigma8(self, pars, results, sigma8_target: float):
        """Rescale As so sigma8(0) hits the requested value, then
        recompute the power spectra (reference camb.py:731-736)."""
        measured = float(results.get_sigma8_0())
        pars.InitPower.As *= float(sigma8_target) ** 2 / measured**2
        results.calc_power_spectra(pars)
        return pars

    def calculate(self, state: dict, want_derived: bool = True,
                  **params_values_dict):
        try:
            sigma8_target = params_values_dict.get("sigma8")
            if self._transfers is not None:
                # fast path: apply initial power to the helper's cached
                # transfer functions (reference camb.py:675-774)
                got = self.provider.get_CAMB_transfers()
                if not got:
                    return False
                transfer_pars, results = got
                pars = self._apply_initial_power(
                    transfer_pars.copy() if hasattr(transfer_pars, "copy")
                    else transfer_pars, params_values_dict,
                )
                if self.external_primordial_pk \
                        and self._transfers.needs_perts:
                    pars = self._apply_external_primordial_pk(pars)
                if self._transfers.needs_perts:
                    results.calc_power_spectra(pars)
                    if sigma8_target is not None:
                        pars = self._rescale_to_sigma8(
                            pars, results, sigma8_target
                        )
            else:
                pars = self._set_params(params_values_dict)
                if self.external_primordial_pk:
                    pars = self._apply_external_primordial_pk(pars)
                results = self.camb.get_results(pars)
                if sigma8_target is not None:
                    pars = self._rescale_to_sigma8(pars, results,
                                                   sigma8_target)
        except Exception as exc:
            if self.stop_at_error:
                raise LoggedError(
                    self.log, "CAMB failed at %r: %s", params_values_dict, exc
                ) from exc
            self.log.debug("CAMB failed: %s", exc)
            return False
        state["CAMBdata"] = results
        mp = self._must_provide
        if "Cl" in mp:
            powers = results.get_cmb_power_spectra(
                pars, CMB_unit=None, raw_cl=True
            )
            total = powers["total"]
            lensing = powers.get("lens_potential")
            ells = np.arange(total.shape[0])
            cl = {"ell": ells}
            spectra = {"tt": 0, "ee": 1, "bb": 2, "te": 3}
            for name, i in spectra.items():
                if name in mp["Cl"]:
                    cl[name] = total[:, i]
            if lensing is not None and "pp" in mp["Cl"]:
                cl["pp"] = lensing[:, 0]
            state["Cl"] = cl
        if "unlensed_Cl" in mp:
            powers = results.get_cmb_power_spectra(
                pars, CMB_unit=None, raw_cl=True
            )
            unlensed = powers["unlensed_scalar"]
            cl = {"ell": np.arange(unlensed.shape[0])}
            for name, i in {"tt": 0, "ee": 1, "bb": 2, "te": 3}.items():
                if name in mp["unlensed_Cl"]:
                    cl[name] = unlensed[:, i]
            state["unlensed_Cl"] = cl
        bg = results
        if "Hubble" in mp:
            z = mp["Hubble"]["z"]
            state["Hubble"] = bg.hubble_parameter(z)
        if "angular_diameter_distance" in mp:
            z = mp["angular_diameter_distance"]["z"]
            state["angular_diameter_distance"] = (
                bg.angular_diameter_distance(z)
            )
        if "angular_diameter_distance_2" in mp:
            pairs = mp["angular_diameter_distance_2"]["z_pairs"]
            state["angular_diameter_distance_2"] = np.array([
                bg.angular_diameter_distance2(z1, z2) for z1, z2 in pairs
            ])
        if "comoving_radial_distance" in mp:
            z = mp["comoving_radial_distance"]["z"]
            state["comoving_radial_distance"] = (
                bg.comoving_radial_distance(z)
            )
        if "fsigma8" in mp:
            z = mp["fsigma8"]["z"]
            state["fsigma8"] = results.get_fsigma8()[::-1] if hasattr(
                results, "get_fsigma8") else np.full(len(z), np.nan)
        if "sigma8_z" in mp:
            z = mp["sigma8_z"]["z"]
            state["sigma8_z"] = results.get_sigma8()[::-1] if hasattr(
                results, "get_sigma8") else np.full(len(z), np.nan)
        for req in ("Pk_interpolator", "Pk_grid"):
            spec = mp.get(req)
            if spec is None:
                continue
            from ..cosmo.boltzmannbase import _norm_pairs

            # reference contract (boltzmannbase.py:533-542): k in 1/Mpc,
            # P in Mpc^3 — CAMB's helper returns h/Mpc and (Mpc/h)^3
            h = float(results.Params.H0) / 100.0
            for pair in _norm_pairs(spec.get("vars_pairs")):
                for nonlinear in {bool(spec.get("nonlinear", True)), False}:
                    kh, z_out, pk = results.get_matter_power_spectrum(
                        minkh=1e-4 / h,
                        maxkh=spec.get("k_max", 2.0) / h, npoints=200,
                        var1=pair[0], var2=pair[1],
                    )
                    state[("Pk_grid", nonlinear) + tuple(pair)] = (
                        np.asarray(z_out), np.asarray(kh) * h,
                        np.asarray(pk) / h ** 3,
                    )
        if "sigma_R" in mp:
            # RMS fluctuation in spheres of radius R [Mpc] at requested z
            # (reference camb.py:513-546)
            spec = mp["sigma_R"]
            from ..cosmo.boltzmannbase import _norm_pairs

            R = np.atleast_1d(spec.get("R", np.linspace(8, 100, 10)))
            for pair in _norm_pairs(spec.get("vars_pairs")):
                try:
                    R_out, z_out, sigma = results.get_sigmaR(
                        R, var1=pair[0], var2=pair[1], hubble_units=False,
                        return_R_z=True,
                    )
                except TypeError:  # older camb without return_R_z
                    sigma = results.get_sigmaR(
                        R, var1=pair[0], var2=pair[1], hubble_units=False,
                    )
                    R_out = R
                    z_out = np.atleast_1d(spec.get("z", [0.0]))
                state[("sigma_R",) + tuple(pair)] = (
                    np.asarray(z_out), np.asarray(R_out), np.asarray(sigma)
                )
        if "source_Cl" in mp:
            state["source_Cl"] = results.get_source_cls_dict()
        if want_derived:
            state["derived"] = self._get_derived(results, params_values_dict)
        return True

    def _get_derived(self, results, params_values) -> dict:
        derived = {}
        try:
            derived_dict = results.get_derived_params()
        except Exception:
            derived_dict = {}
        camb_names = {
            "age": "age", "zstar": "zstar", "rstar": "rstar",
            "thetastar": "thetastar", "zdrag": "zdrag", "rdrag": "rdrag",
            "kd": "kd", "thetad": "thetad", "zeq": "zeq", "keq": "keq",
        }
        # requirement-negotiated derived params (e.g. BAO's rdrag) are
        # computed even when not requested as chain output params, so
        # traced likelihoods can consume them on device
        wanted = set(self.output_params) | set(
            self._must_provide.get("derived_params", ())
        )
        for p in wanted:
            pt = self.translate_param(p)
            if pt in derived_dict:
                derived[p] = derived_dict[pt]
            elif pt in camb_names:
                derived[p] = derived_dict.get(camb_names[pt], np.nan)
            elif pt == "H0":
                derived[p] = results.Params.H0
            elif pt == "omegam":
                derived[p] = results.get_Omega("cdm") + results.get_Omega(
                    "baryon") + results.get_Omega("nu")
            elif pt == "sigma8":
                derived[p] = results.get_sigma8_0()
            elif pt == "As":
                derived[p] = float(results.Params.InitPower.As)
            elif pt == "ns":
                derived[p] = float(results.Params.InitPower.ns)
            else:
                derived[p] = np.nan
        return derived

    def get_CAMBdata(self):
        return self.current_state.get("CAMBdata")

    def _T_cmb_of_state(self, state: dict) -> float:
        return float(getattr(
            getattr(state.get("CAMBdata"), "Params", None), "TCMB", 2.7255,
        ))

    # get_Cl / get_unlensed_Cl inherited from BoltzmannBase (raw Cl stored
    # in the state; units via _T_cmb_of_state below)

    # ------------------------------------------------------------------
    @classmethod
    def is_installed(cls, path=None, **kwargs) -> bool:
        if not kwargs.get("code", True):
            return True
        try:
            cls.get_camb_module(path=None, packages_path=path)
            return True
        except ComponentNotInstalledError:
            return False

    @classmethod
    def install(cls, path=None, code=True, **kwargs):
        if not code:
            return True
        from ...install import pip_install

        return pip_install("camb")


class CambTransfers(HelperTheory):
    """Transfer-function helper: the slow half of a split CAMB calculation.

    Capability parity with reference camb.py:1161-1250 (``CambTransfers``):
    owns the transfer/background parameters, computes and caches the CAMB
    transfer functions (or background only, when no perturbations are
    needed); the host applies initial-power parameters on top.  With the
    LRU state cache, fast-block moves (As, ns, r, ...) never recompute
    transfers — the speed hierarchy *inside* one Boltzmann code.
    """

    jittable = False

    def __init__(self, cobaya_camb: CAMB, name: str, info, timing=None):
        self.needs_perts = False
        self.non_linear_sources = False
        super().__init__(info, name=name, timing=timing, standalone=False)
        self.cobaya_camb = cobaya_camb
        self.camb = cobaya_camb.camb
        # transfers take ~2/3 of a full CAMB call (reference camb.py:1172)
        self.speed = cobaya_camb.speed * 1.5 if cobaya_camb.speed > 0 else -1

    def get_can_provide(self):
        return ["CAMB_transfers"]

    def get_can_support_params(self):
        return [p for p in self.cobaya_camb._all_supported_params
                if p not in _INITIAL_POWER_PARAMS]

    def must_provide(self, **requirements):
        super().must_provide(**requirements)
        if opts := requirements.get("CAMB_transfers"):
            self.non_linear_sources = bool(opts.get("non_linear"))
            self.needs_perts = bool(opts.get("needs_perts"))
        return None

    def get_CAMB_transfers(self):
        return self.current_state.get("CAMB_transfers")

    def calculate(self, state: dict, want_derived: bool = True,
                  **params_values_dict):
        pars = self.cobaya_camb._set_params(params_values_dict)
        try:
            if self.non_linear_sources:
                try:
                    results = self.camb.get_transfer_functions(
                        pars, only_time_sources=True
                    )
                except TypeError:  # older camb without the kwarg
                    results = self.camb.get_transfer_functions(pars)
            elif self.needs_perts:
                results = self.camb.get_transfer_functions(pars)
            else:
                results = self.camb.get_background(pars)
        except Exception as exc:
            if self.stop_at_error:
                raise LoggedError(
                    self.log, "CAMB transfers failed at %r: %s",
                    params_values_dict, exc,
                ) from exc
            self.log.debug("CAMB transfers failed: %s", exc)
            return False
        state["CAMB_transfers"] = (pars, results)
        state["derived"] = {}
        return True
