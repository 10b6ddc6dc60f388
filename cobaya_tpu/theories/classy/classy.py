"""CLASS Boltzmann-code wrapper (external C package, ``classy`` bindings).

Capability parity with /root/reference/cobaya/theories/classy/classy.py:
same ``BoltzmannBase`` product contract as the CAMB wrapper, with CLASS
parameter-name translation and installer hooks.  Host-callback component
(the C code runs on host; the vmapped sampler batches walker parameter sets
into one call per step).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...models.component import ComponentNotInstalledError, load_external_module
from ...utils.log import LoggedError
from ..cosmo.boltzmannbase import BoltzmannBase


class classy(BoltzmannBase):
    """CLASS interface (requires the external ``classy`` package)."""

    file_base_name = "classy"

    path: Optional[str] = None
    extra_args: Optional[dict] = None
    ignore_obsolete: bool = False
    renames: Optional[dict] = {
        "omegabh2": "omega_b", "omegach2": "omega_cdm", "H0": "H0",
        "As": "A_s", "ns": "n_s", "tau": "tau_reio", "omk": "Omega_k",
        "mnu": "m_ncdm", "nnu": "N_ur", "w": "w0_fld", "wa": "wa_fld",
    }

    def initialize(self):
        super().initialize()
        self.classy_module = self.get_classy_module(
            self.path, self.packages_path
        )
        import threading

        self._classy_local = threading.local()

    @property
    def classy(self):
        """One CLASS solver per thread: the host-callback pool fans the
        walker batch over threads, and a ``Class()`` instance holds per-run
        C state (set/compute/read must not interleave across threads)."""
        if not hasattr(self._classy_local, "instance"):
            self._classy_local.instance = self.classy_module.Class()
        return self._classy_local.instance

    @classmethod
    def get_classy_module(cls, path=None, packages_path=None):
        search_path = path
        if not search_path and packages_path:
            candidate = os.path.join(packages_path, "code", "classy")
            if os.path.isdir(candidate):
                search_path = candidate
        try:
            return load_external_module("classy", path=search_path)
        except ComponentNotInstalledError:
            raise ComponentNotInstalledError(
                None,
                "CLASS (classy) is not installed. Install it with "
                "`cobaya-tpu install classy` or compile CLASS with its "
                "python wrapper.",
            )

    def get_can_support_params(self):
        return list((self.renames or {}).values()) + [
            "omega_b", "omega_cdm", "h", "A_s", "n_s", "tau_reio",
            "ln10^{10}A_s", "100*theta_s",
        ]

    def get_can_provide_params(self):
        return ["H0", "h", "Omega_m", "omegam", "Omega_nu", "sigma8",
                "YHe", "z_reio", "age", "rdrag", "rs_drag", "tau_reio",
                "theta_s_100"]

    def _set_args(self, params_values) -> dict:
        args = {self.translate_param(p): v for p, v in params_values.items()}
        args.update(self.extra_args or {})
        output = set(str(args.get("output", "")).split())
        mp = self._must_provide
        lmaxes = [max(mp[k].values()) for k in ("Cl", "unlensed_Cl")
                  if k in mp]
        if "Cl" in mp:
            output.update(["tCl", "pCl", "lCl"])
            args["lensing"] = "yes"
        if "unlensed_Cl" in mp:
            output.update(["tCl", "pCl"])
        if lmaxes:
            args["l_max_scalars"] = max(lmaxes)
        z_pk = []
        pk_spec = mp.get("Pk_interpolator") or mp.get("Pk_grid")
        if pk_spec is not None:
            output.add("mPk")
            args["P_k_max_1/Mpc"] = pk_spec.get("k_max", 2.0)
            z_pk += list(np.atleast_1d(pk_spec.get("z", [0.0])))
            pairs = {tuple(p) for p in (pk_spec.get("vars_pairs") or [])}
            if ("Weyl", "Weyl") in pairs:
                output.add("mTk")
        if "sigma_R" in mp:
            output.add("mPk")
            args["P_k_max_1/Mpc"] = max(
                args.get("P_k_max_1/Mpc", 0), mp["sigma_R"].get("k_max", 2.0)
            )
            z_pk += list(np.atleast_1d(mp["sigma_R"].get("z", [0.0])))
        for req in ("fsigma8", "sigma8_z"):
            if req in mp:
                output.add("mPk")
                args.setdefault("P_k_max_1/Mpc", 2.0)
                z_pk += list(np.atleast_1d(mp[req]["z"]))
        if z_pk:
            args["z_max_pk"] = float(np.max(z_pk))
        if output:
            args["output"] = " ".join(sorted(output))
        return args

    def calculate(self, state: dict, want_derived: bool = True,
                  **params_values_dict):
        self.classy.set(self._set_args(params_values_dict))
        try:
            self.classy.compute()
        except self.classy_module.CosmoComputationError as exc:
            if self.stop_at_error:
                raise LoggedError(
                    self.log, "CLASS failed at %r: %s",
                    params_values_dict, exc,
                ) from exc
            return False
        mp = self._must_provide
        if "Cl" in mp:
            lmax = max(mp["Cl"].values())
            cls = self.classy.lensed_cl(lmax)
            state["Cl"] = {k: np.asarray(v) for k, v in cls.items()}
            state["T_cmb"] = float(self.classy.T_cmb())
        if "unlensed_Cl" in mp:
            lmax = max(mp["unlensed_Cl"].values())
            cls = self.classy.raw_cl(lmax)
            state["unlensed_Cl"] = {k: np.asarray(v) for k, v in cls.items()}
            state.setdefault("T_cmb", float(self.classy.T_cmb()))
        if "Hubble" in mp:
            z = mp["Hubble"]["z"]
            state["Hubble"] = np.array(
                [self.classy.Hubble(zi) for zi in z]
            ) * 299792.458  # 1/Mpc -> km/s/Mpc
        # background density fractions (reference classy.py:384-392)
        for req, fname in (("Omega_b", "Om_b"), ("Omega_cdm", "Om_cdm"),
                           ("Omega_nu_massive", "Om_ncdm")):
            if req in mp:
                func = getattr(self.classy, fname)
                state[req] = np.array(
                    [func(zi) for zi in mp[req]["z"]]
                )
        if "angular_diameter_distance" in mp:
            z = mp["angular_diameter_distance"]["z"]
            state["angular_diameter_distance"] = np.array(
                [self.classy.angular_distance(zi) for zi in z]
            )
        if "angular_diameter_distance_2" in mp:
            pairs = mp["angular_diameter_distance_2"]["z_pairs"]
            state["angular_diameter_distance_2"] = np.array([
                self.classy.angular_distance_from_to(z1, z2)
                for z1, z2 in pairs
            ])
        if "comoving_radial_distance" in mp:
            z = mp["comoving_radial_distance"]["z"]
            state["comoving_radial_distance"] = np.array(
                [self.classy.comoving_distance(zi) for zi in z]
            )
        if "fsigma8" in mp:
            z = mp["fsigma8"]["z"]
            # reference uses CLASS's effective_f_sigma8 when available
            # (classy.py:471-482); fall back to f * sigma8(z)
            if hasattr(self.classy, "effective_f_sigma8"):
                state["fsigma8"] = np.array(
                    [self.classy.effective_f_sigma8(zi, 0.1) for zi in z]
                )
            else:
                state["fsigma8"] = np.array(
                    [self.classy.scale_independent_growth_factor_f(zi)
                     * self.classy.sigma(8.0 / self.classy.h(), zi)
                     for zi in z]
                )
        if "sigma8_z" in mp:
            z = mp["sigma8_z"]["z"]
            state["sigma8_z"] = np.array(
                [self.classy.sigma(8.0 / self.classy.h(), zi) for zi in z]
            )
        if "sigma_R" in mp:
            # sigma(R, z) tables per var pair (reference classy.py:483-510)
            from ..cosmo.boltzmannbase import _norm_pairs

            spec = mp["sigma_R"]
            z = np.atleast_1d(spec.get("z", [0.0]))
            R = np.atleast_1d(spec.get("R", np.linspace(8, 100, 10)))
            methods = {("delta_tot", "delta_tot"): "sigma",
                       ("delta_nonu", "delta_nonu"): "sigma_cb"}
            for pair in _norm_pairs(spec.get("vars_pairs")):
                fname = methods.get(tuple(pair))
                if fname is None or not hasattr(self.classy, fname):
                    raise LoggedError(
                        self.log, "sigma(R, z) not implemented for %r", pair
                    )
                func = getattr(self.classy, fname)
                sigma = np.array([
                    [func(Ri, zi) for Ri in R] for zi in z
                ])
                state[("sigma_R",) + tuple(pair)] = (z, R, sigma)
        for req in ("Pk_interpolator", "Pk_grid"):
            spec = mp.get(req)
            if spec is None:
                continue
            from ..cosmo.boltzmannbase import _norm_pairs

            z = np.atleast_1d(spec.get("z", [0.0]))
            k = np.logspace(-4, np.log10(spec.get("k_max", 2.0)), 200)
            for pair in _norm_pairs(spec.get("vars_pairs")):
                pk = self._pk_table(tuple(pair), z, k)
                for nonlinear in (True, False):
                    state[("Pk_grid", nonlinear) + tuple(pair)] = (z, k, pk)
        # direct CLASS results (reference classy.py:511-520)
        for req in ("CLASS_background", "CLASS_thermodynamics",
                    "CLASS_primordial", "CLASS_perturbations",
                    "CLASS_sources"):
            if req in mp.get("derived_params", ()) or req in mp:
                getter = getattr(
                    self.classy, "get_" + req[len("CLASS_"):].lower(), None
                )
                if getter is not None:
                    state[req] = getter()
        if want_derived:
            state["derived"] = self._get_derived()
        return True

    def _pk_table(self, pair, z, k):
        """P(k) table (nz, nk): k in 1/Mpc, P in Mpc^3 — the reference's
        Pk_grid contract (boltzmannbase.py:533-542), which is also CLASS's
        native unit convention."""
        if pair == ("Weyl", "Weyl") and hasattr(
            self.classy, "get_Weyl_pk_and_k_and_z"
        ):
            P, kk, zz = self.classy.get_Weyl_pk_and_k_and_z()
            # interpolate onto the requested grids
            from scipy.interpolate import RectBivariateSpline

            zz = np.asarray(zz)
            kk = np.asarray(kk)
            sp = RectBivariateSpline(
                zz[::-1], np.log(kk), np.log(np.asarray(P).T[::-1]),
                kx=min(3, len(zz) - 1), ky=min(3, len(kk) - 1),
            )
            return np.exp(sp(z, np.log(k)))
        if pair == ("delta_nonu", "delta_nonu") and hasattr(
            self.classy, "pk_cb"
        ):
            return np.array([
                [self.classy.pk_cb(ki, zi) for ki in k] for zi in z
            ])
        return np.array([
            [self.classy.pk(ki, zi) for ki in k] for zi in z
        ])

    def _get_derived(self) -> dict:
        """Derived params incl. requirement-negotiated ones
        (reference classy.py:775-808)."""
        wanted = set(self.output_params or ()) | {
            p for p in self._must_provide.get("derived_params", ())
            if not p.startswith("CLASS_")
        }
        derived = {}
        if not wanted:
            return derived
        translated = {p: self.translate_param(p) for p in wanted}
        specials = {
            "Omega_nu": lambda: self.classy.Omega_nu,
            "Omega_m": lambda: self.classy.Omega_m(),
            "omegam": lambda: self.classy.Omega_m(),
            "H0": lambda: self.classy.h() * 100,
            "h": lambda: self.classy.h(),
            "sigma8": lambda: self.classy.sigma8(),
            "rdrag": lambda: self.classy.rs_drag(),
            "rs_drag": lambda: self.classy.rs_drag(),
            "tau_reio": lambda: self.classy.tau_reio(),
            "theta_s_100": lambda: self.classy.theta_s_100(),
        }
        try:
            dp = self.classy.get_current_derived_parameters(
                sorted({t for t in translated.values()
                        if t not in specials})
            )
        except Exception:
            dp = {}
        for p, t in translated.items():
            if t in dp:
                derived[p] = dp[t]
            elif t in specials:
                try:
                    derived[p] = specials[t]()
                except Exception:
                    derived[p] = np.nan
            else:
                derived[p] = np.nan
        return derived

    # get_Cl inherited from BoltzmannBase (raw Cl in the state)
    def _T_cmb_of_state(self, state: dict) -> float:
        from ...utils.conventions import Const

        return float(state.get("T_cmb", Const.T_CMB))

    def close(self):
        try:
            self.classy.struct_cleanup()
        except Exception:
            pass

    @classmethod
    def is_installed(cls, path=None, **kwargs) -> bool:
        if not kwargs.get("code", True):
            return True
        try:
            cls.get_classy_module(path=None, packages_path=path)
            return True
        except ComponentNotInstalledError:
            return False

    @classmethod
    def install(cls, path=None, code=True, **kwargs):
        if not code:
            return True
        from ...install import pip_install

        return pip_install("classy")
