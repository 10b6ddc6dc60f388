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
        self.classy = self.classy_module.Class()

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
        return ["H0", "Omega_m", "sigma8", "YHe", "z_reio", "age",
                "rs_drag", "theta_s_100"]

    def _set_args(self, params_values) -> dict:
        args = {self.translate_param(p): v for p, v in params_values.items()}
        args.update(self.extra_args or {})
        output = set(str(args.get("output", "")).split())
        mp = self._must_provide
        if "Cl" in mp:
            output.update(["tCl", "pCl", "lCl"])
            args["lensing"] = "yes"
            args["l_max_scalars"] = max(mp["Cl"].values())
        if mp.get("Pk_interpolator") is not None or \
                mp.get("Pk_grid") is not None:
            output.add("mPk")
            spec = mp.get("Pk_interpolator") or mp.get("Pk_grid")
            args["P_k_max_h/Mpc"] = spec.get("k_max", 2.0)
            args["z_max_pk"] = float(np.max(np.atleast_1d(
                spec.get("z", [0.0]))))
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
        if "Hubble" in mp:
            z = mp["Hubble"]["z"]
            state["Hubble"] = np.array(
                [self.classy.Hubble(zi) for zi in z]
            ) * 299792.458  # 1/Mpc -> km/s/Mpc
        if "angular_diameter_distance" in mp:
            z = mp["angular_diameter_distance"]["z"]
            state["angular_diameter_distance"] = np.array(
                [self.classy.angular_distance(zi) for zi in z]
            )
        if "comoving_radial_distance" in mp:
            z = mp["comoving_radial_distance"]["z"]
            state["comoving_radial_distance"] = np.array(
                [self.classy.comoving_distance(zi) for zi in z]
            )
        if "fsigma8" in mp:
            z = mp["fsigma8"]["z"]
            state["fsigma8"] = np.array(
                [self.classy.scale_independent_growth_factor_f(zi)
                 * self.classy.sigma(8.0 / self.classy.h(), zi) for zi in z]
            )
        for req in ("Pk_interpolator", "Pk_grid"):
            spec = mp.get(req)
            if spec is None:
                continue
            from ..cosmo.boltzmannbase import _norm_pairs

            z = np.atleast_1d(spec.get("z", [0.0]))
            k = np.logspace(-4, np.log10(spec.get("k_max", 2.0)), 200)
            for pair in _norm_pairs(spec.get("vars_pairs")):
                pk = np.array([
                    [self.classy.pk(ki * self.classy.h(), zi)
                     * self.classy.h() ** 3 for ki in k]
                    for zi in z
                ])
                for nonlinear in (True, False):
                    state[("Pk_grid", nonlinear) + tuple(pair)] = (z, k, pk)
        if want_derived:
            derived = {}
            dp = self.classy.get_current_derived_parameters(
                [self.translate_param(p) for p in self.output_params]
            ) if self.output_params else {}
            for p in self.output_params:
                derived[p] = dp.get(self.translate_param(p), np.nan)
            state["derived"] = derived
        return True

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
