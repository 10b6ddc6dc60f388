"""Planck official (clik) likelihood wrapper.

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/planck_clik.py: loads the
external ``clik``/``clipy`` package, queries the .clik file for required
spectra (lmax per Cl) and nuisance parameters, assembles the input vector
[Cl blocks..., nuisance params] per evaluation, and exposes installer hooks.
Host-callback component (the C code runs on host, batched by the sampler's
callback bridge).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...models.component import (
    ComponentNotInstalledError,
    load_external_module,
)
from ...utils.log import LoggedError
from ..base_classes.installable import InstallableLikelihood

_CL_ORDER = ["tt", "ee", "bb", "te", "tb", "eb"]


class PlanckClik(InstallableLikelihood):
    bibtex_file = "planck2018.bibtex"
    type = "CMB"
    jittable = False

    clik_file: Optional[str] = None
    path: Optional[str] = None
    product_id: Optional[str] = None

    def initialize(self):
        clipy = load_clipy(self.packages_path, logger=self.log)
        clik_path = self.clik_file
        if clik_path and not os.path.isabs(clik_path):
            base = self.path or (
                get_data_path(self.packages_path)
                if self.packages_path else None
            )
            if base:
                clik_path = os.path.join(base, clik_path)
        if not clik_path or not os.path.exists(clik_path):
            raise ComponentNotInstalledError(
                self.log,
                "The .clik file '%s' was not found. Install the Planck "
                "likelihood data (cobaya-tpu install) or set 'path'.",
                self.clik_file,
            )
        lensing = "lensing" in os.path.basename(clik_path).lower()
        self.clik = (clipy.clik_lensing(clik_path) if lensing
                     else clipy.clik(clik_path))
        self.expected_params = list(self.clik.extra_parameter_names)
        lmaxs = self.clik.get_lmax()
        self.requested_cls_lmax = {}
        if lensing:
            self.requested_cls_lmax["pp"] = int(lmaxs[0])
            for cl, lmax in zip(_CL_ORDER, lmaxs[1:]):
                if lmax >= 0:
                    self.requested_cls_lmax[cl] = int(lmax)
        else:
            for cl, lmax in zip(_CL_ORDER, lmaxs):
                if lmax >= 0:
                    self.requested_cls_lmax[cl] = int(lmax)
        n_cl = sum(lmax + 1 for lmax in self.requested_cls_lmax.values())
        self.vector = np.zeros(n_cl + len(self.expected_params))

    def initialize_with_params(self):
        missing = set(self.expected_params) - set(self.input_params or [])
        if missing:
            raise LoggedError(
                self.log,
                "Nuisance parameters required by this clik likelihood are "
                "missing from the input: %r", sorted(missing),
            )

    def get_can_support_params(self):
        return list(getattr(self, "expected_params", []))

    def get_requirements(self):
        return {"Cl": dict(self.requested_cls_lmax)}

    def logp(self, _derived=None, **params_values):
        cl = self.provider.get_Cl(units="FIRASmuK2")
        return self.log_likelihood(cl, **params_values)

    def log_likelihood(self, cl, **params_values) -> float:
        offset = 0
        for spec, lmax in self.requested_cls_lmax.items():
            block = np.asarray(cl.get(spec, np.zeros(lmax + 1)))[: lmax + 1]
            self.vector[offset:offset + lmax + 1] = block
            offset += lmax + 1
        if np.isnan(self.vector[:offset] @ self.vector[:offset]):
            return -np.inf
        self.vector[offset:] = [
            params_values[p] for p in self.expected_params
        ]
        # clik returns a length-1 array
        loglike = float(np.asarray(self.clik(self.vector)).reshape(-1)[0])
        if loglike <= -1e30 or np.isnan(loglike):
            return -np.inf
        return loglike

    @classmethod
    def is_installed(cls, path=None, **kwargs) -> bool:
        try:
            load_clipy(path)
            return True
        except ComponentNotInstalledError:
            return False

    @classmethod
    def install(cls, path=None, code=True, data=True, **kwargs):
        from ...install import pip_install

        ok = True
        if code:
            ok = pip_install("clipy-like") or pip_install("clik")
        return ok


def get_data_path(packages_path: str) -> str:
    return os.path.join(packages_path, "data", "planck_2018")


def load_clipy(packages_path=None, logger=None):
    """Import clipy (pure-python clik) or the compiled clik bindings."""
    for module in ("clipy", "clik"):
        try:
            return load_external_module(module)
        except ComponentNotInstalledError:
            continue
    raise ComponentNotInstalledError(
        logger,
        "Neither 'clipy' nor 'clik' is installed; install the Planck "
        "likelihood code (cobaya-tpu install <input with planck likes>).",
    )
