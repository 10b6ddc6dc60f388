"""Generic BAO / growth-rate likelihood.

Capability parity with /root/reference/cobaya/likelihoods/base_classes/bao.py:
measurements file with rows ``z value quantity``, optional covariance (or
rms errors), quantities computed from the Boltzmann provider
(``DV_over_rs``, ``rs_over_DV``, ``DM_over_rs``, ``DA_over_rs``,
``Hz_rs``, ``f_sigma8``, ``F_AP``...), Gaussian chi-squared.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

from ...utils.conventions import Const
from ...utils.log import LoggedError
from .installable import InstallableLikelihood


class BAO(InstallableLikelihood):
    type = "BAO"
    jittable = False

    install_options = {
        "github_repository": "CobayaSampler/bao_data",
        "github_release": "v1.4",
        "directory": "bao_data",
    }

    measurements_file: Optional[str] = None
    cov_file: Optional[str] = None
    invcov_file: Optional[str] = None
    rs_fid: Optional[float] = None
    rs_rescale: Optional[float] = None
    prob_dist: Optional[str] = None
    observable_1: Optional[str] = None
    observable_2: Optional[str] = None
    observable_3: Optional[str] = None
    grid_file: Optional[str] = None
    redshift: Optional[float] = None
    measurements: Optional[Sequence] = None  # inline alternative to file

    def initialize(self):
        if self.measurements is not None:
            rows = [
                (float(m[0]), float(m[1]), str(m[2]))
                for m in self.measurements
            ]
        else:
            if not self.measurements_file:
                raise LoggedError(
                    self.log, "Need 'measurements_file' or 'measurements'."
                )
            path = self._resolve(self.measurements_file)
            rows = []
            with open(path, encoding="utf-8") as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if not line:
                        continue
                    z, v, q = line.split()[:3]
                    rows.append((float(z), float(v), q))
        self.z = np.array([r[0] for r in rows])
        self.data = np.array([r[1] for r in rows])
        self.quantities = [r[2] for r in rows]
        n = len(rows)
        if self.invcov_file:
            self.invcov = np.loadtxt(self._resolve(self.invcov_file))
        elif self.cov_file:
            self.invcov = np.linalg.inv(
                np.loadtxt(self._resolve(self.cov_file))
            )
        else:
            # 4th column = rms error if present
            errs = []
            if self.measurements is not None and len(
                self.measurements[0]
            ) > 3:
                errs = [float(m[3]) for m in self.measurements]
            if errs:
                self.invcov = np.diag(1 / np.asarray(errs) ** 2)
            else:
                raise LoggedError(
                    self.log, "Need a covariance, inverse covariance, or "
                    "per-point errors.",
                )
        self.invcov = np.atleast_2d(self.invcov)
        if self.invcov.shape != (n, n):
            raise LoggedError(self.log, "Covariance shape mismatch.")

    def _resolve(self, name: str) -> str:
        if os.path.isabs(name):
            return name
        base = self.path or (
            self.get_path(self.packages_path) if self.packages_path
            and self.get_install_options() else self.get_class_path()
        )
        return os.path.join(base, name)

    def get_requirements(self):
        zs = np.unique(self.z)
        reqs: dict[str, Any] = {"rdrag": None}
        quantities = set(self.quantities)
        if quantities & {"DV_over_rs", "rs_over_DV", "DA_over_rs",
                         "DM_over_rs", "F_AP"}:
            reqs["angular_diameter_distance"] = {"z": zs}
        if quantities & {"DV_over_rs", "rs_over_DV", "Hz_rs", "F_AP",
                         "bao_Hz_rs"}:
            reqs["Hubble"] = {"z": zs}
        if quantities & {"f_sigma8", "fsigma8"}:
            reqs["fsigma8"] = {"z": zs}
        return reqs

    def theory_value(self, quantity: str, z: float) -> float:
        provider = self.provider
        rs = float(provider.get_param("rdrag")) * (self.rs_rescale or 1.0)
        c = Const.c_km_s

        def DA(zz):
            return float(provider.get_angular_diameter_distance(zz)[0])

        def Hz(zz):
            return float(provider.get_Hubble(zz)[0])

        # rs_fid: data stored rescaled to a fiducial sound horizon
        rs_fid = self.rs_fid or 0.0
        if quantity in ("f_sigma8", "fsigma8"):
            return float(provider.get_fsigma8(z)[0])
        if quantity == "Hz_rs":
            return Hz(z) * rs / (rs_fid or 1.0)
        if quantity == "DA_over_rs":
            return DA(z) / rs * (rs_fid or 1.0)
        if quantity == "DM_over_rs":
            return DA(z) * (1 + z) / rs * (rs_fid or 1.0)
        if quantity in ("DV_over_rs", "rs_over_DV"):
            DM = DA(z) * (1 + z)
            DH = c / Hz(z)
            DV = (DM**2 * z * DH) ** (1 / 3)
            return DV / rs if quantity == "DV_over_rs" else rs / DV
        if quantity == "F_AP":
            return DA(z) * (1 + z) * Hz(z) / c
        raise LoggedError(self.log, "Unknown BAO quantity '%s'", quantity)

    def logp(self, _derived=None, **params_values):
        theory = np.array([
            self.theory_value(q, z) for q, z in zip(self.quantities, self.z)
        ])
        delta = theory - self.data
        return float(-0.5 * delta @ self.invcov @ delta)
