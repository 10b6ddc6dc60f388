"""Type-Ia supernova (Hubble-diagram) likelihood.

Capability parity with /root/reference/cobaya/likelihoods/base_classes/sn.py
(Pantheon-style): apparent-magnitude data vs theory distance modulus, full
covariance, analytic marginalization over the absolute magnitude M (or a
sampled ``Mb`` when ``use_abs_mag``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ...utils.log import LoggedError
from .installable import InstallableLikelihood


class SN(InstallableLikelihood):
    type = "SN"
    jittable = False

    install_options = {
        "github_repository": "CobayaSampler/sn_data",
        "github_release": "v1.6",
        "directory": "sn_data",
    }

    data_file: Optional[str] = None
    covmat_file: Optional[str] = None
    use_abs_mag: bool = False
    marginalize_M: bool = True
    # inline data alternative: rows of (zcmb, mag, dmag)
    data: Optional[Sequence] = None

    def initialize(self):
        if self.data is not None:
            rows = np.asarray(self.data, dtype=float)
        else:
            if not self.data_file:
                raise LoggedError(self.log, "Need 'data_file' or 'data'.")
            rows = np.loadtxt(self._resolve(self.data_file), ndmin=2)
        self.zcmb = rows[:, 0]
        self.mag = rows[:, 1]
        dmag = rows[:, 2] if rows.shape[1] > 2 else np.zeros(len(rows))
        n = len(self.zcmb)
        cov = np.diag(dmag**2)
        if self.covmat_file:
            cov = cov + _read_sn_cov(self._resolve(self.covmat_file), n)
        elif not np.any(dmag):
            raise LoggedError(self.log, "Need per-SN errors or a covmat.")
        self.invcov = np.linalg.inv(cov)

    def _resolve(self, name: str) -> str:
        if os.path.isabs(name):
            return name
        base = self.path or (
            self.get_path(self.packages_path) if self.packages_path
            and self.get_install_options() else self.get_class_path()
        )
        return os.path.join(base, name)

    def get_requirements(self):
        reqs = {"angular_diameter_distance": {"z": np.unique(self.zcmb)}}
        if self.use_abs_mag:
            reqs["Mb"] = None
        return reqs

    def logp(self, _derived=None, **params_values):
        DA = np.asarray(
            self.provider.get_angular_diameter_distance(self.zcmb)
        )
        DL = DA * (1 + self.zcmb) ** 2  # Mpc
        mu_theory = 5 * np.log10(np.maximum(DL, 1e-30)) + 25
        if self.use_abs_mag:
            Mb = params_values.get("Mb")
            if Mb is None:
                Mb = self.provider.get_param("Mb")
            delta = self.mag - (mu_theory + Mb)
            return float(-0.5 * delta @ self.invcov @ delta)
        delta = self.mag - mu_theory
        if not self.marginalize_M:
            return float(-0.5 * delta @ self.invcov @ delta)
        # analytic marginalization over a flat prior on M:
        # chi2_marg = A - B^2/C + ln(C/2pi)
        invcov_d = self.invcov @ delta
        A = delta @ invcov_d
        B = invcov_d.sum()
        C = self.invcov.sum()
        return float(-0.5 * (A - B**2 / C + np.log(C / (2 * np.pi))))


def _read_sn_cov(path: str, n: int) -> np.ndarray:
    """Pantheon covmat format: first line = N, then N*N values."""
    values = np.loadtxt(path)
    if values.size == n * n + 1:
        values = values[1:]
    return values.reshape(n, n)
