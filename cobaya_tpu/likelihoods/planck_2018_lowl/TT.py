"""Planck 2018 low-l Gibbs TT likelihood (python-native Gaussianized form).

Capability parity with /root/reference/cobaya/likelihoods/planck_2018_lowl/TT.py:
per-multipole splines map C_l to Gaussianized variables x(C_l); the
likelihood is Gaussian in x with the stored mean/covariance plus the
Jacobian term, normalized by an offset at the fiducial spectrum.
Requires the planck_2018_lowT_native data package.
"""

from __future__ import annotations

import os

import numpy as np

from ...utils.log import LoggedError
from ..base_classes.installable import InstallableLikelihood


class TT(InstallableLikelihood):
    bibtex_file = "../base_classes/planck2018.bibtex"
    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "planck_2018_lowT.zip",
        "directory": "planck_2018_lowT_native",
    }
    type = "CMB"
    jittable = False
    aliases = ["lowT"]

    lmin: int = 2
    lmax: int = 29

    def initialize(self):
        from scipy.interpolate import InterpolatedUnivariateSpline

        if self.lmin < 2 or self.lmax > 200 or self.lmin >= self.lmax:
            raise LoggedError(self.log, "Need 2 <= lmin < lmax <= 200.")
        path = self.path or (
            self.get_path(self.packages_path) if self.packages_path else None
        )
        if not path:
            from ...models.component import ComponentNotInstalledError

            raise ComponentNotInstalledError(
                self.log, "Need the planck_2018_lowT_native data (install "
                "with cobaya-tpu install, or set 'path').",
            )
        sl = slice(self.lmin - 2, self.lmax + 1 - 2)
        cov = np.loadtxt(os.path.join(path, "cov.txt"))[sl, sl]
        self._covinv = np.linalg.inv(cov)
        self._mu = np.loadtxt(os.path.join(path, "mu.txt"))[sl]
        mu_sigma_full = np.zeros(self.lmax + 1)
        mu_sigma_full[self.lmin:] = np.loadtxt(
            os.path.join(path, "mu_sigma.txt")
        )[sl]
        spline_cl = np.loadtxt(os.path.join(path, "cl2x_1.txt"))[:, sl]
        spline_val = np.loadtxt(os.path.join(path, "cl2x_2.txt"))[:, sl]
        nbins = spline_cl.shape[0]
        self._splines, self._dsplines = [], []
        n = self.lmax - self.lmin + 1
        self._prior_bounds = np.zeros((n, 2))
        for i in range(n):
            # usable range: where the Gaussianized value saturates at +-5
            j = 0
            while abs(spline_val[j, i] + 5) < 1e-4:
                j += 1
            self._prior_bounds[i, 0] = spline_cl[j + 2, i]
            j = nbins - 1
            while abs(spline_val[j, i] - 5) < 1e-4:
                j -= 1
            self._prior_bounds[i, 1] = spline_cl[j - 2, i]
            s = InterpolatedUnivariateSpline(spline_cl[:, i],
                                             spline_val[:, i])
            self._splines.append(s)
            self._dsplines.append(s.derivative())
        self._offset = 0.0
        self._offset = self.log_likelihood(mu_sigma_full)

    def get_requirements(self):
        return {"Cl": {"tt": self.lmax}}

    def get_can_support_params(self):
        return ["A_planck"]

    def log_likelihood(self, cls_TT, calib: float = 1.0) -> float:
        theory = np.asarray(cls_TT[self.lmin:self.lmax + 1]) / calib**2
        if np.any(theory < self._prior_bounds[:, 0]) or np.any(
            theory > self._prior_bounds[:, 1]
        ):
            return -np.inf
        x = np.empty_like(theory)
        logl = 0.0
        for i, cl in enumerate(theory):
            dxdCl = float(self._dsplines[i](cl))
            if dxdCl < 0:
                return -np.inf
            logl += np.log(dxdCl)
            x[i] = self._splines[i](cl)
        delta = x - self._mu
        logl += float(-0.5 * delta @ self._covinv @ delta)
        return logl - self._offset

    def logp(self, _derived=None, **params_values):
        cls = self.provider.get_Cl(ell_factor=True)["tt"]
        return self.log_likelihood(cls, params_values.get("A_planck", 1))
