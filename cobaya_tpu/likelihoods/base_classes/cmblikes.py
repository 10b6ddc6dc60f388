"""CMB bandpower likelihood base (CosmoMC "CMBlikes" format).

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/cmblikes.py (core): reads a
``.dataset`` ini describing measured bandpowers over CMB spectra
(``map_names`` x ``use_cl``), per-bin window functions applied to theory
C_l's, a bandpower covariance, optional calibration parameter, and a
Gaussian bandpower likelihood.  The full Hamimeche-Lewis matrix transform of
the reference (used by e.g. BICEP-Keck) is not yet implemented; datasets
declaring it fall back to the Gaussian form with a warning (tracked for a
later round).

The binned theory -> bandpower projection is a single matrix product per
spectrum, so the whole likelihood is jittable when data are loaded
(``logp_jax`` path) and fuses into the sampler's device step.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile


class CMBlikes(DataSetLikelihood):
    type = "CMB"
    # bandpower projection + covariance form run on device (logp_jax);
    # theory Cls arrive as traced arrays via the provider's callback export
    jittable = True

    map_names: Optional[list] = None
    calibration_param: Optional[str] = None

    def init_params(self, ini: IniFile):
        self.use_cl = [s.lower() for s in ini.split(
            "use_cl", ini.string("use_cl", "tt"))]
        self.calibration_param = ini.string(
            "calibration_param", self.calibration_param or ""
        ) or None
        self.like_approx = ini.string("like_approx", "gaussian")
        self.fsky = ini.float("fsky", 1.0)
        if self.like_approx not in ("gaussian", "HL", "exact"):
            self.mpi_warning(
                "like_approx '%s' not implemented; using Gaussian.",
                self.like_approx,
            )
            self.like_approx = "gaussian"
        if self.like_approx == "HL" and len(self.use_cl) > 1:
            self.mpi_warning(
                "Cross-spectrum (matrix) HL not implemented yet; applying "
                "the scalar HL transform per spectrum."
            )
        # bandpowers: rows = bins, columns = L_min L_max value [error]
        bp_file = ini.relativeFileName("cl_hat_file")
        bp = np.loadtxt(bp_file, ndmin=2)
        self.nbins = bp.shape[0]
        self.lmin_bins = bp[:, 0].astype(int)
        self.lmax_bins = bp[:, 1].astype(int)
        n_cl = len(self.use_cl)
        if bp.shape[1] >= 2 + n_cl:
            self.bandpowers = bp[:, 2:2 + n_cl]  # (nbins, n_cl)
        else:
            raise LoggedError(
                self.log, "Bandpower file must have a value column per "
                "spectrum in use_cl.",
            )
        self.lmax = int(self.lmax_bins.max())
        # window functions: optional file with (nbins, lmax+1) weights per cl;
        # default: top-hat l(l+1)/2pi-weighted average within each bin
        win_file = ini.relativeFileName("window_file", "")
        if win_file and os.path.exists(win_file):
            w = np.loadtxt(win_file)
            self.windows = w.reshape(self.nbins, -1)
        else:
            self.windows = np.zeros((self.nbins, self.lmax + 1))
            for i, (l0, l1) in enumerate(zip(self.lmin_bins,
                                             self.lmax_bins)):
                self.windows[i, l0:l1 + 1] = 1.0 / (l1 - l0 + 1)
        # covariance of flattened (bin, cl) bandpowers
        cov_file = ini.relativeFileName("covmat_fiducial")
        cov = np.loadtxt(cov_file)
        n = self.nbins * n_cl
        self.cov = cov.reshape(n, n)
        self.invcov = np.linalg.inv(self.cov)
        # fiducial bandpowers (HL transform pivot) and noise bandpowers
        self.cl_fiducial = None
        self.cl_noise = None
        fid_file = ini.relativeFileName("cl_fiducial_file", "")
        if fid_file and os.path.exists(fid_file):
            self.cl_fiducial = np.loadtxt(fid_file, ndmin=2)[:, 2:2 + n_cl]
        noise_file = ini.relativeFileName("cl_noise_file", "")
        if noise_file and os.path.exists(noise_file):
            self.cl_noise = np.loadtxt(noise_file, ndmin=2)[:, 2:2 + n_cl]
        if self.like_approx == "HL" and self.cl_fiducial is None:
            raise LoggedError(
                self.log, "HL approximation needs a 'cl_fiducial_file'."
            )

    def get_requirements(self):
        return {"Cl": {cl: self.lmax for cl in self.use_cl}}

    def get_can_support_params(self):
        return [self.calibration_param] if self.calibration_param else []

    def get_binned_theory(self, cl_dict) -> np.ndarray:
        """Apply the bandpower windows to the theory C_l's."""
        out = np.empty((self.nbins, len(self.use_cl)))
        for j, name in enumerate(self.use_cl):
            cl = np.asarray(cl_dict[name])[: self.lmax + 1]
            if len(cl) < self.lmax + 1:
                raise LoggedError(
                    self.log, "Theory Cl '%s' does not reach lmax=%d",
                    name, self.lmax,
                )
            out[:, j] = self.windows[:, : len(cl)] @ cl
        return out

    @staticmethod
    def hl_transform_scalar(C, Chat, Cfhalf2):
        """Scalar Hamimeche-Lewis transform (reference cmblikes.py:591,
        1x1 branch): x = sign(r-1) sqrt(2 (r - ln r - 1)) * Cfid."""
        rat = Chat / C
        g = np.sign(rat - 1) * np.sqrt(
            2 * np.maximum(0, rat - np.log(np.maximum(rat, 1e-30)) - 1)
        )
        return g * Cfhalf2

    def exact_chi_sq_scalar(self, C, Chat, L):
        """Exact full-sky (rescaled by fsky) chi2 for a single spectrum."""
        rat = Chat / C
        return (2 * L + 1) * self.fsky * (
            rat - 1 - np.log(np.maximum(rat, 1e-30))
        )

    def log_likelihood(self, cl_dict, **params_values) -> float:
        theory = self.get_binned_theory(cl_dict)
        if self.calibration_param:
            cal = params_values.get(self.calibration_param, 1.0)
            theory = theory / cal**2
        if self.cl_noise is not None:
            theory = theory + self.cl_noise
        data = self.bandpowers
        if self.like_approx == "exact":
            L_eff = (self.lmin_bins + self.lmax_bins) / 2
            chisq = self.exact_chi_sq_scalar(
                theory, data, L_eff[:, None]
            ).sum()
            return float(-0.5 * chisq)
        if self.like_approx == "HL":
            fid = self.cl_fiducial + (
                self.cl_noise if self.cl_noise is not None else 0
            )
            x = self.hl_transform_scalar(theory, data, fid).reshape(-1)
            return float(-0.5 * x @ self.invcov @ x)
        delta = (theory - data).reshape(-1)
        return float(-0.5 * delta @ self.invcov @ delta)

    def logp(self, _derived=None, **params_values):
        cl = self.provider.get_Cl(ell_factor=True, units="muK2")
        return self.log_likelihood(cl, **params_values)

    def logp_jax(self, params, provider_products=None):
        """Traced bandpower likelihood (Gaussian / scalar-HL / exact)."""
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True, units="muK2"
        )
        # match the host path's windows[:, :len(cl)] slice: a window file
        # may span more ells than the theory vector provides
        ncol = min(self.windows.shape[1], self.lmax + 1)
        theory = jnp.stack([
            self.hoist("windows", self.windows)[:, :ncol]
            @ jnp.asarray(cls[name])[:ncol]
            for name in self.use_cl
        ], axis=1)  # (nbins, n_cl)
        if self.calibration_param:
            cal = jnp.asarray(params.get(self.calibration_param, 1.0))
            theory = theory / cal ** 2
        if self.cl_noise is not None:
            theory = theory + self.hoist("cl_noise", self.cl_noise)
        data = self.hoist("bandpowers", self.bandpowers)
        invcov = self.hoist("invcov", self.invcov)
        if self.like_approx == "exact":
            L_eff = (self.lmin_bins + self.lmax_bins) / 2
            rat = data / theory
            chisq = ((2 * L_eff[:, None] + 1) * self.fsky
                     * (rat - 1 - jnp.log(jnp.maximum(rat, 1e-30)))).sum()
            return -0.5 * chisq, {}
        if self.like_approx == "HL":
            fid = self.cl_fiducial + (
                self.cl_noise if self.cl_noise is not None else 0
            )
            rat = data / theory
            g = jnp.sign(rat - 1) * jnp.sqrt(
                2 * jnp.maximum(
                    0, rat - jnp.log(jnp.maximum(rat, 1e-30)) - 1
                )
            )
            x = (g * self.hoist("cl_fid_plus_noise", fid)).reshape(-1)
            return -0.5 * x @ invcov @ x, {}
        delta = (theory - data).reshape(-1)
        return -0.5 * delta @ invcov @ delta, {}
