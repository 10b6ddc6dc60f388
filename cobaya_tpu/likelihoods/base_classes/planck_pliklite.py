"""Planck plik-lite: python-native nuisance-marginalized high-l likelihood.

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/planck_pliklite.py: reads the
released plik-lite bandpower data (``data``, ``blmin``, ``blmax``,
``weights``, covariance) described by a ``.dataset`` ini, selects the used
spectra/bins, and evaluates a Gaussian bandpower likelihood with the
``A_planck`` calibration parameter.

TPU-native twist: the per-bin window sums are assembled once into a dense
binning matrix, so the theory projection is a single matrix product, and the
whole likelihood is jittable (``logp_jax``): with the theory Cls exported to
the device by the Boltzmann provider's callback bridge, the binning matmul
and the covariance quadratic form run on the MXU inside the sampler's jitted
epoch, batched over all walkers — nuisance (calibration) moves never touch
the host.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile

CL_NAMES = ["tt", "te", "ee"]


class PlanckPlikLite(DataSetLikelihood):
    type = "CMB"
    bibtex_file = "planck2018.bibtex"
    jittable = True  # bandpower math runs on device (see logp_jax)

    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "plik_lite_2018_AL.zip",
        "directory": "planck_2018_pliklite_native",
    }

    use_cl: Optional[list] = None
    calibration_param: Optional[str] = None

    def init_params(self, ini: IniFile):
        self.use_cl = [c.lower() for c in
                       (self.use_cl or ini.split("use_cl"))]
        if not self.use_cl:
            raise LoggedError(self.log, "No spectra selected in use_cl.")
        nbins_per = [ini.int("nbintt"), ini.int("nbinte"), ini.int("nbinee")]
        self.lmax = ini.int("lmax")
        self.calibration_param = (
            self.calibration_param
            or ini.string("calibration_param", "A_planck")
        )
        data = np.loadtxt(ini.relativeFileName("data"))
        offset0 = ini.int("bin_lmin_offset")
        blmin = np.loadtxt(ini.relativeFileName("blmin")).astype(int) + offset0
        blmax = np.loadtxt(ini.relativeFileName("blmax")).astype(int) + offset0
        weights = np.loadtxt(ini.relativeFileName("weights"))
        ls = np.arange(len(weights)) + offset0
        # data are D_l-like; windows act on D_l = l(l+1) C_l / 2pi
        weights = weights * 2 * np.pi / ls / (ls + 1)
        weights = np.concatenate([np.zeros(offset0), weights])
        nbins_total = sum(nbins_per)
        cov_bin = ini.relativeFileName("cov_file_binary", "")
        if cov_bin and os.path.exists(cov_bin):
            from scipy.io import FortranFile

            f = FortranFile(cov_bin, "r")
            cov = f.read_reals(dtype=float).reshape(
                (nbins_total, nbins_total)
            )
            cov = np.tril(cov) + np.tril(cov, -1).T
        else:
            cov = np.loadtxt(ini.relativeFileName("cov_file"))
        lav = (blmin + blmax) // 2
        # select used spectra & build one dense binning matrix over
        # concatenated (tt, te, ee) theory D_l vectors
        used_rows = []
        bin_matrix_blocks = []
        offset = 0
        self.bandpowers = {}
        for i, (cl, nbin) in enumerate(zip(CL_NAMES, nbins_per)):
            sc = lav[:nbin] * (lav[:nbin] + 1) / (2 * np.pi)
            self.bandpowers[cl] = data[offset:offset + nbin, 1] * sc
            if cl in self.use_cl:
                rows = np.arange(offset, offset + nbin)
                used_rows.append(rows)
                block = np.zeros((nbin, self.lmax + 1))
                for b in range(nbin):
                    sl = slice(blmin[b], blmax[b] + 1)
                    block[b, sl] = weights[sl]
                bin_matrix_blocks.append(block)
            offset += nbin
        self.used_indices = np.concatenate(used_rows)
        self.X_data = data[self.used_indices, 1]
        self.cov = cov[np.ix_(self.used_indices, self.used_indices)]
        self.invcov = np.linalg.inv(self.cov)
        self._bin_blocks = bin_matrix_blocks

    def get_requirements(self):
        return {"Cl": {cl: self.lmax for cl in self.use_cl}}

    def get_can_support_params(self):
        return [self.calibration_param]

    def get_chi_squared(self, cls_dict, calib: float = 1.0) -> float:
        binned = []
        for cl, block in zip(self.use_cl, self._bin_blocks):
            vec = np.asarray(cls_dict[cl])[: self.lmax + 1]
            if len(vec) < self.lmax + 1:
                raise LoggedError(
                    self.log, "Theory '%s' Cls do not reach lmax=%d",
                    cl, self.lmax,
                )
            binned.append(block @ vec)
        theory = np.concatenate(binned) / calib**2
        delta = self.X_data - theory
        return float(delta @ self.invcov @ delta)

    def logp(self, _derived=None, **params_values):
        cls = self.provider.get_Cl(ell_factor=True)
        calib = params_values.get(self.calibration_param, 1.0)
        return -0.5 * self.get_chi_squared(cls, calib)

    def logp_jax(self, params, provider_products=None):
        """Traced bandpower likelihood (device path).

        Matches the numpy :meth:`logp` (reference planck_pliklite.py:178);
        tested for agreement in tests/test_traced_likelihoods.py.
        """
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True
        )
        calib = jnp.asarray(params.get(self.calibration_param, 1.0))
        binned = [
            self.hoist(f"bin_block_{cl}", block)
            @ jnp.asarray(cls[cl])[: self.lmax + 1]
            for cl, block in zip(self.use_cl, self._bin_blocks)
        ]
        theory = jnp.concatenate(binned) / calib ** 2
        delta = self.hoist("X_data", self.X_data) - theory
        return -0.5 * delta @ self.hoist("invcov", self.invcov) @ delta, {}
