"""Planck 2018 low-l SimAll EE likelihood (python-native probability table).

Capability parity with /root/reference/cobaya/likelihoods/planck_2018_lowl/EE.py.
Requires the planck_2018_lowE_native data package.

TPU-native: the per-multipole probability table is a device constant and
the lookup is a pure gather (``logp_jax``), so low-EE runs inside the
jitted sampler epoch, batched over walkers.
"""

from __future__ import annotations

import os

import numpy as np

from ..base_classes.installable import InstallableLikelihood


class EE(InstallableLikelihood):
    bibtex_file = "../base_classes/planck2018.bibtex"
    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "planck_2018_lowE.zip",
        "directory": "planck_2018_lowE_native",
    }
    type = "CMB"
    jittable = True  # pure table gather on device (logp_jax)
    aliases = ["lowE"]

    _lmin = 2
    _lmax = 29
    _stepEE = 0.0001
    _table_file_name = "prob_table.txt"

    def initialize(self):
        path = self.path or (
            self.get_path(self.packages_path) if self.packages_path else None
        )
        if not path:
            from ...models.component import ComponentNotInstalledError

            raise ComponentNotInstalledError(
                self.log, "Need the planck_2018_lowE_native data (install "
                "with cobaya-tpu install, or set 'path').",
            )
        self.prob_table = np.loadtxt(
            os.path.join(path, self._table_file_name)
        )

    def get_requirements(self):
        return {"Cl": {"ee": self._lmax}}

    def get_can_support_params(self):
        return ["A_planck"]

    def log_likelihood(self, cls_EE, calib: float = 1.0) -> float:
        """Table lookup of the per-multipole EE probability."""
        idx = (
            np.asarray(cls_EE[self._lmin:self._lmax + 1])
            / (calib**2 * self._stepEE)
        ).astype(int)
        if np.any(idx < 0) or np.any(idx >= self.prob_table.shape[0]):
            self.log.debug("low-EE multipole out of table range; rejecting.")
            return -np.inf
        cols = np.arange(self.prob_table.shape[1])
        return float(self.prob_table[idx, cols].sum())

    def logp(self, _derived=None, **params_values):
        cls = self.provider.get_Cl(ell_factor=True)["ee"]
        return self.log_likelihood(cls, params_values.get("A_planck", 1))

    def logp_jax(self, params, provider_products=None):
        """Traced table lookup (device path); mirrors :meth:`logp`."""
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True
        )["ee"]
        calib = jnp.asarray(params.get("A_planck", 1.0))
        theory = cls[self._lmin:self._lmax + 1] / (
            calib ** 2 * self._stepEE)
        idx = theory.astype(jnp.int32)  # truncation, as the eager path
        table = self.hoist("prob_table", self.prob_table)
        inside = (idx >= 0) & (idx < table.shape[0])
        cols = np.arange(table.shape[1])
        vals = table[jnp.clip(idx, 0, table.shape[0] - 1), cols]
        logl = jnp.where(jnp.all(inside), jnp.sum(vals), -jnp.inf)
        return logl, {}
