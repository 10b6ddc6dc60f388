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
    # the Gibbs cl->x splines become stacked per-ell cubic coefficient
    # tables evaluated by gathers (logp_jax), so low-TT runs on device
    jittable = True
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
        # stacked per-ell cubic coefficients for the traced path: the same
        # interpolating cubic (CubicSpline not-a-knot == k=3 interpolating
        # UnivariateSpline on the shared knot layout)
        from scipy.interpolate import CubicSpline

        self._knots = spline_cl.T.copy()  # (n_ell, K)
        coeffs = []
        for i in range(n):
            cs = CubicSpline(spline_cl[:, i], spline_val[:, i])
            coeffs.append(cs.c)  # (4, K-1)
        self._coeffs = np.stack(coeffs)  # (n_ell, 4, K-1)
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

    def logp_jax(self, params, provider_products=None):
        """Traced Gaussianized-Gibbs likelihood; mirrors
        :meth:`log_likelihood` via stacked per-ell cubic gathers."""
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True
        )["tt"]
        calib = jnp.asarray(params.get("A_planck", 1.0))
        theory = cls[self.lmin:self.lmax + 1] / calib ** 2  # (n_ell,)
        knots = self.hoist("knots", self._knots)      # (n_ell, K)
        coeffs = self.hoist("coeffs", self._coeffs)    # (n_ell, 4, K-1)
        K = knots.shape[1]
        # per-row segment search (vectorized over ells)
        idx = jnp.clip(
            jax_vmap_searchsorted(knots, theory) - 1, 0, K - 2)
        t = theory - jnp.take_along_axis(knots, idx[:, None],
                                         axis=1)[:, 0]
        c = jnp.take_along_axis(coeffs, idx[:, None, None],
                                axis=2)[:, :, 0]  # (n_ell, 4)
        x = ((c[:, 0] * t + c[:, 1]) * t + c[:, 2]) * t + c[:, 3]
        dxdCl = (3 * c[:, 0] * t + 2 * c[:, 1]) * t + c[:, 2]
        bounds = self.hoist("prior_bounds", self._prior_bounds)
        inside = jnp.all((theory >= bounds[:, 0])
                         & (theory <= bounds[:, 1])) & jnp.all(dxdCl > 0)
        delta = x - self.hoist("mu", self._mu)
        logl = (jnp.sum(jnp.log(jnp.maximum(dxdCl, 1e-300)))
                - 0.5 * delta @ self.hoist("covinv", self._covinv) @ delta
                - self._offset)
        return jnp.where(inside, logl, -jnp.inf), {}


def jax_vmap_searchsorted(rows, queries):
    """Per-row searchsorted(side='right'): rows (n, K), queries (n,)."""
    import jax
    import jax.numpy as jnp

    return jax.vmap(
        lambda r, q: jnp.searchsorted(r, q, side="right")
    )(rows, queries)
