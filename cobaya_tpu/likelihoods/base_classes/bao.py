"""Generic BAO / growth-rate likelihood.

Capability parity with /root/reference/cobaya/likelihoods/base_classes/bao.py:
measurements file with rows ``z value [err] quantity`` (or inline ``data`` /
``measurements``), covariance / inverse covariance / per-point errors,
non-Gaussian 1-D probability distributions (``prob_dist`` chi2 tables, e.g.
SDSS DR7 MGS), 1/2/3-D likelihood grids (``grid_file`` +
``observable_1/2/3``, e.g. the SDSS DR16 BAO+FS products), and the
observable vocabulary ``DV_over_rs``, ``rs_over_DV``, ``DM_over_rs``,
``DA_over_rs``, ``DH_over_rs``, ``Hz_rs``, ``f_sigma8``, ``F_AP`` computed
from the Boltzmann provider.  Sound-horizon rescaling follows the reference:
``rs() = rdrag * rs_rescale`` with ``rs_rescale = 1/rs_fid`` by default.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np

from ...utils.conventions import Const
from ...utils.log import LoggedError
from .installable import InstallableLikelihood

_GAUSSIAN_OBS = ("DV_over_rs", "rs_over_DV", "DA_over_rs", "DM_over_rs",
                 "DH_over_rs", "Hz_rs", "f_sigma8", "F_AP")


class BAO(InstallableLikelihood):
    type = "BAO"
    # All observable math and tabulated-likelihood lookups are traced
    # (logp_jax): Gaussian quadratic forms, chi2(alpha) spline tables and
    # 1/2/3-D likelihood grids evaluate on device inside the jitted epoch.
    jittable = True

    install_options = {
        "github_repository": "CobayaSampler/bao_data",
        "github_release": "v2.6",
        "directory": "bao_data",
    }

    measurements_file: Optional[str] = None
    cov_file: Optional[str] = None
    invcov_file: Optional[str] = None
    rs_fid: Optional[float] = None
    rs_rescale: Optional[float] = None
    prob_dist: Optional[str] = None
    prob_dist_bounds: Optional[Sequence[float]] = None
    observable_1: Optional[str] = None
    observable_2: Optional[str] = None
    observable_3: Optional[str] = None
    grid_file: Optional[str] = None
    redshift: Optional[float] = None
    data: Optional[Sequence] = None  # inline row(s): z value [err] quantity
    measurements: Optional[Sequence] = None  # alias of `data`

    def initialize(self):
        # sound-horizon rescale (reference bao.py:130)
        if self.rs_rescale is None:
            self.rs_rescale = 1.0 / self.rs_fid if self.rs_fid else 1.0
        self._grid_dims = 0
        self._prob_logpdf = None
        if self.grid_file:
            self._init_grid()
            return
        rows = self._load_rows()
        self.z = np.array([r[0] for r in rows])
        self.data_values = np.array([r[1] for r in rows])
        self.quantities = [r[-1] for r in rows]
        if self.prob_dist:
            self._init_prob_dist()
            return
        self._init_gaussian(rows)

    # ---- data loading ---------------------------------------------------------
    def _load_rows(self) -> list[tuple]:
        inline = self.measurements if self.measurements is not None \
            else self.data
        if inline is not None:
            if not hasattr(inline[0], "__len__") or isinstance(
                inline[0], str
            ):
                inline = [inline]
            return [tuple(m) for m in inline]
        if not self.measurements_file:
            raise LoggedError(
                self.log,
                "Need 'measurements_file', 'data', or 'measurements'.",
            )
        path = self._resolve(self.measurements_file)
        rows = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.split("#")[0].strip()
                if not line:
                    continue
                parts = line.split()
                if len(parts) >= 4:
                    rows.append((float(parts[0]), float(parts[1]),
                                 float(parts[2]), _strip_prefix(parts[3])))
                else:
                    rows.append((float(parts[0]), float(parts[1]),
                                 _strip_prefix(parts[2])))
        return rows

    def _init_gaussian(self, rows):
        n = len(rows)
        if self.invcov_file:
            cov = np.linalg.inv(
                np.atleast_2d(np.loadtxt(self._resolve(self.invcov_file)))
            )
        elif self.cov_file:
            cov = np.atleast_2d(np.loadtxt(self._resolve(self.cov_file)))
        else:
            errs = [float(r[2]) for r in rows if len(r) > 3]
            if len(errs) != n:
                raise LoggedError(
                    self.log, "Need a covariance, inverse covariance, or "
                    "per-point errors.",
                )
            cov = np.diag(np.asarray(errs) ** 2)
        if cov.shape != (n, n):
            raise LoggedError(self.log, "Covariance shape mismatch.")
        self.invcov = np.linalg.inv(cov)

    def _init_prob_dist(self):
        """Tabulated chi2(alpha) -> cubic-spline logpdf (reference
        bao.py:179; used by SDSS DR7 MGS)."""
        from scipy.interpolate import UnivariateSpline

        chi2 = np.loadtxt(self._resolve(self.prob_dist))
        if not self.prob_dist_bounds or len(self.prob_dist_bounds) != 2:
            raise LoggedError(
                self.log, "'prob_dist' requires 'prob_dist_bounds': "
                "[min, max].",
            )
        lo, hi = map(float, self.prob_dist_bounds)
        alpha = np.linspace(lo, hi, len(chi2))
        spline = UnivariateSpline(alpha, -chi2 / 2, s=0, ext=2)
        self._prob_logpdf = lambda x: (
            float(spline(x)) if lo <= x <= hi else -np.inf
        )
        from ...ops.interp import TracedSpline1D

        self._prob_logpdf_jax = TracedSpline1D(alpha, -chi2 / 2)

    def _init_grid(self):
        """1/2/3-D tabulated likelihood grids (reference bao.py:205)."""
        grid = np.loadtxt(self._resolve(self.grid_file))
        if self.redshift is None:
            raise LoggedError(
                self.log, "'grid_file' requires 'redshift'.",
            )
        obs = [self.observable_1, self.observable_2, self.observable_3]
        ncols = grid.shape[1]
        self._grid_dims = ncols - 1
        if not all(obs[:self._grid_dims]):
            raise LoggedError(
                self.log, "'grid_file' with %d columns requires "
                "observable_1..%d.", ncols, self._grid_dims,
            )
        self.quantities = [o for o in obs[:self._grid_dims]]
        self.z = np.full(self._grid_dims, float(self.redshift))
        from ...ops.interp import (
            TracedLinearGridInterp,
            TracedSpline1D,
            densify_spline_2d,
        )

        if self._grid_dims == 1:
            from scipy.interpolate import UnivariateSpline

            self._grid_interp = UnivariateSpline(
                grid[:, 0], np.log(grid[:, 1]), s=0, ext=2,
            )
            self._grid_interp_jax = TracedSpline1D(
                grid[:, 0], np.log(grid[:, 1])
            )
        elif self._grid_dims == 2:
            from scipy.interpolate import RectBivariateSpline

            x = np.unique(grid[:, 0])
            y = np.unique(grid[:, 1])
            logp = np.log(grid[:, 2]).reshape(len(x), len(y))
            self._grid_interp = RectBivariateSpline(x, y, logp, kx=3, ky=3)
            xs, ys, table = densify_spline_2d(self._grid_interp, x, y)
            self._grid_interp_jax = TracedLinearGridInterp(
                (xs, ys), table
            )
        elif self._grid_dims == 3:
            from scipy.interpolate import RegularGridInterpolator

            x = np.unique(grid[:, 0])
            y = np.unique(grid[:, 1])
            zz = np.unique(grid[:, 2])
            logp = np.log(grid[:, 3] + 1e-300).reshape(
                len(x), len(y), len(zz)
            )
            self._grid_interp = RegularGridInterpolator(
                (x, y, zz), logp, bounds_error=False,
                fill_value=np.log(1e-300),
            )
            self._grid_interp_jax = TracedLinearGridInterp(
                (x, y, zz), logp, fill_value=np.log(1e-300)
            )
        else:
            raise LoggedError(self.log, "Grid data has wrong dimensions.")

    def _resolve(self, name: str) -> str:
        if os.path.isabs(name):
            return name
        base = self.path or (
            self.get_path(self.packages_path) if self.packages_path
            and self.get_install_options() else self.get_class_path()
        )
        return os.path.join(base, name)

    # ---- theory ---------------------------------------------------------------
    def get_requirements(self):
        zs = np.unique(self.z)
        reqs: dict[str, Any] = {}
        quantities = set(self.quantities)
        if quantities & {"DV_over_rs", "rs_over_DV", "DA_over_rs",
                         "DM_over_rs", "Hz_rs", "DH_over_rs"}:
            reqs["rdrag"] = None
        if quantities & {"DV_over_rs", "rs_over_DV", "DA_over_rs",
                         "DM_over_rs", "F_AP"}:
            reqs["angular_diameter_distance"] = {"z": zs}
        if quantities & {"DV_over_rs", "rs_over_DV", "Hz_rs", "DH_over_rs",
                         "F_AP"}:
            reqs["Hubble"] = {"z": zs}
        if quantities & {"f_sigma8", "fsigma8"}:
            reqs["fsigma8"] = {"z": zs}
        return reqs

    def rs(self) -> float:
        return float(self.provider.get_param("rdrag")) * self.rs_rescale

    def theory_value(self, quantity: str, z: float) -> float:
        provider = self.provider
        c = Const.c_km_s

        def DA(zz):
            return float(np.atleast_1d(
                provider.get_angular_diameter_distance(zz))[0])

        def Hz(zz):
            return float(np.atleast_1d(provider.get_Hubble(zz))[0])

        if quantity in ("f_sigma8", "fsigma8"):
            return float(np.atleast_1d(provider.get_fsigma8(z))[0])
        if quantity == "Hz_rs":
            return Hz(z) * self.rs()
        if quantity == "DA_over_rs":
            return DA(z) / self.rs()
        if quantity == "DM_over_rs":
            return DA(z) * (1 + z) / self.rs()
        if quantity == "DH_over_rs":
            return c / Hz(z) / self.rs()
        if quantity in ("DV_over_rs", "rs_over_DV"):
            DM = DA(z) * (1 + z)
            DH = c / Hz(z)
            DV = (DM**2 * z * DH) ** (1 / 3)
            return DV / self.rs() if quantity == "DV_over_rs" \
                else self.rs() / DV
        if quantity == "F_AP":
            return DA(z) * (1 + z) * Hz(z) / c
        raise LoggedError(
            self.log, "Unknown BAO quantity '%s'. Implemented: %s",
            quantity, _GAUSSIAN_OBS,
        )

    # ---- traced (device) path --------------------------------------------------
    def _theory_values_jax(self, provider_products, quantities, zs):
        """Traced observable vector (mirrors :meth:`theory_value`)."""
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        pp = TracedCosmoProducts(self, provider_products)
        c = Const.c_km_s
        quantities = list(quantities)
        need_rs = any(q in ("DV_over_rs", "rs_over_DV", "DA_over_rs",
                            "DM_over_rs", "Hz_rs", "DH_over_rs")
                      for q in quantities)
        rs = pp.get_param("rdrag") * self.rs_rescale if need_rs else None
        out = []
        for q, z in zip(quantities, np.atleast_1d(zs)):
            z = float(z)
            if q in ("f_sigma8", "fsigma8"):
                out.append(pp.get_fsigma8(z)[0])
                continue
            if q == "Hz_rs":
                out.append(pp.get_Hubble(z)[0] * rs)
                continue
            DA = pp.get_angular_diameter_distance(z)[0] \
                if q in ("DV_over_rs", "rs_over_DV", "DA_over_rs",
                         "DM_over_rs", "F_AP") else None
            Hz = pp.get_Hubble(z)[0] \
                if q in ("DV_over_rs", "rs_over_DV", "Hz_rs", "DH_over_rs",
                         "F_AP") else None
            if q == "DA_over_rs":
                out.append(DA / rs)
            elif q == "DM_over_rs":
                out.append(DA * (1 + z) / rs)
            elif q == "DH_over_rs":
                out.append(c / Hz / rs)
            elif q in ("DV_over_rs", "rs_over_DV"):
                DM = DA * (1 + z)
                DV = (DM ** 2 * z * c / Hz) ** (1 / 3)
                out.append(DV / rs if q == "DV_over_rs" else rs / DV)
            elif q == "F_AP":
                out.append(DA * (1 + z) * Hz / c)
            else:
                raise LoggedError(
                    self.log, "Unknown BAO quantity '%s'. Implemented: %s",
                    q, _GAUSSIAN_OBS,
                )
        return jnp.stack(out)

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp

        if self._grid_dims:
            vals = self._theory_values_jax(
                provider_products, self.quantities, self.z
            )
            if self._grid_dims == 1:
                return self._grid_interp_jax(vals[0]), {}
            return self._grid_interp_jax(*[
                vals[i] for i in range(self._grid_dims)
            ]), {}
        theory = self._theory_values_jax(
            provider_products, self.quantities, self.z
        )
        if self._prob_logpdf is not None:
            return self._prob_logpdf_jax(theory[0]), {}
        delta = theory - self.hoist("data_values", self.data_values)
        return -0.5 * delta @ self.hoist("invcov", self.invcov) @ delta, {}

    def logp(self, _derived=None, **params_values):
        if self._grid_dims:
            vals = [self.theory_value(q, float(self.redshift))
                    for q in self.quantities]
            if self._grid_dims == 1:
                try:
                    return float(self._grid_interp(vals[0]))
                except ValueError:  # outside tabulated range
                    return -np.inf
            if self._grid_dims == 2:
                try:
                    return float(self._grid_interp(vals[0], vals[1])[0][0])
                except ValueError:
                    return -np.inf
            return float(self._grid_interp(np.asarray(vals))[0])
        theory = np.array([
            self.theory_value(q, z) for q, z in zip(self.quantities, self.z)
        ])
        if self._prob_logpdf is not None:
            return self._prob_logpdf(float(theory[0]))
        delta = theory - self.data_values
        return float(-0.5 * delta @ self.invcov @ delta)


def _strip_prefix(name: str) -> str:
    return name[4:] if name.startswith("bao_") else name
