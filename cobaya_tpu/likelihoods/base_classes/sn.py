"""Type-Ia supernova (Hubble-diagram) likelihoods.

Capability parity with /root/reference/cobaya/likelihoods/base_classes/sn.py
and the reference's sn/ variants: the JLA-style dataset reader (header
columns, light-curve parameters, covariance components), sampled or
grid-marginalized alpha/beta light-curve corrections, the profiled
script-M fit with its log-determinant normalization, two-script-M fits
(``twoscriptmfit``), heliocentric redshifts in the distance modulus, and the
Pantheon+/Union3/DES-Y5 column-format variants with Fisher-projected
absolute-magnitude marginalization.

A simpler inline mode (rows of ``(zcmb, mag, dmag)`` plus an optional
covmat file) is kept for scripted use and tests.

TPU-native: the whole Hubble-diagram math is jittable (``logp_jax``) — the
distance moduli come from the Boltzmann provider's exported
``angular_diameter_distance`` grid (static gather), and the profiled /
marginalized chi-squared is pure linear algebra over fixed-size constants,
so it fuses into the sampler's device epoch batched over walkers.  Sampled
alpha/beta (JLA) rebuilds the covariance per point with a traced Cholesky —
O(n_sn^2) memory per walker; the grid-marginalized mode instead contracts
against the precomputed inverse-covariance stack.  Only ``marginalize``
without ``precompute_covmats`` stays on the host bridge.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile

_twopi = 2 * np.pi


class SN(DataSetLikelihood):
    type = "SN"
    jittable = True  # see logp_jax; demoted per-instance where unsupported

    install_options = {
        "github_repository": "CobayaSampler/sn_data",
        "github_release": "v1.8",
        "directory": "sn_data",
    }

    use_abs_mag: bool = False
    marginalize: bool = False
    precompute_covmats: bool = True
    alpha_beta_names: Optional[Sequence[str]] = None
    alpha_name: str = "alpha_jla"
    beta_name: str = "beta_jla"
    marginalize_params: Optional[dict] = None
    # simple inline mode: rows (zcmb, mag, dmag) [+ covmat_file]
    data: Optional[Sequence] = None
    data_file: Optional[str] = None
    covmat_file: Optional[str] = None
    marginalize_M: bool = True

    _simple_mode = False

    def initialize(self):
        if self.data is not None or (self.data_file
                                     and not self.dataset_file):
            self._init_simple()
            return
        super().initialize()  # reads the .dataset ini -> init_params

    # ---- simple (inline / two-file) mode --------------------------------------
    def _init_simple(self):
        self._simple_mode = True
        self.twoscriptmfit = False
        self.alphabeta_covmat = False
        if self.data is not None:
            rows = np.asarray(self.data, dtype=float)
        else:
            rows = np.loadtxt(self._resolve(self.data_file), ndmin=2)
        self.zcmb = rows[:, 0]
        self.zhel = self.zcmb.copy()
        self.mag = rows[:, 1]
        dmag = rows[:, 2] if rows.shape[1] > 2 else np.zeros(len(rows))
        self.pre_vars = dmag**2
        n = len(self.zcmb)
        cov = np.diag(dmag**2)
        if self.covmat_file:
            cov = cov + _read_matrix(self._resolve(self.covmat_file), n)
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

    # ---- JLA-style dataset mode (reference sn.py:64-225) -----------------------
    def init_params(self, ini: IniFile):
        self.twoscriptmfit = ini.bool("twoscriptmfit")
        scriptmcut = ini.float("scriptmcut", 10.0) if self.twoscriptmfit \
            else 10.0
        if ini.float("intrinsicdisp", 0) or ini.float("intrinsicdisp0", 0):
            raise LoggedError(self.log, "intrinsicdisp not supported.")
        if self.alpha_beta_names is not None:
            self.alpha_name, self.beta_name = self.alpha_beta_names[:2]
        self.pecz = ini.float("pecz", 0.001)
        data_file = os.path.normpath(
            os.path.join(self.path, ini.string("data_file"))
        )
        self._read_data_file(data_file)
        # covariance components
        self.covs = {}
        for name in ("mag", "stretch", "colour", "mag_stretch",
                     "mag_colour", "stretch_colour"):
            if ini.bool(f"has_{name}_covmat"):
                self.covs[name] = _read_matrix(
                    os.path.join(self.path, ini.string(f"{name}_covmat_file")),
                    self.nsn,
                )
        if not self.covs:
            raise LoggedError(self.log, "No covariance components found.")
        self.alphabeta_covmat = (
            len(self.covs) > 1 or self.covs.get("mag") is None
        )
        self._last_alpha = np.inf
        self._last_beta = np.inf
        # diagonal pre-variances incl. peculiar-velocity term
        zfacsq = 25.0 / np.log(10.0) ** 2
        self.pre_vars = self.mag_var + zfacsq * self.pecz**2 * (
            (1.0 + self.zcmb) / (self.zcmb * (1 + 0.5 * self.zcmb))
        ) ** 2
        self.configure()
        if self.twoscriptmfit:
            A1 = (self.third_var <= scriptmcut).astype(float)
            A2 = (self.third_var > scriptmcut).astype(float)
            if not A1.any():
                A1, A2 = A2, np.zeros(self.nsn)
            if not A2.any():
                self.twoscriptmfit = False
            self.A1, self.A2 = A1, A2
        if self.marginalize:
            self._setup_marginalization_grid()
            if not self.precompute_covmats:
                # lazy per-grid-point inversions are host-only
                self.jittable = False
        elif not self.alphabeta_covmat:
            self.inverse_covariance_matrix()

    def configure(self):
        """Hook for variants (masks, pre_vars overrides)."""

    def _read_data_file(self, data_file: str):
        """JLA/Pantheon light-curve parameter file: '#'-header columns."""
        renames = {
            "mb": "mag", "color": "colour", "x1": "stretch",
            "3rdvar": "third_var", "d3rdvar": "dthird_var",
            "cov_m_s": "cov_mag_stretch", "cov_m_c": "cov_mag_colour",
            "cov_s_c": "cov_stretch_colour",
        }
        cols = None
        has_x0_cov = False
        rows = []
        self.names = []
        with open(data_file, encoding="utf-8") as f:
            for line in f:
                if line.startswith("#"):
                    cols = [renames.get(c, c) for c in line[1:].split()]
                    has_x0_cov = "cov_s_x0" in cols
                    continue
                if line.strip():
                    if cols is None:
                        raise LoggedError(
                            self.log, "Data file needs a '#' header."
                        )
                    rows.append(line.split())
        self.nsn = len(rows)
        numeric = {c: np.zeros(self.nsn) for c in cols if c != "name"}
        for ix, vals in enumerate(rows):
            for c, v in zip(cols, vals):
                if c == "name":
                    self.names.append(v)
                else:
                    numeric[c][ix] = float(v)
        for c, arr in numeric.items():
            setattr(self, c, arr)
        for attr in ("third_var", "dthird_var", "set", "stretch", "colour",
                     "dx1", "dcolor", "cov_mag_stretch", "cov_mag_colour",
                     "cov_stretch_colour"):
            if not hasattr(self, attr):
                setattr(self, attr, np.zeros(self.nsn))
        if has_x0_cov:
            sf = -2.5 / (self.x0 * np.log(10))
            self.cov_mag_stretch = self.cov_s_x0 * sf
            self.cov_mag_colour = self.cov_c_x0 * sf
        if not hasattr(self, "zhel"):
            self.zhel = self.zcmb.copy()
        self.z_var = self.dz**2 if hasattr(self, "dz") else 0.0
        self.mag_var = self.dmb**2 if hasattr(self, "dmb") else 0.0
        self.stretch_var = self.dx1**2
        self.colour_var = self.dcolor**2
        self.has_third_var = bool(np.any(self.third_var))

    def _setup_marginalization_grid(self):
        """Circular alpha/beta grid (reference sn.py:196-225)."""
        mp = dict(self.marginalize_params or {})
        steps = int(mp.get("marge_steps", 7))
        self.step_width_alpha = float(mp.get("step_width_alpha", 0.003))
        self.step_width_beta = float(mp.get("step_width_beta", 0.04))
        a0 = float(mp.get("alpha_centre", 0.14))
        b0 = float(mp.get("beta_centre", 3.123))
        grid = [
            (a0 + i * self.step_width_alpha, b0 + j * self.step_width_beta)
            for i in range(-steps, steps + 1)
            for j in range(-steps, steps + 1)
            if i**2 + j**2 <= steps**2
        ]
        self.alpha_grid = np.array([g[0] for g in grid])
        self.beta_grid = np.array([g[1] for g in grid])
        self.int_points = len(grid)
        self.marge_grid = np.empty(self.int_points)
        self.invcovs = np.empty(self.int_points, dtype=object)
        if self.precompute_covmats:
            for i, (a, b) in enumerate(zip(self.alpha_grid, self.beta_grid)):
                self.invcovs[i] = self.inverse_covariance_matrix(a, b)

    # ---- statistics -------------------------------------------------------------
    def inverse_covariance_matrix(self, alpha: float = 0, beta: float = 0):
        covmat = self.covs["mag"].copy() if "mag" in self.covs else 0
        if self.alphabeta_covmat:
            if np.isclose(alpha, self._last_alpha) and np.isclose(
                beta, self._last_beta
            ):
                return self.invcov
            self._last_alpha, self._last_beta = alpha, beta
            if "stretch" in self.covs:
                covmat = covmat + alpha**2 * self.covs["stretch"]
            if "colour" in self.covs:
                covmat = covmat + beta**2 * self.covs["colour"]
            if "mag_stretch" in self.covs:
                covmat = covmat + 2 * alpha * self.covs["mag_stretch"]
            if "mag_colour" in self.covs:
                covmat = covmat - 2 * beta * self.covs["mag_colour"]
            if "stretch_colour" in self.covs:
                covmat = covmat - 2 * alpha * beta * self.covs["stretch_colour"]
            delta = (
                self.pre_vars
                + alpha**2 * self.stretch_var
                + beta**2 * self.colour_var
                + 2.0 * alpha * self.cov_mag_stretch
                - 2.0 * beta * self.cov_mag_colour
                - 2.0 * alpha * beta * self.cov_stretch_colour
            )
        else:
            delta = self.pre_vars
        covmat = np.asarray(covmat, dtype=float)
        np.fill_diagonal(covmat, covmat.diagonal() + delta)
        self.invcov = np.linalg.inv(covmat)
        return self.invcov

    def alpha_beta_logp(self, lumdists, alpha=0, beta=0, Mb=0,
                        invcovmat=None):
        """Profiled-scriptm chi2 with log-det normalization
        (reference sn.py:286-361)."""
        if self.alphabeta_covmat:
            if self.use_abs_mag:
                estimated_scriptm = Mb + 25
            else:
                invvars = 1.0 / (
                    self.pre_vars
                    + alpha**2 * self.stretch_var
                    + beta**2 * self.colour_var
                    + 2.0 * alpha * self.cov_mag_stretch
                    - 2.0 * beta * self.cov_mag_colour
                    - 2.0 * alpha * beta * self.cov_stretch_colour
                )
                estimated_scriptm = (
                    np.sum((self.mag - lumdists) * invvars) / np.sum(invvars)
                )
            diffmag = (self.mag - lumdists + alpha * self.stretch
                       - beta * self.colour - estimated_scriptm)
            if invcovmat is None:
                invcovmat = self.inverse_covariance_matrix(alpha, beta)
        else:
            if self.use_abs_mag:
                estimated_scriptm = Mb + 25
            else:
                invvars = 1.0 / self.pre_vars
                estimated_scriptm = (
                    np.sum((self.mag - lumdists) * invvars) / np.sum(invvars)
                )
            diffmag = self.mag - lumdists - estimated_scriptm
            invcovmat = self.invcov
        wt = invcovmat.dot(diffmag)
        amarg_A = wt.dot(diffmag)
        if self.twoscriptmfit:
            amarg_B = wt.dot(self.A1)
            amarg_C = wt.dot(self.A2)
            w1 = invcovmat.dot(self.A1)
            amarg_D = w1.dot(self.A2)
            amarg_E = w1.dot(self.A1)
            amarg_F = invcovmat.dot(self.A2).dot(self.A2)
            tempG = amarg_F - amarg_D**2 / amarg_E
            if self.use_abs_mag:
                chi2 = amarg_A + np.log(amarg_E / _twopi) \
                    + np.log(tempG / _twopi)
            else:
                chi2 = (
                    amarg_A + np.log(amarg_E / _twopi)
                    + np.log(tempG / _twopi)
                    - amarg_C**2 / tempG
                    - amarg_B**2 * amarg_F / (amarg_E * tempG)
                    + 2.0 * amarg_B * amarg_C * amarg_D / (amarg_E * tempG)
                )
        else:
            amarg_B = np.sum(wt)
            amarg_E = np.sum(invcovmat)
            if self.use_abs_mag:
                chi2 = amarg_A + np.log(amarg_E / _twopi)
            else:
                chi2 = amarg_A + np.log(amarg_E / _twopi) \
                    - amarg_B**2 / amarg_E
        return -chi2 / 2

    # ---- interface ---------------------------------------------------------------
    def get_can_support_params(self):
        names = []
        if getattr(self, "alphabeta_covmat", False) and not self.marginalize:
            names += [self.alpha_name, self.beta_name]
        if self.use_abs_mag:
            names.append("Mb")
        return names

    def get_requirements(self):
        reqs = {"angular_diameter_distance": {"z": np.unique(self.zcmb)}}
        if self.use_abs_mag:
            reqs["Mb"] = None
        return reqs

    def lumdists(self):
        DA = np.asarray(
            self.provider.get_angular_diameter_distance(self.zcmb)
        )
        return 5 * np.log10(
            np.maximum((1 + self.zhel) * (1 + self.zcmb) * DA, 1e-30)
        )

    def logp(self, _derived=None, **params_values):
        lumdists = self.lumdists()
        if self._simple_mode:
            return self._logp_simple(lumdists, params_values)
        Mb = params_values.get("Mb") if self.use_abs_mag else 0
        if self.marginalize:
            for i in range(self.int_points):
                self.marge_grid[i] = -self.alpha_beta_logp(
                    lumdists, self.alpha_grid[i], self.beta_grid[i], Mb,
                    invcovmat=self.invcovs[i]
                    if self.precompute_covmats else None,
                )
            grid_best = np.min(self.marge_grid)
            finite = self.marge_grid[np.isfinite(self.marge_grid)]
            return float(-grid_best + np.log(
                np.sum(np.exp(-finite + grid_best))
                * self.step_width_alpha * self.step_width_beta
            ))
        if self.alphabeta_covmat:
            return float(self.alpha_beta_logp(
                lumdists, params_values[self.alpha_name],
                params_values[self.beta_name], Mb,
            ))
        return float(self.alpha_beta_logp(lumdists, Mb=Mb))

    # ---- traced (device) path --------------------------------------------------
    def lumdists_jax(self, provider_products):
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        DA = TracedCosmoProducts(
            self, provider_products
        ).get_angular_diameter_distance(self.zcmb)
        return 5 * jnp.log10(
            jnp.maximum((1 + self.zhel) * (1 + self.zcmb) * DA, 1e-30)
        )

    def _alpha_beta_logp_jax(self, lumdists, alpha, beta, Mb):
        """Traced mirror of :meth:`alpha_beta_logp` (same amarg algebra)."""
        import jax.numpy as jnp

        if self.alphabeta_covmat:
            dvar = (
                self.pre_vars
                + alpha ** 2 * self.stretch_var
                + beta ** 2 * self.colour_var
                + 2.0 * alpha * self.cov_mag_stretch
                - 2.0 * beta * self.cov_mag_colour
                - 2.0 * alpha * beta * self.cov_stretch_colour
            )
            if self.use_abs_mag:
                estimated_scriptm = Mb + 25
            else:
                invvars = 1.0 / dvar
                estimated_scriptm = (
                    jnp.sum((self.mag - lumdists) * invvars)
                    / jnp.sum(invvars)
                )
            diffmag = (self.mag - lumdists + alpha * self.stretch
                       - beta * self.colour - estimated_scriptm)
            cov = jnp.zeros((self.nsn, self.nsn))
            if "mag" in self.covs:
                cov = cov + self.hoist("covs_mag", self.covs["mag"])
            for name, sign, fac in (
                ("stretch", 1.0, alpha ** 2), ("colour", 1.0, beta ** 2),
                ("mag_stretch", 1.0, 2 * alpha),
                ("mag_colour", -1.0, 2 * beta),
                ("stretch_colour", -1.0, 2 * alpha * beta),
            ):
                if name in self.covs:
                    cov = cov + sign * fac * self.hoist(f"covs_{name}", self.covs[name])
            cov = cov + jnp.diag(dvar)
            chol = jnp.linalg.cholesky(cov)

            def solve(rhs):
                from jax.scipy.linalg import cho_solve

                return cho_solve((chol, True), rhs)

            wt = solve(diffmag)
            inv_ones = solve(jnp.ones(self.nsn))
        else:
            if self.use_abs_mag:
                estimated_scriptm = Mb + 25
            else:
                invvars = 1.0 / self.pre_vars
                estimated_scriptm = (
                    jnp.sum((self.mag - lumdists) * invvars)
                    / jnp.sum(invvars)
                )
            diffmag = self.mag - lumdists - estimated_scriptm
            invcov = self.hoist("invcov", self.invcov)
            wt = invcov @ diffmag
            inv_ones = invcov @ jnp.ones(self.nsn)
        amarg_A = wt @ diffmag
        if self.twoscriptmfit:
            A1, A2 = self.hoist("A1", self.A1), self.hoist("A2", self.A2)
            amarg_B = wt @ A1
            amarg_C = wt @ A2
            if self.alphabeta_covmat:
                w1 = solve(A1)
                w2 = solve(A2)
            else:
                w1 = invcov @ A1
                w2 = invcov @ A2
            amarg_D = w1 @ A2
            amarg_E = w1 @ A1
            amarg_F = w2 @ A2
            tempG = amarg_F - amarg_D ** 2 / amarg_E
            if self.use_abs_mag:
                chi2 = amarg_A + jnp.log(amarg_E / _twopi) \
                    + jnp.log(tempG / _twopi)
            else:
                chi2 = (
                    amarg_A + jnp.log(amarg_E / _twopi)
                    + jnp.log(tempG / _twopi)
                    - amarg_C ** 2 / tempG
                    - amarg_B ** 2 * amarg_F / (amarg_E * tempG)
                    + 2.0 * amarg_B * amarg_C * amarg_D / (amarg_E * tempG)
                )
        else:
            amarg_B = jnp.sum(wt)
            amarg_E = jnp.sum(inv_ones)
            if self.use_abs_mag:
                chi2 = amarg_A + jnp.log(amarg_E / _twopi)
            else:
                chi2 = amarg_A + jnp.log(amarg_E / _twopi) \
                    - amarg_B ** 2 / amarg_E
        return -chi2 / 2

    def _marge_logp_jax(self, lumdists, Mb):
        """Traced circular-grid alpha/beta marginalization: one einsum over
        the precomputed inverse-covariance stack."""
        import jax.numpy as jnp

        invcovs = jnp.asarray(np.stack(list(self.invcovs)))  # (G, n, n)
        alpha = self.alpha_grid[:, None]
        beta = self.beta_grid[:, None]
        if self.use_abs_mag:
            scriptm = jnp.full(len(self.alpha_grid), Mb + 25)[:, None]
        else:
            invvars = 1.0 / (
                self.pre_vars
                + self.alpha_grid[:, None] ** 2 * self.stretch_var
                + self.beta_grid[:, None] ** 2 * self.colour_var
                + 2.0 * alpha * self.cov_mag_stretch
                - 2.0 * beta * self.cov_mag_colour
                - 2.0 * alpha * beta * self.cov_stretch_colour
            )  # (G, n) constants
            scriptm = (
                jnp.sum((self.mag - lumdists)[None, :] * invvars, axis=1)
                / jnp.sum(invvars, axis=1)
            )[:, None]
        diff = ((self.mag - lumdists)[None, :]
                + alpha * self.stretch[None, :]
                - beta * self.colour[None, :] - scriptm)  # (G, n)
        wt = jnp.einsum("gij,gj->gi", invcovs, diff)  # (G, n)
        amarg_A = jnp.sum(wt * diff, axis=1)
        if self.twoscriptmfit:
            A1, A2 = self.A1, self.A2
            amarg_B = wt @ A1
            amarg_C = wt @ A2
            w1 = np.einsum("gij,j->gi", np.stack(list(self.invcovs)), A1)
            w2 = np.einsum("gij,j->gi", np.stack(list(self.invcovs)), A2)
            amarg_D = w1 @ A2  # (G,) constants
            amarg_E = w1 @ A1
            amarg_F = w2 @ A2
            tempG = amarg_F - amarg_D ** 2 / amarg_E
            if self.use_abs_mag:
                chi2 = amarg_A + np.log(amarg_E / _twopi) \
                    + np.log(tempG / _twopi)
            else:
                chi2 = (
                    amarg_A + np.log(amarg_E / _twopi)
                    + np.log(tempG / _twopi)
                    - amarg_C ** 2 / tempG
                    - amarg_B ** 2 * amarg_F / (amarg_E * tempG)
                    + 2.0 * amarg_B * amarg_C * amarg_D / (amarg_E * tempG)
                )
        else:
            amarg_B = jnp.sum(wt, axis=1)
            amarg_E = np.stack(list(self.invcovs)).sum(axis=(1, 2))  # (G,)
            if self.use_abs_mag:
                chi2 = amarg_A + np.log(amarg_E / _twopi)
            else:
                chi2 = amarg_A + np.log(amarg_E / _twopi) \
                    - amarg_B ** 2 / amarg_E
        # matches the host path: marge_grid = chi2/2, logsumexp over grid
        from jax.scipy.special import logsumexp

        return logsumexp(-chi2 / 2) + jnp.log(
            self.step_width_alpha * self.step_width_beta
        )

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp

        lumdists = self.lumdists_jax(provider_products)
        if self._simple_mode:
            return self._logp_simple_jax(lumdists, params), {}
        Mb = params.get("Mb", 0.0) if self.use_abs_mag else 0.0
        if self.marginalize:
            return self._marge_logp_jax(lumdists, Mb), {}
        if self.alphabeta_covmat:
            alpha = jnp.asarray(params[self.alpha_name])
            beta = jnp.asarray(params[self.beta_name])
            return self._alpha_beta_logp_jax(lumdists, alpha, beta, Mb), {}
        return self._alpha_beta_logp_jax(lumdists, 0.0, 0.0, Mb), {}

    def _logp_simple_jax(self, lumdists, params):
        import jax.numpy as jnp

        mu_theory = lumdists + 25
        invcov = self.hoist("invcov", self.invcov)
        if self.use_abs_mag:
            delta = self.mag - (mu_theory + params["Mb"])
            return -0.5 * delta @ invcov @ delta
        delta = self.mag - mu_theory
        if not self.marginalize_M:
            return -0.5 * delta @ invcov @ delta
        invcov_d = invcov @ delta
        A = delta @ invcov_d
        B = invcov_d.sum()
        C = invcov.sum()
        return -0.5 * (A - B ** 2 / C + jnp.log(C / _twopi))

    def _logp_simple(self, lumdists, params_values):
        mu_theory = lumdists + 25
        if self.use_abs_mag:
            Mb = params_values.get("Mb")
            if Mb is None:
                Mb = self.provider.get_param("Mb")
            delta = self.mag - (mu_theory + Mb)
            return float(-0.5 * delta @ self.invcov @ delta)
        delta = self.mag - mu_theory
        if not self.marginalize_M:
            return float(-0.5 * delta @ self.invcov @ delta)
        # analytic marginalization over a flat prior on M
        invcov_d = self.invcov @ delta
        A = delta @ invcov_d
        B = invcov_d.sum()
        C = self.invcov.sum()
        return float(-0.5 * (A - B**2 / C + np.log(C / _twopi)))


class PantheonPlusLike(SN):
    """Pantheon+-format base (named-column files, Fisher-projected M
    marginalization).  Reference: sn/pantheonplus.py."""

    file_base_name = "pantheonpluslike"
    _file_cols = ["m_b_corr", "zhd", "zhel"]
    _cols = ["mag", "zcmb", "zhel"]
    _sep: Optional[str] = None

    def init_params(self, ini: IniFile):
        self.twoscriptmfit = False
        data_file = os.path.normpath(
            os.path.join(self.path, ini.string("data_file"))
        )
        self._read_data_file(data_file)
        self.covs = {
            "mag": _read_matrix(
                os.path.join(self.path, ini.string("mag_covmat_file")),
                self.nsn,
            )
        }
        self.alphabeta_covmat = False
        self.configure()
        self.inverse_covariance_matrix()
        if not self.use_abs_mag:
            self._marginalize_abs_mag()
        self.marginalize = False

    def _read_data_file(self, data_file):
        self.cols = list(self._cols)
        self._read_cols(data_file, list(self._file_cols), sep=self._sep)

    def _read_cols(self, data_file, file_cols, sep=None):
        with open(data_file, encoding="utf-8") as f:
            lines = f.readlines()
        header = lines[0].removeprefix("#")
        cols = [c.strip().lower() for c in header.split(sep)]
        indices = [cols.index(c) for c in file_cols]
        n = len(lines) - 1
        for col in self.cols:
            setattr(self, col, np.zeros(n))
        for ix, line in enumerate(lines[1:]):
            vals = [v.strip() for v in line.split(sep)]
            for col, i in zip(self.cols, indices):
                getattr(self, col)[ix] = float(vals[i])
        self.nsn = n

    def _apply_mask(self, zmask):
        for col in self.cols:
            setattr(self, col, getattr(self, col)[zmask])
        for name, cov in self.covs.items():
            self.covs[name] = cov[np.ix_(zmask, zmask)]
        self.nsn = int(np.count_nonzero(zmask))

    def configure(self):
        self._apply_mask(self.zcmb > 0.01)
        self.pre_vars = 0.0

    def _marginalize_abs_mag(self):
        """Project the constant-offset direction out of the inverse
        covariance (flat-prior M marginalization, up to a constant)."""
        deriv = np.ones_like(self.mag)[:, None]
        derivp = self.invcov.dot(deriv)
        fisher = deriv.T.dot(derivp)
        self.invcov = self.invcov - derivp.dot(
            np.linalg.solve(fisher, derivp.T)
        )

    def alpha_beta_logp(self, lumdists, alpha=0, beta=0, Mb=0,
                        invcovmat=None):
        estimated_scriptm = Mb + 25 if self.use_abs_mag else 0.0
        diffmag = self.mag - lumdists - estimated_scriptm
        return -diffmag.dot(self.invcov).dot(diffmag) / 2.0

    def logp(self, _derived=None, **params_values):
        Mb = params_values.get("Mb") if self.use_abs_mag else 0
        return float(self.alpha_beta_logp(self.lumdists(), Mb=Mb))

    def logp_jax(self, params, provider_products=None):
        """Traced Pantheon+-style plain quadratic form (the flat-M direction
        is already Fisher-projected out of the inverse covariance)."""
        import jax.numpy as jnp

        lumdists = self.lumdists_jax(provider_products)
        scriptm = (params["Mb"] + 25) if self.use_abs_mag else 0.0
        diffmag = self.mag - lumdists - scriptm
        return -0.5 * diffmag @ self.hoist("invcov", self.invcov) @ diffmag, {}


def _read_matrix(path: str, n: int) -> np.ndarray:
    """Covmat formats: plain text (optionally with a leading N), or npz
    upper-triangle inverse (reference sn.py:233-253)."""
    if path.endswith(".npz"):
        d = np.load(path)
        size = int(np.atleast_1d(d[d.files[0]])[0])
        mat = np.zeros((size, size))
        mat[np.triu_indices(size)] = d[d.files[1]]
        lower = np.tril_indices(size, -1)
        mat[lower] = mat.T[lower]
        return mat
    values = np.loadtxt(path)
    if values.ndim == 1 and values.size == n * n + 1:
        values = values[1:]
    return values.reshape(n, n)
