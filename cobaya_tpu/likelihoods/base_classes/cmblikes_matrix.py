"""Multi-map CMB bandpower likelihood with the matrix Hamimeche-Lewis form.

Capability parity with the matrix mode of
/root/reference/cobaya/likelihoods/base_classes/cmblikes.py (cmblikes.py:591,
630-690): per-bin bandpower *matrices* over a set of maps (frequency x field
combinations), noise and fiducial matrices, per-bin window functions, and
the likelihood approximations

* ``HL``: X_b = Cfid_b^{1/2} U g(D) U^T Cfid_b^{1/2} with
  C_b^{-1/2} Chat_b C_b^{-1/2} = U D U^T and
  g(x) = sign(x-1) sqrt(2 (x - ln x - 1)); Gaussian in the flattened X.
* ``exact``: Wishart form (2l+1) fsky (tr[C^-1 Chat] - n - ln det[C^-1 Chat]).
* ``gaussian``: plain Gaussian in the bandpower elements.

Data format (text, synthetic-friendly; FITS/BK dataset ingestion can layer
on top): ``cl_hat_file`` etc. hold rows ``bin i j value`` with 1-based bin
and map indices; the covariance covers the flattened (bin-major, used-pair)
element vector.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile


def _read_matrix_rows(filename: str, nbins: int, nmaps: int) -> np.ndarray:
    rows = np.loadtxt(filename, ndmin=2)
    out = np.zeros((nbins, nmaps, nmaps))
    for b, i, j, v in rows:
        b, i, j = int(b) - 1, int(i) - 1, int(j) - 1
        out[b, i, j] = out[b, j, i] = v
    return out


class CMBlikesMatrix(DataSetLikelihood):
    type = "CMB"
    # matrix HL / Wishart / Gaussian forms are traced (logp_jax): batched
    # per-bin eigendecompositions run on device inside the jitted epoch
    jittable = True

    map_names: Optional[list] = None
    field: str = "bb"  # theory spectrum all maps share by default

    def init_params(self, ini: IniFile):
        self.map_names = list(self.map_names or ini.split("map_names"))
        self.nmaps = len(self.map_names)
        self.nbins = ini.int("nbins")
        self.lmin_bins = ini.array_int("bin_lmin")
        self.lmax_bins = ini.array_int("bin_lmax")
        self.lmax = int(self.lmax_bins.max())
        self.like_approx = ini.string("like_approx", "HL")
        self.fsky = ini.float("fsky", 1.0)
        self.field = ini.string("field", self.field).lower()
        # used cross-spectra (pairs of map indices), e.g. "95x95 95x150"
        use = ini.split("use_cl", "")
        all_pairs = [(i, j) for i in range(self.nmaps)
                     for j in range(i + 1)]
        if use:
            name_to_ix = {m: i for i, m in enumerate(self.map_names)}
            pairs = []
            for token in use:
                a, _, b = token.partition("x")
                i, j = name_to_ix[a], name_to_ix[b]
                pairs.append((max(i, j), min(i, j)))
            self.used_pairs = pairs
        else:
            self.used_pairs = all_pairs
        self.Chat = _read_matrix_rows(
            ini.relativeFileName("cl_hat_file"), self.nbins, self.nmaps
        )
        fid_file = ini.relativeFileName("cl_fiducial_file", "")
        self.Cfid = _read_matrix_rows(fid_file, self.nbins, self.nmaps) \
            if fid_file else None
        noise_file = ini.relativeFileName("cl_noise_file", "")
        self.Cnoise = _read_matrix_rows(noise_file, self.nbins, self.nmaps) \
            if noise_file else np.zeros_like(self.Chat)
        if self.like_approx == "HL":
            if self.Cfid is None:
                raise LoggedError(self.log, "HL needs 'cl_fiducial_file'.")
            self.Cfid_sqrt = np.stack([
                _matrix_sqrt(self.Cfid[b] + self.Cnoise[b])
                for b in range(self.nbins)
            ])
        # windows: top-hat averages unless a window file is given
        win_file = ini.relativeFileName("window_file", "")
        if win_file:
            self.windows = np.loadtxt(win_file).reshape(
                self.nbins, self.lmax + 1
            )
        else:
            self.windows = np.zeros((self.nbins, self.lmax + 1))
            for b, (l0, l1) in enumerate(zip(self.lmin_bins,
                                             self.lmax_bins)):
                self.windows[b, l0:l1 + 1] = 1.0 / (l1 - l0 + 1)
        n_el = self.nbins * len(self.used_pairs)
        cov = np.loadtxt(ini.relativeFileName("covmat_fiducial"))
        self.cov = cov.reshape(n_el, n_el)
        self.covinv = np.linalg.inv(self.cov)

    # ------------------------------------------------------------------
    def get_requirements(self):
        return {"Cl": {self.field: self.lmax}}

    def theory_cl_matrices(self, cls_dict, params) -> np.ndarray:
        """Per-ell theory matrices (lmax+1, nmaps, nmaps); override to add
        foregrounds / per-map scalings (e.g. BICEP-Keck)."""
        cl = np.asarray(cls_dict[self.field])[: self.lmax + 1]
        return cl[:, None, None] * np.ones((1, self.nmaps, self.nmaps))

    def get_binned_theory(self, cls_dict, params) -> np.ndarray:
        M = self.theory_cl_matrices(cls_dict, params)
        return np.einsum("bl,lij->bij", self.windows[:, : M.shape[0]], M)

    @staticmethod
    def hl_transform(C, Chat, Cfhalf):
        """Matrix HL transform (reference cmblikes.py:591)."""
        diag, U = np.linalg.eigh(C)
        if np.any(diag <= 0):
            raise np.linalg.LinAlgError("non-posdef theory matrix")
        inv_root = U @ np.diag(1 / np.sqrt(diag)) @ U.T
        D, V = np.linalg.eigh(inv_root @ Chat @ inv_root)
        g = np.sign(D - 1) * np.sqrt(
            2 * np.maximum(0, D - np.log(np.maximum(D, 1e-30)) - 1)
        )
        inner = V @ np.diag(g) @ V.T
        return Cfhalf @ inner @ Cfhalf.T

    def log_likelihood(self, cls_dict, **params) -> float:
        theory = self.get_binned_theory(cls_dict, params) + self.Cnoise
        elements = []
        chisq_exact = 0.0
        for b in range(self.nbins):
            C, Chat = theory[b], self.Chat[b] + self.Cnoise[b]
            if self.like_approx == "exact":
                M = np.linalg.solve(C, Chat)
                L_eff = (self.lmin_bins[b] + self.lmax_bins[b]) / 2
                chisq_exact += (2 * L_eff + 1) * self.fsky * (
                    np.trace(M) - self.nmaps - np.linalg.slogdet(M)[1]
                )
                continue
            if self.like_approx == "HL":
                try:
                    X = self.hl_transform(C, Chat, self.Cfid_sqrt[b])
                except np.linalg.LinAlgError:
                    return -np.inf
            else:
                X = C - Chat
            elements.extend(X[i, j] for (i, j) in self.used_pairs)
        if self.like_approx == "exact":
            return float(-0.5 * chisq_exact)
        x = np.asarray(elements)
        return float(-0.5 * x @ self.covinv @ x)

    def logp(self, _derived=None, **params_values):
        cls = self.provider.get_Cl(ell_factor=True, units="muK2")
        return self.log_likelihood(cls, **params_values)

    # ---- traced (device) path --------------------------------------------------
    def theory_cl_matrices_jax(self, cls_dict, params):
        """Traced per-ell theory matrices; override with foregrounds."""
        import jax.numpy as jnp

        cl = jnp.asarray(cls_dict[self.field])[: self.lmax + 1]
        return cl[:, None, None] * jnp.ones((1, self.nmaps, self.nmaps))

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True, units="muK2"
        )
        M = self.theory_cl_matrices_jax(cls, params)
        theory = jnp.einsum(
            "bl,lij->bij",
            self.hoist("windows", self.windows)[:, : M.shape[0]], M
        ) + self.hoist("Cnoise", self.Cnoise)  # C per bin
        Chat = self.hoist("Chat_plus_noise", self.Chat + self.Cnoise)
        if self.like_approx == "exact":
            Msolve = jnp.linalg.solve(theory, Chat)
            L_eff = (self.lmin_bins + self.lmax_bins) / 2
            tr = jnp.trace(Msolve, axis1=1, axis2=2)
            _, logdet = jnp.linalg.slogdet(Msolve)
            chisq = ((2 * L_eff + 1) * self.fsky
                     * (tr - self.nmaps - logdet)).sum()
            return -0.5 * chisq, {}
        ii = np.array([p[0] for p in self.used_pairs])
        jj = np.array([p[1] for p in self.used_pairs])
        if self.like_approx == "HL":
            diag, U = jnp.linalg.eigh(theory)  # (b, m), (b, m, m)
            bad = jnp.any(diag <= 0)
            safe = jnp.maximum(diag, 1e-30)
            inv_root = jnp.einsum(
                "bim,bm,bjm->bij", U, 1.0 / jnp.sqrt(safe), U
            )
            D, V = jnp.linalg.eigh(
                jnp.einsum("bij,bjk,bkl->bil", inv_root, Chat, inv_root)
            )
            g = jnp.sign(D - 1) * jnp.sqrt(
                2 * jnp.maximum(
                    0, D - jnp.log(jnp.maximum(D, 1e-30)) - 1
                )
            )
            inner = jnp.einsum("bim,bm,bjm->bij", V, g, V)
            Cf = self.hoist("Cfid_sqrt", self.Cfid_sqrt)
            X = jnp.einsum("bij,bjk,blk->bil", Cf, inner, Cf)
            x = X[:, ii, jj].reshape(-1)
            chi2 = x @ self.hoist("covinv", self.covinv) @ x
            return jnp.where(bad, -jnp.inf, -0.5 * chi2), {}
        X = theory - Chat  # gaussian: C - Chat (noise cancels)
        x = X[:, ii, jj].reshape(-1)
        return -0.5 * x @ self.hoist("covinv", self.covinv) @ x, {}


def _matrix_sqrt(M: np.ndarray) -> np.ndarray:
    diag, U = np.linalg.eigh(M)
    return U @ np.diag(np.sqrt(np.maximum(diag, 0))) @ U.T
