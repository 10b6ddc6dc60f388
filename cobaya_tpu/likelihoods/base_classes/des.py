"""DES Y1 joint 3x2pt likelihood (cosmic shear + galaxy-galaxy lensing +
galaxy clustering).

Capability parity with /root/reference/cobaya/likelihoods/base_classes/des.py
(arXiv:1708.01530): reads the released DES data (.dataset with measurement
tables per data type, theta bins, n(z) tables, full covariance, per-bin
angular cuts), computes Limber angular power spectra from the nonlinear
matter power interpolator with lensing/clustering window functions, intrinsic
alignments (NLA), photo-z shift and shear-calibration nuisance parameters,
and projects to the measured angular statistics (xi+, xi-, gamma_t,
w(theta)) through precomputed binned-Bessel matrices.

Design difference from the reference: no numba — the lensing-efficiency
integral is a triangular matrix product and the Limber sum a matmul, which
vectorize in numpy on the eager path and run on the MXU on the traced path
(``logp_jax``): the Boltzmann provider exports its P(k) grid through the
callback bridge, and photo-z/bias/IA/shear nuisance moves re-evaluate the
whole 3x2pt pipeline on device without touching the host.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ...utils.conventions import Const
from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile

_DATA_TYPES = ["xip", "xim", "gammat", "wtheta"]


class DES(DataSetLikelihood):
    type = "DES"
    # the whole 3x2pt pipeline is traced (logp_jax): Limber projection,
    # window/efficiency kernels and Bessel resampling are matmuls over the
    # provider's exported P(k) grid, batched over walkers on the MXU
    jittable = True

    install_options = {
        "github_repository": "CobayaSampler/des_data",
        "github_release": "v1.0",
        "directory": "des_data",
    }

    acc: float = 1.0
    binned_bessels: bool = True
    use_Weyl: bool = False
    l_max: int = 0

    def init_params(self, ini: IniFile):
        self.l_max = self.l_max or int(50000 * self.acc)
        self.fullcov = np.loadtxt(ini.relativeFileName("cov_file"))
        ntheta = ini.int("num_theta_bins")
        self.theta_bins = np.loadtxt(ini.relativeFileName("theta_bins_file"))
        self.data_types = ini.split("data_types")
        self.used_types = ini.split("used_data_types",
                                    " ".join(self.data_types))
        # per-(type, bin-pair) angular cuts
        with open(ini.relativeFileName("data_selection"),
                  encoding="utf-8") as f:
            header = f.readline()
            lines = f.readlines()
        ranges: dict[str, Any] = {
            tp: np.empty((6, 6), dtype=object) for tp in self.data_types
        }
        for line in lines:
            items = line.split()
            if items and items[0] in self.used_types:
                b1, b2 = int(items[1]) - 1, int(items[2]) - 1
                ranges[items[0]][b1][b2] = [float(x) for x in items[3:5]]
        self.nzbins = ini.int("num_z_bins")
        self.nwbins = ini.int("num_gal_bins", 0)
        maxbin = max(self.nzbins, self.nwbins)
        self.bin_pairs: list[list] = []
        self.data_arrays: list = []
        self.indices: list = []
        self.used_indices: list = []
        self.used_items: list = []
        cov_ix = 0
        for i, tp in enumerate(self.data_types):
            xi = np.loadtxt(ini.relativeFileName(f"measurements[{tp}]"),
                            ndmin=2)
            corr = np.empty((maxbin, maxbin), dtype=object)
            self.data_arrays.append(corr)
            self.bin_pairs.append([])
            for row in xi:
                f1, f2, t_ix = int(row[0]) - 1, int(row[1]) - 1, int(
                    row[2]) - 1
                self.indices.append((i, f1, f2, t_ix))
                if (f1, f2) not in self.bin_pairs[i]:
                    self.bin_pairs[i].append((f1, f2))
                    corr[f1, f2] = np.zeros(ntheta)
                corr[f1, f2][t_ix] = row[3]
                rng = ranges[tp][f1, f2] if tp in ranges else None
                if rng is not None and rng[0] < self.theta_bins[t_ix] < rng[1]:
                    self.used_indices.append(cov_ix)
                    self.used_items.append(self.indices[-1])
                cov_ix += 1
        from scipy.interpolate import InterpolatedUnivariateSpline

        nz_source = np.loadtxt(ini.relativeFileName("nz_file"))
        self.zmid = nz_source[:, 1]
        self.zbin_sp = [
            InterpolatedUnivariateSpline(self.zmid, nz_source[:, b + 3])
            for b in range(self.nzbins)
        ]
        nz_lens = np.loadtxt(ini.relativeFileName("nz_gal_file"))
        self.zbin_w_sp = [
            InterpolatedUnivariateSpline(self.zmid, nz_lens[:, b + 3])
            for b in range(self.nwbins)
        ]
        from ...ops.interp import TracedSpline1D

        self._zbin_sp_jax = [
            TracedSpline1D(self.zmid, nz_source[:, b + 3],
                           out_of_bounds=0.0)
            for b in range(self.nzbins)
        ]
        self._zbin_w_sp_jax = [
            TracedSpline1D(self.zmid, nz_lens[:, b + 3], out_of_bounds=0.0)
            for b in range(self.nwbins)
        ]
        self.zmax = self.zmid[-1]
        self.k_max = ini.float("kmax", 15)
        self._post_load()

    def _post_load(self):
        from scipy import special

        self.covmat = self.fullcov[np.ix_(self.used_indices,
                                          self.used_indices)]
        self.covinv = np.linalg.inv(self.covmat)
        self.data_vector = self.make_vector(self.data_arrays)
        self.theta_bins_radians = self.theta_bins / 60 * np.pi / 180
        # binned Bessel matrices: one column per theta bin, rows = ell groups
        dls = np.diff(np.unique(np.exp(np.linspace(
            np.log(1.0), np.log(self.l_max), int(500 * self.acc)
        )).astype(int)))
        groups = []
        ell = 2
        self.ls_bessel = np.zeros(dls.size)
        for i, dlx in enumerate(dls):
            self.ls_bessel[i] = (2 * ell + dlx - 1) / 2.0
            groups.append(np.arange(ell, ell + dlx))
            ell += dlx
        js = np.empty((3, self.ls_bessel.size, len(self.theta_bins_radians)))
        bigell = np.arange(0, self.l_max + 1, dtype=float)
        for i, theta in enumerate(self.theta_bins_radians):
            bigx = bigell * theta
            for ix, nu in enumerate([0, 2, 4]):
                bigj = special.jn(nu, bigx) * bigell / (2 * np.pi)
                for j, g in enumerate(groups):
                    js[ix, j, i] = bigj[g].sum()
        self.bessel_cache = js[0], js[1], js[2]
        if self.acc > 1:
            self.zs = np.linspace(0.005, self.zmax, int(350 * self.acc))
        else:
            self.zs = self.zmid[self.zmid <= self.zmax]
        self.zs_interp = np.linspace(0, self.zmax, 100)
        # sparse Limber ell grid (static given acc / l_max)
        self.ls_cl = np.concatenate([
            np.arange(2.0, 100 - 4 / self.acc, 4 / self.acc),
            np.exp(np.linspace(np.log(100.0), np.log(self.l_max),
                               int(50 * self.acc))),
        ])
        # the ls_cl -> ls_bessel cubic-spline resampling is linear in the
        # Cl values: precompute it as a matrix so the traced path applies
        # the exact same interpolation as the host spline
        from scipy.interpolate import InterpolatedUnivariateSpline as _sp

        L = len(self.ls_cl)
        op = np.zeros((len(self.ls_bessel), L))
        for j in range(L):
            e = np.zeros(L)
            e[j] = 1.0
            op[:, j] = _sp(self.ls_cl, e)(self.ls_bessel)
        self._bessel_op = op

    # ------------------------------------------------------------------
    def get_requirements(self):
        return {
            "H0": None,
            "omegam": None,
            "Pk_interpolator": {
                "z": self.zs_interp, "k_max": 15 * self.acc,
                "nonlinear": True,
                "vars_pairs": [("delta_tot", "delta_tot")] + (
                    [("Weyl", "Weyl")] if self.use_Weyl else []
                ),
            },
            "comoving_radial_distance": {"z": self.zs},
            "Hubble": {"z": self.zs},
        }

    def make_vector(self, arrays) -> np.ndarray:
        return np.array([
            arrays[t][f1, f2][ix] for (t, f1, f2, ix) in self.used_items
        ])

    def get_theory(self, PKdelta, PKWeyl, bin_bias,
                   shear_calibration_parameters, intrinsic_alignment_A,
                   intrinsic_alignment_alpha, intrinsic_alignment_z0,
                   wl_photoz_errors, lens_photoz_errors):
        """Angular statistics for every used bin pair (Limber + Bessel)."""
        provider = self.provider
        h2 = (provider.get_param("H0") / 100) ** 2
        omegam = provider.get_param("omegam")
        zs = self.zs
        chis = np.asarray(provider.get_comoving_radial_distance(zs))
        Hs = np.asarray(provider.get_Hubble(zs, units="1/Mpc"))
        dchis = np.concatenate([
            [(chis[1] + chis[0]) / 2], (chis[2:] - chis[:-2]) / 2,
            [chis[-1] - chis[-2]],
        ])
        D_growth = np.sqrt(PKdelta.P(zs, 0.001) / PKdelta.P(0, 0.001))
        c_ms = Const.c_km_s * 1e3
        # galaxy window functions (clustering / gg-lensing)
        qgal = []
        if any(t in self.used_types for t in ("gammat", "wtheta")):
            for b in range(self.nwbins):
                zshift = zs - lens_photoz_errors[b]
                n_chi = Hs * self.zbin_w_sp[b](zshift)
                n_chi[zshift < 0] = 0
                qgal.append(n_chi * bin_bias[b])
        # lensing efficiency + NLA intrinsic alignments
        qs = None
        if any(t in self.used_types for t in ("gammat", "xip", "xim")):
            align = (
                intrinsic_alignment_A
                * ((1 + zs) / (1 + intrinsic_alignment_z0))
                ** intrinsic_alignment_alpha
                * 0.0134 / D_growth
            )
            align /= chis * (1 + zs) * 3 * h2 * (1e5 / c_ms) ** 2 / 2
            # triangular kernel: W[i] = sum_{j>=i} n(j) (1 - chi_i/chi_j) dchi_j
            tri = np.triu(
                (1 - chis[:, None] / np.where(chis[None, :] == 0, 1,
                                              chis[None, :])) * dchis[None, :]
            )
            wq = np.empty((self.nzbins, len(chis)))
            for b in range(self.nzbins):
                zshift = zs - wl_photoz_errors[b]
                n_chi = Hs * self.zbin_sp[b](zshift)
                n_chi[zshift < 0] = 0
                wq[b] = tri @ n_chi - align * n_chi
            if PKWeyl is not None:
                if "gammat" in self.used_types:
                    raise LoggedError(
                        self.log, "Weyl-potential mode supports lensing only."
                    )
                qs = chis * wq
            else:
                qs = (3 * omegam * h2 * (1e5 / c_ms) ** 2
                      * chis * (1 + zs) / 2 * wq)
        # Limber integrand on a sparse ell grid
        ls_cl = self.ls_cl
        dchifac = dchis / chis**2
        ks = np.outer(ls_cl + 0.5, 1 / chis)  # (L, N)
        z_flat = np.broadcast_to(zs, ks.shape).reshape(-1)
        pk_flat = PKdelta.P(z_flat, ks.reshape(-1), grid=False)
        tmp = pk_flat.reshape(ks.shape) * dchifac[None, :]
        tmp[(ks < 1e-4) | (ks >= PKdelta.kmax)] = 0
        if PKWeyl is not None:
            pk_flat = PKWeyl.P(z_flat, ks.reshape(-1), grid=False)
            tmplens = pk_flat.reshape(ks.shape) * dchifac[None, :]
            tmplens[(ks < 1e-4) | (ks >= PKWeyl.kmax)] = 0
        else:
            tmplens = tmp
        from scipy.interpolate import InterpolatedUnivariateSpline as _spline

        j0s, j2s, j4s = self.bessel_cache
        maxbin = max(self.nzbins, self.nwbins)
        out = [np.empty((maxbin, maxbin), dtype=object) for _ in range(4)]

        def cl_at_bessel(weights):
            return _spline(ls_cl, weights)(self.ls_bessel)

        if "xip" in self.used_types or "xim" in self.used_types:
            for f1, f2 in self.bin_pairs[self.data_types.index("xip")]:
                cl = cl_at_bessel(tmplens @ (qs[f1] * qs[f2]))
                fac = ((1 + shear_calibration_parameters[f1])
                       * (1 + shear_calibration_parameters[f2]))
                out[0][f1, f2] = (cl @ j0s) * fac
                out[1][f1, f2] = (cl @ j4s) * fac
        if "gammat" in self.used_types:
            for f1, f2 in self.bin_pairs[self.data_types.index("gammat")]:
                cl = cl_at_bessel(tmp @ (qgal[f1] * qs[f2]))
                out[2][f1, f2] = (cl @ j2s) * (
                    1 + shear_calibration_parameters[f2]
                )
        if "wtheta" in self.used_types:
            for f1, f2 in self.bin_pairs[self.data_types.index("wtheta")]:
                cl = cl_at_bessel(tmp @ (qgal[f1] * qgal[f2]))
                out[3][f1, f2] = cl @ j0s
        return out

    # ---- traced (device) path --------------------------------------------------
    def _get_theory_jax(self, pp, PKdelta, PKWeyl, bin_bias,
                        shear_calibration_parameters,
                        intrinsic_alignment_A, intrinsic_alignment_alpha,
                        intrinsic_alignment_z0, wl_photoz_errors,
                        lens_photoz_errors):
        """Traced mirror of :meth:`get_theory`: Limber matmuls + precomputed
        Bessel resampling, all on device."""
        import jax.numpy as jnp

        h2 = (pp.get_param("H0") / 100) ** 2
        omegam = pp.get_param("omegam")
        zs = self.zs
        chis = pp.get_comoving_radial_distance(zs)
        Hs = pp.get_Hubble(zs, units="1/Mpc")
        dchis = jnp.concatenate([
            (chis[1:2] + chis[0:1]) / 2, (chis[2:] - chis[:-2]) / 2,
            chis[-1:] - chis[-2:-1],
        ])
        D_growth = jnp.sqrt(PKdelta.P(zs, 0.001) / PKdelta.P(0.0, 0.001))
        c_ms = Const.c_km_s * 1e3
        qgal = []
        if any(t in self.used_types for t in ("gammat", "wtheta")):
            for b in range(self.nwbins):
                zshift = zs - lens_photoz_errors[b]
                n_chi = Hs * self._zbin_w_sp_jax[b](zshift)
                n_chi = jnp.where(zshift < 0, 0.0, n_chi)
                qgal.append(n_chi * bin_bias[b])
        qs = None
        if any(t in self.used_types for t in ("gammat", "xip", "xim")):
            align = (
                intrinsic_alignment_A
                * ((1 + zs) / (1 + intrinsic_alignment_z0))
                ** intrinsic_alignment_alpha
                * 0.0134 / D_growth
            )
            align = align / (
                chis * (1 + zs) * 3 * h2 * (1e5 / c_ms) ** 2 / 2
            )
            tri = jnp.triu(
                (1 - chis[:, None] / jnp.where(chis[None, :] == 0, 1,
                                               chis[None, :]))
                * dchis[None, :]
            )
            wq = []
            for b in range(self.nzbins):
                zshift = zs - wl_photoz_errors[b]
                n_chi = Hs * self._zbin_sp_jax[b](zshift)
                n_chi = jnp.where(zshift < 0, 0.0, n_chi)
                wq.append(tri @ n_chi - align * n_chi)
            wq = jnp.stack(wq)
            if PKWeyl is not None:
                if "gammat" in self.used_types:
                    raise LoggedError(
                        self.log,
                        "Weyl-potential mode supports lensing only.",
                    )
                qs = chis * wq
            else:
                qs = (3 * omegam * h2 * (1e5 / c_ms) ** 2
                      * chis * (1 + zs) / 2 * wq)
        ls_cl = self.ls_cl
        dchifac = dchis / chis ** 2
        ks = jnp.outer(jnp.asarray(ls_cl) + 0.5, 1 / chis)  # (L, N)
        z_cols = np.broadcast_to(zs, (len(ls_cl), len(zs)))
        pk = PKdelta.P(z_cols, ks)
        tmp = pk * dchifac[None, :]
        tmp = jnp.where((ks < 1e-4) | (ks >= PKdelta.kmax), 0.0, tmp)
        if PKWeyl is not None:
            pklens = PKWeyl.P(z_cols, ks)
            tmplens = pklens * dchifac[None, :]
            tmplens = jnp.where(
                (ks < 1e-4) | (ks >= PKWeyl.kmax), 0.0, tmplens
            )
        else:
            tmplens = tmp
        j0s = self.hoist("bessel_j0", self.bessel_cache[0])
        j2s = self.hoist("bessel_j2", self.bessel_cache[1])
        j4s = self.hoist("bessel_j4", self.bessel_cache[2])
        op = self.hoist("bessel_op", self._bessel_op)
        vecs: dict = {}
        if "xip" in self.used_types or "xim" in self.used_types:
            t_xip = _DATA_TYPES.index("xip")
            t_xim = _DATA_TYPES.index("xim")
            for f1, f2 in self.bin_pairs[self.data_types.index("xip")]:
                cl = op @ (tmplens @ (qs[f1] * qs[f2]))
                fac = ((1 + shear_calibration_parameters[f1])
                       * (1 + shear_calibration_parameters[f2]))
                vecs[(t_xip, f1, f2)] = (cl @ j0s) * fac
                vecs[(t_xim, f1, f2)] = (cl @ j4s) * fac
        if "gammat" in self.used_types:
            t_g = _DATA_TYPES.index("gammat")
            for f1, f2 in self.bin_pairs[self.data_types.index("gammat")]:
                cl = op @ (tmp @ (qgal[f1] * qs[f2]))
                vecs[(t_g, f1, f2)] = (cl @ j2s) * (
                    1 + shear_calibration_parameters[f2]
                )
        if "wtheta" in self.used_types:
            t_w = _DATA_TYPES.index("wtheta")
            for f1, f2 in self.bin_pairs[self.data_types.index("wtheta")]:
                cl = op @ (tmp @ (qgal[f1] * qgal[f2]))
                vecs[(t_w, f1, f2)] = cl @ j0s
        return jnp.stack([
            vecs[(t, f1, f2)][ix] for (t, f1, f2, ix) in self.used_items
        ])

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        pp = TracedCosmoProducts(self, provider_products)
        PKdelta = pp.get_Pk_interpolator(
            ("delta_tot", "delta_tot"), extrap_kmax=3000 * self.acc
        )
        PKWeyl = pp.get_Pk_interpolator(
            ("Weyl", "Weyl"), extrap_kmax=3000 * self.acc
        ) if self.use_Weyl else None
        p = params
        theory_vec = self._get_theory_jax(
            pp, PKdelta, PKWeyl,
            bin_bias=[p.get(f"DES_b{i}", 1.0) for i in range(1, 6)],
            wl_photoz_errors=[p.get(f"DES_DzS{i}", 0.0)
                              for i in range(1, 5)],
            lens_photoz_errors=[p.get(f"DES_DzL{i}", 0.0)
                                for i in range(1, 6)],
            shear_calibration_parameters=[p.get(f"DES_m{i}", 0.0)
                                          for i in range(1, 5)],
            intrinsic_alignment_A=p.get("DES_AIA", 0.0),
            intrinsic_alignment_alpha=p.get("DES_alphaIA", 0.0),
            intrinsic_alignment_z0=p.get("DES_z0IA", 0.62),
        )
        delta = self.hoist("data_vector", self.data_vector) - theory_vec
        return -0.5 * delta @ self.hoist("covinv", self.covinv) @ delta, {}

    def chi_squared(self, theory, return_theory_vector: bool = False):
        theory_vec = self.make_vector(theory)
        delta = self.data_vector - theory_vec
        chi2 = float(delta @ self.covinv @ delta)
        if return_theory_vector:
            return theory_vec, chi2
        return chi2

    def logp(self, _derived=None, **params_values):
        PKdelta = self.provider.get_Pk_interpolator(
            ("delta_tot", "delta_tot"), extrap_kmax=3000 * self.acc
        )
        PKWeyl = self.provider.get_Pk_interpolator(
            ("Weyl", "Weyl"), extrap_kmax=3000 * self.acc
        ) if self.use_Weyl else None
        theory = self.get_theory(
            PKdelta, PKWeyl,
            bin_bias=[params_values.get(f"DES_b{i}") for i in range(1, 6)],
            wl_photoz_errors=[params_values.get(f"DES_DzS{i}")
                              for i in range(1, 5)],
            lens_photoz_errors=[params_values.get(f"DES_DzL{i}")
                                for i in range(1, 6)],
            shear_calibration_parameters=[params_values.get(f"DES_m{i}")
                                          for i in range(1, 5)],
            intrinsic_alignment_A=params_values.get("DES_AIA"),
            intrinsic_alignment_alpha=params_values.get("DES_alphaIA"),
            intrinsic_alignment_z0=params_values.get("DES_z0IA", 0.62),
        )
        return -0.5 * self.chi_squared(theory)

    def get_can_support_params(self):
        return ([f"DES_b{i}" for i in range(1, 6)]
                + [f"DES_DzS{i}" for i in range(1, 5)]
                + [f"DES_DzL{i}" for i in range(1, 6)]
                + [f"DES_m{i}" for i in range(1, 5)]
                + ["DES_AIA", "DES_alphaIA", "DES_z0IA"])
