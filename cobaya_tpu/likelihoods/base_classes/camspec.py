"""Planck CamSpec high-l likelihood, python-native.

Capability parity with
/root/reference/cobaya/likelihoods/base_classes/planck_2018_CamSpec_python.py:
reads the released CamSpec data (per-spectrum Cl-hat columns over
100x100/143x143/217x217/143x217 TT cross-spectra plus TE/EE, data_ranges,
binary covariance), the foreground templates (tSZ, kSZ, tSZxCIB, CIB, dust),
the published foreground model (point sources, CIB power law with running,
SZ/CIB correlation, per-spectrum dust), per-frequency calibrations, and the
Gaussian chi-squared over the selected multipole ranges.

Spectrum order convention (as in the released data): indices 0-3 are the TT
cross-spectra (100x100, 143x143, 217x217, 143x217), 4 is TE, 5 is EE.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ...utils.log import LoggedError
from .dataset import DataSetLikelihood, IniFile

# bandpass color corrections (Planck foreground conventions)
_SZ_BP_100 = 2.022
_CIB_BP_143 = 1.134
_SZ_BP_143 = 0.95
_CIB_BP_217 = 1.33
_FG_PIVOT = 3000


def range_to_ells(spec) -> np.ndarray:
    """Parse a range string like '2-50 500 1000-2500' into ell values."""
    if not isinstance(spec, str):
        return np.asarray(spec)
    chunks = []
    for part in spec.split():
        if "-" in part:
            lo, hi = (int(x) for x in part.split("-"))
            chunks.append(np.arange(lo, hi + 1))
        else:
            chunks.append(np.array([int(part)]))
    return np.concatenate(chunks)


class CamSpec(DataSetLikelihood):
    type = "CMB"
    bibtex_file = "planck2018.bibtex"
    # foreground model + covariance form are traced (logp_jax): nuisance
    # moves run entirely on device against cached theory Cls
    jittable = True

    install_options = {
        "github_repository": "CobayaSampler/planck_native_data",
        "github_release": "v1",
        "asset": "CamSpec2018.zip",
        "directory": "planck_2018_CamSpec_native",
    }

    use_cl: Optional[list] = None
    use_range: Optional[str] = None

    def _read_template(self, filename: str, pivot: int | None = None):
        """Read an l(l+1)Cl/2pi template starting at l=2, zero-padded."""
        dat = np.loadtxt(filename)
        if int(dat[0, 0]) != 2:
            raise LoggedError(self.log, "Template '%s' must start at l=2",
                              filename)
        full = np.concatenate([[0.0, 0.0], dat[:, 1]])
        if pivot is not None:
            full = full / full[pivot]
        return full

    def init_params(self, ini: IniFile):
        spectra = np.loadtxt(ini.relativeFileName("cl_hat_file"))
        covmat_cl = ini.split("covmat_cl", "")
        self.use_cl = list(self.use_cl or ini.split("use_cl", " ".join(
            covmat_cl) if covmat_cl else ""))
        used_ells_filter = None
        if self.use_range or "use_range" in ini.params:
            used_ells_filter = range_to_ells(
                self.use_range or ini.string("use_range")
            )
        # data_ranges: per spectrum "name lmin lmax"
        with open(ini.relativeFileName("data_ranges"),
                  encoding="utf-8-sig") as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        self.cl_names = []
        lmins, lmaxs = [], []
        for line in lines:
            name, lo, hi = line.split()
            self.cl_names.append(name)
            lmins.append(int(lo))
            lmaxs.append(int(hi))
        self.n_spec = len(self.cl_names)
        data_blocks, used_indices = [], []
        self.ell_ranges: list = [None] * self.n_spec
        self.used_sizes = np.zeros(self.n_spec, dtype=int)
        nX = 0
        for i, (name, lo, hi) in enumerate(zip(self.cl_names, lmins, lmaxs)):
            if not hi or hi < lo:
                continue
            n = hi - lo + 1
            data_blocks.append(spectra[lo:hi + 1, i])
            if name in self.use_cl:
                ells = np.arange(lo, hi + 1)
                if used_ells_filter is not None:
                    ells = ells[np.isin(ells, used_ells_filter)]
                self.ell_ranges[i] = ells
                self.used_sizes[i] = len(ells)
                used_indices.append(ells - lo + nX)
            else:
                lmaxs[i] = -1
            nX += n
        self.lmin = np.array(lmins)
        self.lmax = np.array(lmaxs)
        used_indices = np.concatenate(used_indices)
        self.data_vector = np.concatenate(data_blocks)[used_indices]
        # Diagonal-covariance datasets (e.g. the synthetic Knox-noise
        # benchmark data) may ship the diagonal as a plain vector file:
        # O(n) storage/IO and an O(n) chi^2 instead of a dense n x n
        # matrix (the full-range synthetic set's dense covariance is
        # ~1.1 GB — it blew the compiled program past the remote-compile
        # size limit and wastes HBM bandwidth on a matvec whose matrix is
        # almost all zeros).  Released CamSpec data uses the dense binary
        # (reference planck_2018_CamSpec_python.py covmat_fiducial).
        diagfile = ini.relativeFileName("covmat_fiducial_diag", "")
        self.covinv: Optional[np.ndarray] = None
        self.covinv_diag: Optional[np.ndarray] = None
        if diagfile and os.path.exists(diagfile):
            diag = np.loadtxt(diagfile)
            if diag.size != nX:
                raise LoggedError(
                    self.log, "Diagonal covariance size %d != %d",
                    diag.size, nX,
                )
            self.covinv_diag = 1.0 / diag[used_indices]
        else:
            covfile = ini.relativeFileName("covmat_fiducial")
            dtype = np.float64 if "64.bin" in covfile else np.float32
            cov = np.fromfile(covfile, dtype=dtype)
            if cov.size != nX * nX:
                raise LoggedError(
                    self.log, "Covariance size %d != %d^2", cov.size, nX
                )
            self.cov = cov.reshape(nX, nX)[
                np.ix_(used_indices, used_indices)
            ].astype(np.float64)
            self.covinv = np.linalg.inv(self.cov)
        max_l = int(np.max(self.lmax))
        self.ls = np.arange(max_l + 1)
        self.llp1 = self.ls * (self.ls + 1)
        self._tt_used = any(
            name in self.use_cl for name in self.cl_names[:4]
        )
        if self._tt_used:
            rel = ini.relativeFileName
            self.sz_143 = self._read_template(rel("sz143file"),
                                              _FG_PIVOT)[:max_l + 1]
            self.ksz = self._read_template(rel("kszfile"),
                                           _FG_PIVOT)[:max_l + 1]
            self.tszxcib = self._read_template(rel("tszxcibfile"),
                                               _FG_PIVOT)[:max_l + 1]
            self.cib_217 = self._read_template(rel("cib217file"),
                                               _FG_PIVOT)[:max_l + 1]
            self.dust = np.stack([
                self._read_template(rel("dust100file"))[:max_l + 1],
                self._read_template(rel("dust143file"))[:max_l + 1],
                self._read_template(rel("dust217file"))[:max_l + 1],
                self._read_template(rel("dust143x217file"))[:max_l + 1],
            ])
            l_min_used = int(np.min(self.lmin[:4]))
            self.lnrat = np.zeros(max_l + 1)
            self.lnrat[l_min_used:] = np.log(
                self.ls[l_min_used:] / float(_FG_PIVOT)
            )

    # ------------------------------------------------------------------
    def get_foregrounds(self, p: dict) -> np.ndarray:
        """TT foreground D_l per cross-spectrum, shape (4, lmax+1)."""
        aps = np.array([
            p["aps100"], p["aps143"], p["aps217"],
            p["psr"] * np.sqrt(p["aps143"] * p["aps217"]),
        ]) * 1e-6 / 9  # point-source scaling convention
        adust = np.array([
            p["dust100"], p["dust143"], p["dust217"], p["dust143x217"],
        ])
        acib217 = p["acib217"]
        acib143 = p.get("acib143", -1)
        if acib143 < 0:
            # fix 143 CIB from the 217 amplitude (template ratio)
            acib143 = 0.094 * acib217 / _CIB_BP_143 * _CIB_BP_217
        cl_cib = np.exp(
            p["ncib"] * self.lnrat + p["cibrun"] * self.lnrat**2 / 2
        ) * self.cib_217
        ksz = p["aksz"] * self.ksz
        a_sz143 = p["asz143"] * _SZ_BP_143
        a_cib143 = acib143 * _CIB_BP_143
        a_cib217 = acib217 * _CIB_BP_217
        xi = p["xi"]
        fg = np.empty((4, len(self.ls)))
        fg[0] = ksz + p["asz143"] * _SZ_BP_100 * self.sz_143
        fg[1] = (a_cib143 * cl_cib + ksz + a_sz143 * self.sz_143
                 - 2 * np.sqrt(a_cib143 * a_sz143) * xi * self.tszxcib)
        fg[2] = a_cib217 * cl_cib + ksz
        fg[3] = (p["cibr"] * np.sqrt(a_cib143 * a_cib217) * cl_cib + ksz
                 - np.sqrt(a_cib217 * a_sz143) * xi * self.tszxcib)
        fg += adust[:, None] * self.dust + np.outer(aps, self.llp1)
        return fg

    def get_cals(self, p: dict) -> np.ndarray:
        cal_planck = p.get("A_planck", 1.0) ** 2
        cal0 = p.get("cal0", 1.0)
        cal2 = p.get("cal2", 1.0)
        return np.array([
            cal0, 1.0, cal2, np.sqrt(cal2),
            p.get("calTE", 1.0), p.get("calEE", 1.0),
        ]) * cal_planck

    def chi_squared(self, CT, CTE, CEE, params: dict) -> float:
        cals = self.get_cals(params)
        fg = self.get_foregrounds(params) if self._tt_used else None
        delta = self.data_vector.copy()
        ix = 0
        for i, (cal, n) in enumerate(zip(cals, self.used_sizes)):
            if n == 0:
                continue
            ells = self.ell_ranges[i]
            if i <= 3:
                delta[ix:ix + n] -= (CT[ells] + fg[i][ells]) / cal
            elif i == 4:
                delta[ix:ix + n] -= CTE[ells] / cal
            else:
                delta[ix:ix + n] -= CEE[ells] / cal
            ix += n
        if self.covinv_diag is not None:
            return float(np.sum(delta ** 2 * self.covinv_diag))
        return float(delta @ self.covinv @ delta)

    def get_requirements(self):
        l_max = int(np.max(self.lmax))
        used = []
        if self._tt_used:
            used.append("tt")
        if "TE" in self.use_cl:
            used.append("te")
        if "EE" in self.use_cl:
            used.append("ee")
        return {"Cl": {cl: l_max for cl in used}}

    def get_can_support_params(self):
        return ["A_planck", "cal0", "cal2", "calTE", "calEE", "aps100",
                "aps143", "aps217", "psr", "acib143", "acib217", "cibr",
                "ncib", "cibrun", "asz143", "xi", "aksz", "dust100",
                "dust143", "dust217", "dust143x217"]

    def logp(self, _derived=None, **params_values):
        cls = self.provider.get_Cl(ell_factor=True)
        return -0.5 * self.chi_squared(
            cls.get("tt"), cls.get("te"), cls.get("ee"), params_values
        )

    # ---- traced (device) path --------------------------------------------------
    def _get_foregrounds_jax(self, p):
        """Traced mirror of :meth:`get_foregrounds`: (4, lmax+1) D_l."""
        import jax.numpy as jnp

        aps = jnp.stack([
            jnp.asarray(p["aps100"]), jnp.asarray(p["aps143"]),
            jnp.asarray(p["aps217"]),
            p["psr"] * jnp.sqrt(p["aps143"] * p["aps217"]),
        ]) * 1e-6 / 9
        adust = jnp.stack([
            jnp.asarray(p["dust100"]), jnp.asarray(p["dust143"]),
            jnp.asarray(p["dust217"]), jnp.asarray(p["dust143x217"]),
        ])
        acib217 = jnp.asarray(p["acib217"])
        acib143_derived = 0.094 * acib217 / _CIB_BP_143 * _CIB_BP_217
        if "acib143" in p:
            acib143 = jnp.where(
                jnp.asarray(p["acib143"]) < 0, acib143_derived,
                jnp.asarray(p["acib143"]),
            )
        else:
            acib143 = acib143_derived
        lnrat = self.hoist("lnrat", self.lnrat)
        cl_cib = jnp.exp(
            p["ncib"] * lnrat + p["cibrun"] * lnrat ** 2 / 2
        ) * self.hoist("cib_217", self.cib_217)
        ksz = p["aksz"] * self.hoist("ksz", self.ksz)
        a_sz143 = p["asz143"] * _SZ_BP_143
        a_cib143 = acib143 * _CIB_BP_143
        a_cib217 = acib217 * _CIB_BP_217
        xi = jnp.asarray(p["xi"])
        sz_143 = self.hoist("sz_143", self.sz_143)
        tszxcib = self.hoist("tszxcib", self.tszxcib)
        fg = jnp.stack([
            ksz + p["asz143"] * _SZ_BP_100 * sz_143,
            (a_cib143 * cl_cib + ksz + a_sz143 * sz_143
             - 2 * jnp.sqrt(a_cib143 * a_sz143) * xi * tszxcib),
            a_cib217 * cl_cib + ksz,
            (p["cibr"] * jnp.sqrt(a_cib143 * a_cib217) * cl_cib + ksz
             - jnp.sqrt(a_cib217 * a_sz143) * xi * tszxcib),
        ])
        fg = fg + adust[:, None] * self.hoist("dust", self.dust) \
            + aps[:, None] * self.hoist("llp1", self.llp1)[None, :]
        return fg

    def _get_cals_jax(self, p):
        import jax.numpy as jnp

        cal_planck = jnp.asarray(p.get("A_planck", 1.0)) ** 2
        cal0 = jnp.asarray(p.get("cal0", 1.0))
        cal2 = jnp.asarray(p.get("cal2", 1.0))
        return jnp.stack([
            cal0, jnp.asarray(1.0), cal2, jnp.sqrt(cal2),
            jnp.asarray(p.get("calTE", 1.0)),
            jnp.asarray(p.get("calEE", 1.0)),
        ]) * cal_planck

    def logp_jax(self, params, provider_products=None):
        import jax.numpy as jnp

        from ...theories.cosmo.traced import TracedCosmoProducts

        cls = TracedCosmoProducts(self, provider_products).get_Cl(
            ell_factor=True
        )
        cals = self._get_cals_jax(params)
        fg = self._get_foregrounds_jax(params) if self._tt_used else None
        segments = []
        ix = 0
        for i, n in enumerate(self.used_sizes):
            if n == 0:
                continue
            ells = np.asarray(self.ell_ranges[i])
            data_seg = self.hoist(f"data_vector_{i}",
                                  self.data_vector[ix:ix + n])
            if i <= 3:
                model = (jnp.asarray(cls["tt"])[ells] + fg[i][ells]) / cals[i]
            elif i == 4:
                model = jnp.asarray(cls["te"])[ells] / cals[i]
            else:
                model = jnp.asarray(cls["ee"])[ells] / cals[i]
            segments.append(data_seg - model)
            ix += n
        delta = jnp.concatenate(segments)
        if self.covinv_diag is not None:
            w = self.hoist("covinv_diag", self.covinv_diag)
            return -0.5 * jnp.sum(delta ** 2 * w), {}
        return -0.5 * delta @ self.hoist("covinv", self.covinv) @ delta, {}


# name used by the reference
Planck2018CamSpecPython = CamSpec
