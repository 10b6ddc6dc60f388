"""Traced (on-device) view of Boltzmann-provider products.

The reference evaluates likelihood math on the host with numpy
(`/root/reference/cobaya/likelihoods/base_classes/planck_pliklite.py:178`,
``sn.py:403``, ``bao.py:477``...).  Here the theory code exports its numeric
products through the host-callback bridge as fixed-shape arrays
(:meth:`BoltzmannBase.callback_output_spec`), and likelihoods consume them
*inside the jitted device program* through this facade: every ``get_X`` is a
jnp operation over traced arrays (static gathers for the z-pools, static
unit/ell factors), so bandpower projections, covariance quadratic forms and
nuisance marginalization run on the MXU, batched over the whole walker
population — only the Boltzmann solve itself stays on the host.

Conventions of the exported keys (see ``BoltzmannBase.callback_export``):

- ``Cl_<spec>``: raw dimensionless lensed C_l, shape ``(lmax_spec + 1,)``
- ``T_cmb``: scalar CMB temperature [K] for unit conversion
- ``<z-requirement>``: values on the merged z-pool grid (``Hubble``, ...)
- derived parameters under their own names (scalars)

A jittable mock theory can emit exactly these keys from ``calculate_jax``
and drive the same likelihoods with zero host involvement.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ...utils.conventions import Const
from ...utils.log import LoggedError


def traced_cmb_unit_factor(units: str, T_cmb):
    """CMB unit factor; traced-safe (T_cmb may be a traced scalar)."""
    import jax.numpy as jnp

    if units == "1":
        return 1.0
    if units == "FIRASmuK2":
        return (Const.T_CMB * 1e6) ** 2
    if units == "FIRASK2":
        return Const.T_CMB ** 2
    if units == "muK2":
        return (jnp.asarray(T_cmb) * 1e6) ** 2
    if units == "K2":
        return jnp.asarray(T_cmb) ** 2
    raise LoggedError(None, "Unknown CMB units '%s'", units)


class TracedCosmoProducts:
    """Per-call device-side product view for one likelihood.

    Construct inside ``logp_jax`` from the ``provider_products`` mapping the
    Model threads through the traced pipeline; getters mirror the
    BoltzmannBase contract (reference boltzmannbase.py:270-520) but return
    traced jnp values.  Falls back to the provider component's eager getters
    when a product was not exported (e.g. pure-eager scripted use).
    """

    def __init__(self, like, provider_products: Mapping[str, Any] | None):
        self._like = like
        self._pp = provider_products or {}

    # -- routing -----------------------------------------------------------
    def _prov(self, req: str):
        providers = self._like.provider.requirement_providers
        comp = providers.get(req)
        if comp is None:
            raise LoggedError(
                self._like.log,
                "No provider for requirement '%s' (did get_requirements "
                "declare it?)", req,
            )
        return comp, (self._pp.get(comp.get_name()) or {})

    def get_param(self, name: str):
        import jax.numpy as jnp

        # input params first, as Provider.get_param does (theory.py:447 of
        # the reference): a sampled/input param needs no provider
        inputs = self._pp.get("__input__") or {}
        if name in inputs:
            return jnp.asarray(inputs[name])
        comp, prods = self._prov(name)
        if name in prods:
            return jnp.asarray(prods[name])
        return jnp.asarray(comp.get_param(name))

    # -- CMB spectra ---------------------------------------------------------
    def get_Cl(self, ell_factor: bool = False, units: str = "FIRASmuK2"):
        """Dict of traced C_l (or D_l) arrays keyed by spectrum name.

        Unit/ell conventions follow the reference CAMB wrapper
        (/root/reference/cobaya/theories/camb/camb.py:305-345): the lensing
        potential 'pp' is dimensionless (no unit factor) and its ell factor
        is [l(l+1)]^2 / 2pi.
        """
        import jax.numpy as jnp

        comp, prods = self._prov("Cl")
        requested = (comp.requested() if hasattr(comp, "requested")
                     else {}).get("Cl", {})
        have_flat = any(f"Cl_{cl}" in prods for cl in requested)
        if not have_flat:
            if "Cl" in prods and isinstance(prods["Cl"], Mapping):
                # eager state dict: route through the component getter
                return comp.get_Cl(ell_factor=ell_factor, units=units)
            raise LoggedError(
                self._like.log,
                "Provider '%s' exported no Cl products.", comp.get_name(),
            )
        T_cmb = prods.get("T_cmb", Const.T_CMB)
        factor = traced_cmb_unit_factor(units, T_cmb)
        out: dict[str, Any] = {}
        for cl, lmax in requested.items():
            key = f"Cl_{cl}"
            if key not in prods:
                continue
            vec = jnp.asarray(prods[key])
            ells = np.arange(vec.shape[0])
            if cl == "pp":
                fac = (ells * (ells + 1.0)) ** 2 / (2 * np.pi) \
                    if ell_factor else 1.0
                out[cl] = vec * fac
            else:
                fac = ells * (ells + 1.0) / (2 * np.pi) if ell_factor else 1.0
                out[cl] = vec * factor * fac
        out["ell"] = np.arange(max(
            (np.shape(v)[0] for k, v in out.items() if k != "ell"),
            default=0,
        ))
        return out

    # -- z-grid quantities ---------------------------------------------------
    def _z_quantity(self, req: str, z):
        import jax.numpy as jnp

        comp, prods = self._prov(req)
        if req in prods:
            vals = jnp.asarray(prods[req])
            pool = getattr(comp, "_z_pools", {}).get(req)
            if pool is not None:
                return vals[np.asarray(pool.indices(z))]
            return vals
        return jnp.asarray(getattr(comp, f"get_{req}")(z))

    def get_Hubble(self, z, units: str = "km/s/Mpc"):
        factors = {"km/s/Mpc": 1.0, "1/Mpc": 1.0 / Const.c_km_s}
        if units not in factors:
            raise LoggedError(self._like.log, "Unknown H units '%s'", units)
        return self._z_quantity("Hubble", z) * factors[units]

    def get_angular_diameter_distance(self, z):
        return self._z_quantity("angular_diameter_distance", z)

    def get_comoving_radial_distance(self, z):
        return self._z_quantity("comoving_radial_distance", z)

    def get_fsigma8(self, z):
        return self._z_quantity("fsigma8", z)

    def get_sigma8_z(self, z):
        return self._z_quantity("sigma8_z", z)

    # -- matter power ----------------------------------------------------------
    def get_Pk_grid(self, var_pair=("delta_tot", "delta_tot"),
                    nonlinear: bool = True):
        import jax.numpy as jnp

        comp, prods = self._prov("Pk_grid" if "Pk_grid" in
                                 self._like.provider.requirement_providers
                                 else "Pk_interpolator")
        tag = f"{var_pair[0]}_{var_pair[1]}"
        key = f"Pk_{'nl' if nonlinear else 'lin'}_{tag}"
        if key in prods:
            mp = comp.requested() if hasattr(comp, "requested") else {}
            spec = mp.get("Pk_interpolator") or mp.get("Pk_grid") or {}
            z = np.atleast_1d(spec.get("z", [0.0]))
            return z, jnp.asarray(prods[f"Pk_k_{tag}"]), \
                jnp.asarray(prods[key])
        return comp.get_Pk_grid(var_pair=var_pair, nonlinear=nonlinear)

    def get_Pk_interpolator(self, var_pair=("delta_tot", "delta_tot"),
                            nonlinear: bool = True, extrap_kmin=None,
                            extrap_kmax=None):
        z, k, pk = self.get_Pk_grid(var_pair=var_pair, nonlinear=nonlinear)
        return TracedPkInterpolator(z, k, pk, extrap_kmin=extrap_kmin,
                                    extrap_kmax=extrap_kmax)


class TracedPkInterpolator:
    """Traced P(z, k): linear in (z, log k) over the exported grid.

    The z grid and all query z's are static (they come from negotiated
    z-pools), so the z-direction reduces to precomputed gather weights; the
    k grid and table are traced arrays (the backend's grid can move with h).
    Beyond the tabulated k-range, log P extrapolates with the edge power-law
    slope — the same convention as the host
    :class:`~...boltzmannbase.PowerSpectrumInterpolator`.  Interior accuracy
    vs the host's bicubic spline is O((dlog k)^2) on the ~200-point log
    grid, well below the statistical precision of the consuming likelihoods.
    """

    def __init__(self, z, k, pk, extrap_kmin=None, extrap_kmax=None):
        import jax.numpy as jnp

        self.z = np.atleast_1d(np.asarray(z, float))
        self._k = jnp.asarray(k)
        self._logk = jnp.log(self._k)
        pk = jnp.asarray(pk)
        if pk.shape == (self._k.shape[0], len(self.z)):
            pk = pk.T
        self._logP = jnp.log(jnp.maximum(pk, 1e-300))  # (nz, nk)
        self._extrap_kmin = extrap_kmin
        self._extrap_kmax = extrap_kmax

    @property
    def kmin(self):
        return self._extrap_kmin if self._extrap_kmin is not None \
            else self._k[0]

    @property
    def kmax(self):
        return self._extrap_kmax if self._extrap_kmax is not None \
            else self._k[-1]

    def _z_weights(self, z_q: np.ndarray):
        z_q = np.atleast_1d(np.asarray(z_q, float))
        iz = np.clip(np.searchsorted(self.z, z_q, side="right") - 1,
                     0, max(len(self.z) - 2, 0))
        if len(self.z) == 1:
            return iz, np.zeros_like(z_q)
        dz = self.z[iz + 1] - self.z[iz]
        wz = np.clip((z_q - self.z[iz]) / np.where(dz == 0, 1, dz), 0.0, 1.0)
        return iz, wz

    def logP(self, z, k, grid=None):
        """Pairwise/broadcast log P at static z and (possibly traced) k."""
        import jax.numpy as jnp

        z_q = np.atleast_1d(np.asarray(z, float))
        k_q = jnp.atleast_1d(jnp.asarray(k))
        z_b, _ = np.broadcast_arrays(z_q, np.zeros(k_q.shape))
        k_b = jnp.broadcast_to(k_q, z_b.shape).reshape(-1)
        iz, wz = self._z_weights(z_b.reshape(-1))
        logq = jnp.log(jnp.maximum(k_b, 1e-300))
        nk = self._logP.shape[1]
        ik = jnp.clip(jnp.searchsorted(self._logk, logq, side="right") - 1,
                      0, nk - 2)
        tab = jnp.asarray(self._logP)

        # gather just the needed columns (ik, ik+1 and the four static edge
        # columns), z-blending scalars: blending the full (nq, nk) rows
        # first costs ~nk/4 times the HBM traffic on the hot DES path
        def at(cols):
            if len(self.z) == 1:
                return tab[0, cols]
            return (1 - wz) * tab[iz, cols] + wz * tab[iz + 1, cols]

        v_lo = at(ik)
        v_hi = at(ik + 1)
        lo = self._logk[ik]
        hi = self._logk[ik + 1]
        t = (logq - lo) / (hi - lo)
        val = v_lo * (1 - t) + v_hi * t
        # power-law extrapolation at the table edges
        dlog0 = self._logk[1] - self._logk[0]
        dlog1 = self._logk[-1] - self._logk[-2]
        e0, e1, em2, em1 = at(0), at(1), at(nk - 2), at(nk - 1)
        slope_lo = (e1 - e0) / dlog0
        slope_hi = (em1 - em2) / dlog1
        val = jnp.where(
            logq < self._logk[0],
            e0 + slope_lo * (logq - self._logk[0]), val,
        )
        val = jnp.where(
            logq > self._logk[-1],
            em1 + slope_hi * (logq - self._logk[-1]), val,
        )
        out = val.reshape(z_b.shape)
        return out if out.shape else out.reshape(())

    def P(self, z, k, grid=None):
        import jax.numpy as jnp

        return jnp.exp(self.logP(z, k, grid=grid))
