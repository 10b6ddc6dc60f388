"""Exact jittable FRW background cosmology (flat LCDM + radiation).

The reference obtains background quantities (H(z), distances, sound horizon,
acoustic scale) from external Boltzmann codes
(/root/reference/cobaya/theories/camb/camb.py:675-818).  Here the background
is closed-form + fixed-node quadrature, so every quantity is a pure jnp
function of the sampled densities: distances, ``rdrag``, ``thetastar`` and
the growth factor evaluate *on device* for whole walker batches with exact
XLA gradients (HMC through the expansion history).

All functions take an array-module argument ``xp`` (numpy or jax.numpy) so
the same math serves the eager path, the traced path, and host-side table
builds.  Quadrature nodes are static numpy; integrands are traced.

Conventions: k in 1/Mpc, distances in Mpc, H in km/s/Mpc.  Parameters are
physical densities ``ombh2``/``omch2``, ``H0``, a fixed neutrino mass
``mnu`` (eV, treated as matter in the background — adequate for the
sub-percent role it plays here).
"""

from __future__ import annotations

import numpy as np

from ...utils.conventions import Const

# Photon density for T_cmb = 2.7255 K; radiation includes N_eff = 3.044
# massless-like neutrinos during the epochs that matter for r_s.
OMEGA_GAMMA_H2 = 2.472818e-5
N_EFF = 3.044
OMEGA_RAD_H2 = OMEGA_GAMMA_H2 * (1.0 + 0.2271073 * N_EFF)
# 93.14 eV per omega_nu h^2 (standard instant-decoupling conversion)
NU_MASS_EV_PER_OMEGAH2 = 93.14

# static quadrature grids -------------------------------------------------
# log-a grid for early-universe cumulative integrals (sound horizon, growth)
_LOGA = np.linspace(np.log(1e-8), 0.0, 1024)
_A = np.exp(_LOGA)
_DLOGA = _LOGA[1] - _LOGA[0]
# z grid for late-time cumulative distance integrals (interp at traced z*)
_ZGRID = np.concatenate([
    np.linspace(0.0, 20.0, 512, endpoint=False),
    np.geomspace(20.0, 3000.0, 512),
])
# Gauss-Legendre nodes for exact distances to static z-pool entries
_GL_X, _GL_W = np.polynomial.legendre.leggauss(64)


def densities(params, xp):
    """Dict of density fractions today from physical densities."""
    ombh2 = xp.asarray(params["ombh2"])
    omch2 = xp.asarray(params["omch2"])
    H0 = xp.asarray(params["H0"])
    mnu = xp.asarray(params.get("mnu", 0.06))
    h2 = (H0 / 100.0) ** 2
    omnuh2 = mnu / NU_MASS_EV_PER_OMEGAH2
    ommh2 = ombh2 + omch2 + omnuh2
    om = ommh2 / h2
    orad = OMEGA_RAD_H2 / h2
    ode = 1.0 - om - orad  # flat
    return {"H0": H0, "h2": h2, "ombh2": ombh2, "omch2": omch2,
            "omnuh2": omnuh2, "ommh2": ommh2, "om": om, "orad": orad,
            "ode": ode}


def E_of_z(dens, z, xp):
    """H(z)/H0 for flat LCDM + radiation; broadcasts params x z."""
    zp1 = xp.asarray(z) + 1.0
    om = dens["om"][..., None] if np.ndim(dens["om"]) else dens["om"]
    orad = dens["orad"][..., None] if np.ndim(dens["orad"]) else dens["orad"]
    ode = dens["ode"][..., None] if np.ndim(dens["ode"]) else dens["ode"]
    return xp.sqrt(om * zp1 ** 3 + orad * zp1 ** 4 + ode)


def hubble(dens, z, xp):
    """H(z) in km/s/Mpc on a static z grid."""
    H0 = dens["H0"][..., None] if np.ndim(dens["H0"]) else dens["H0"]
    return H0 * E_of_z(dens, z, xp)


def comoving_radial_distance(dens, z, xp):
    """D_C(z) in Mpc by per-z Gauss-Legendre quadrature (static z pool)."""
    z = np.atleast_1d(np.asarray(z, float))
    # nodes (nz, nq): map GL [-1,1] onto [0, z_i]
    nodes = 0.5 * z[:, None] * (_GL_X[None, :] + 1.0)
    w = 0.5 * z[:, None] * _GL_W[None, :]
    einv = 1.0 / E_of_z(dens, nodes, xp)  # (..., nz, nq)
    integral = xp.sum(einv * w, axis=-1)
    H0 = dens["H0"][..., None] if np.ndim(dens["H0"]) else dens["H0"]
    return Const.c_km_s / H0 * integral


def angular_diameter_distance(dens, z, xp):
    z = np.atleast_1d(np.asarray(z, float))
    return comoving_radial_distance(dens, z, xp) / (1.0 + z)


def angular_diameter_distance_2(dens, z_pairs, xp):
    """D_A(z1, z2) for flat geometry: (D_C(z2) - D_C(z1)) / (1+z2)."""
    pairs = np.asarray(z_pairs, float).reshape(-1, 2)
    d1 = comoving_radial_distance(dens, pairs[:, 0], xp)
    d2 = comoving_radial_distance(dens, pairs[:, 1], xp)
    return (d2 - d1) / (1.0 + pairs[:, 1])


def _cumulative_comoving(dens, xp):
    """Cumulative D_C on the static _ZGRID (trapezoid), for traced-z interp."""
    einv = 1.0 / E_of_z(dens, _ZGRID, xp)
    dz = np.diff(_ZGRID)
    seg = 0.5 * (einv[..., 1:] + einv[..., :-1]) * dz
    cum = xp.cumsum(seg, axis=-1)
    zeros = xp.zeros(cum.shape[:-1] + (1,))
    cum = xp.concatenate([zeros, cum], axis=-1)
    H0 = dens["H0"][..., None] if np.ndim(dens["H0"]) else dens["H0"]
    return Const.c_km_s / H0 * cum


def _interp_rows(xq, xgrid, ytab, xp):
    """Row-wise linear interp: xq (...,) into ytab (..., M) on static xgrid."""
    g = xp.asarray(xgrid)
    i = xp.clip(xp.searchsorted(g, xq, side="right") - 1, 0, len(xgrid) - 2)
    y0 = xp.take_along_axis(ytab, i[..., None], axis=-1)[..., 0]
    y1 = xp.take_along_axis(ytab, (i + 1)[..., None], axis=-1)[..., 0]
    w = (xq - g[i]) / (g[i + 1] - g[i])
    return y0 * (1.0 - w) + w * y1


def comoving_at_traced_z(dens, z_traced, xp):
    """D_C at a traced redshift via interpolation on the cumulative grid."""
    cum = _cumulative_comoving(dens, xp)
    if cum.ndim == 1:
        return xp.interp(z_traced, xp.asarray(_ZGRID), cum)
    zt = xp.broadcast_to(xp.asarray(z_traced), cum.shape[:-1])
    return _interp_rows(zt, _ZGRID, cum, xp)


def z_star_hu_sugiyama(dens, xp):
    """Redshift of recombination (Hu & Sugiyama 1996 fit)."""
    wb, wm = dens["ombh2"], dens["ommh2"]
    g1 = 0.0783 * wb ** -0.238 / (1.0 + 39.5 * wb ** 0.763)
    g2 = 0.560 / (1.0 + 21.1 * wb ** 1.81)
    return 1048.0 * (1.0 + 0.00124 * wb ** -0.738) * (1.0 + g1 * wm ** g2)


def z_drag_eh98(dens, xp):
    """Drag epoch (Eisenstein & Hu 1998, eq. 4)."""
    wb, wm = dens["ombh2"], dens["ommh2"]
    b1 = 0.313 * wm ** -0.419 * (1.0 + 0.607 * wm ** 0.674)
    b2 = 0.238 * wm ** 0.223
    return (1291.0 * wm ** 0.251 / (1.0 + 0.659 * wm ** 0.828)
            * (1.0 + b1 * wb ** b2))


def sound_horizon_at(dens, z_end, xp):
    """r_s(z_end) in Mpc: integral of c_s/H from a=0 to a_end.

    Cumulative trapezoid over the static log-a grid, interpolated at the
    (possibly traced) end scale factor.
    """
    a = _A  # static (na,)
    zp1 = 1.0 / a
    om = dens["om"][..., None] if np.ndim(dens["om"]) else dens["om"]
    orad = (dens["orad"][..., None] if np.ndim(dens["orad"])
            else dens["orad"])
    ode = dens["ode"][..., None] if np.ndim(dens["ode"]) else dens["ode"]
    E = xp.sqrt(om * zp1 ** 3 + orad * zp1 ** 4 + ode)
    H0 = dens["H0"][..., None] if np.ndim(dens["H0"]) else dens["H0"]
    # baryon loading R = (3 rho_b / 4 rho_gamma) = 0.75 * (ombh2/wgamma) * a
    wb = (dens["ombh2"][..., None] if np.ndim(dens["ombh2"])
          else dens["ombh2"])
    R = 0.75 * wb / OMEGA_GAMMA_H2 * a
    cs = Const.c_km_s / xp.sqrt(3.0 * (1.0 + R))
    # dr_s = cs dz / H = cs da / (a^2 H) = cs dloga / (a H)
    integrand = cs / (a * H0 * E)
    seg = 0.5 * (integrand[..., 1:] + integrand[..., :-1]) * _DLOGA
    cum = xp.cumsum(seg, axis=-1)
    zeros = xp.zeros(cum.shape[:-1] + (1,))
    cum = xp.concatenate([zeros, cum], axis=-1)
    loga_end = xp.log(1.0 / (1.0 + xp.asarray(z_end)))
    if cum.ndim == 1:
        return xp.interp(loga_end, xp.asarray(_LOGA), cum)
    le = xp.broadcast_to(loga_end, cum.shape[:-1])
    return _interp_rows(le, _LOGA, cum, xp)


def acoustic_scales(dens, xp):
    """(z_star, r_star, D_M_star, 100*theta_star, z_drag, r_drag)."""
    zs = z_star_hu_sugiyama(dens, xp)
    zd = z_drag_eh98(dens, xp)
    rs = sound_horizon_at(dens, zs, xp)
    rd = sound_horizon_at(dens, zd, xp)
    dm = comoving_at_traced_z(dens, zs, xp)
    theta = rs / dm
    return zs, rs, dm, 100.0 * theta, zd, rd


def growth_tables(dens, xp):
    """(a_grid, D(a), f(a)) on the static log-a grid, D -> a in EdS.

    D(a) = (5 Om / 2) E(a) \\int_0^a da' / (a' E(a'))^3 — the standard
    linear growing-mode integral (matter + Lambda; radiation included in E
    only, adequate below z ~ 50 where it is used).
    f = dlnD/dlna by central differences on the grid.
    """
    a = _A
    zp1 = 1.0 / a
    om = dens["om"][..., None] if np.ndim(dens["om"]) else dens["om"]
    orad = (dens["orad"][..., None] if np.ndim(dens["orad"])
            else dens["orad"])
    ode = dens["ode"][..., None] if np.ndim(dens["ode"]) else dens["ode"]
    E = xp.sqrt(om * zp1 ** 3 + orad * zp1 ** 4 + ode)
    integrand = 1.0 / (a * E) ** 3 * a  # extra a: log-a measure
    seg = 0.5 * (integrand[..., 1:] + integrand[..., :-1]) * _DLOGA
    cum = xp.cumsum(seg, axis=-1)
    zeros = xp.zeros(cum.shape[:-1] + (1,))
    cum = xp.concatenate([zeros, cum], axis=-1)
    D = 2.5 * om * E * cum
    logD = xp.log(xp.maximum(D, 1e-30))
    f = xp.gradient(logD, _DLOGA, axis=-1) if xp is np else \
        _central_diff(logD, _DLOGA, xp)
    return a, D, f


def _central_diff(y, dx, xp):
    interior = (y[..., 2:] - y[..., :-2]) / (2 * dx)
    first = (y[..., 1:2] - y[..., 0:1]) / dx
    last = (y[..., -1:] - y[..., -2:-1]) / dx
    return xp.concatenate([first, interior, last], axis=-1)


def growth_at_z(dens, z, xp):
    """(D(z)/D(0), f(z)) at static z values (gathered from the log-a grid)."""
    z = np.atleast_1d(np.asarray(z, float))
    a_q = np.log(1.0 / (1.0 + z))
    a, D, f = growth_tables(dens, xp)
    # static query positions on the static grid: precompute gather weights
    i = np.clip(np.searchsorted(_LOGA, a_q, side="right") - 1,
                0, len(_LOGA) - 2)
    w = (a_q - _LOGA[i]) / _DLOGA
    Dq = (1 - w) * D[..., i] + w * D[..., i + 1]
    fq = (1 - w) * f[..., i] + w * f[..., i + 1]
    D0 = D[..., -1]
    if np.ndim(dens["om"]):
        D0 = D0[..., None]
    return Dq / D0, fq


def age_gyr(dens, xp):
    """Age of the universe in Gyr: \\int da / (a H)."""
    a = _A
    zp1 = 1.0 / a
    om = dens["om"][..., None] if np.ndim(dens["om"]) else dens["om"]
    orad = (dens["orad"][..., None] if np.ndim(dens["orad"])
            else dens["orad"])
    ode = dens["ode"][..., None] if np.ndim(dens["ode"]) else dens["ode"]
    E = xp.sqrt(om * zp1 ** 3 + orad * zp1 ** 4 + ode)
    H0 = dens["H0"][..., None] if np.ndim(dens["H0"]) else dens["H0"]
    integrand = 1.0 / (E * H0)  # Mpc s / km, per dloga
    seg = 0.5 * (integrand[..., 1:] + integrand[..., :-1]) * _DLOGA
    total = xp.sum(seg, axis=-1)
    # 1/H0 in (km/s/Mpc)^-1 = 3.0857e19 s; 1 Gyr = 3.15576e16 s
    return total * (3.0856775814913673e19 / 3.15576e16)
