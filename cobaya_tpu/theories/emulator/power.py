"""Jittable linear + nonlinear matter power: EH98 transfer, growth, halofit.

Implements the Eisenstein & Hu (1998, ApJ 496, 605) baryon-wiggle transfer
function, the As-normalized linear P(k, z) with the exact growth integral of
:mod:`.background`, top-hat/Gaussian sigma(R) by fixed log-k quadrature, and
the Takahashi et al. (2012) halofit nonlinear correction — all as pure
array-module functions (numpy or jnp), so the full P(k) pipeline runs traced
on device with exact gradients (the reference gets these from the external
CAMB/CLASS codes: /root/reference/cobaya/theories/camb/camb.py:504-560).

Conventions: k in 1/Mpc, P in Mpc^3 (the repo-wide Pk_grid contract).
"""

from __future__ import annotations

import numpy as np

from ...utils.conventions import Const
from . import background as bg

K_PIVOT = 0.05  # 1/Mpc, primordial pivot

# static log-k quadrature grid for sigma(R)/halofit integrals
_LNK = np.linspace(np.log(1e-5), np.log(1e3), 640)
_KQ = np.exp(_LNK)
_DLNK = _LNK[1] - _LNK[0]


def eh98_transfer(dens, k, xp):
    """EH98 transfer function with baryon wiggles; k in 1/Mpc.

    Vectorized over broadcast parameter batch (leading axes) x k (last).
    """
    wm = dens["ombh2"] + dens["omch2"]  # CDM+baryons drive the transfer
    wb = dens["ombh2"]
    fb = wb / wm
    fc = 1.0 - fb
    theta = 2.7255 / 2.7
    wm_ = wm[..., None] if np.ndim(wm) else wm
    wb_ = wb[..., None] if np.ndim(wb) else wb
    fb_ = fb[..., None] if np.ndim(fb) else fb
    fc_ = fc[..., None] if np.ndim(fc) else fc
    k = xp.asarray(k)

    z_eq = 2.50e4 * wm_ * theta ** -4
    k_eq = 7.46e-2 * wm_ * theta ** -2
    # drag epoch and baryon loading
    b1 = 0.313 * wm_ ** -0.419 * (1.0 + 0.607 * wm_ ** 0.674)
    b2 = 0.238 * wm_ ** 0.223
    z_d = (1291.0 * wm_ ** 0.251 / (1.0 + 0.659 * wm_ ** 0.828)
           * (1.0 + b1 * wb_ ** b2))
    R_d = 31.5 * wb_ * theta ** -4 * (z_d / 1e3) ** -1
    R_eq = 31.5 * wb_ * theta ** -4 * (z_eq / 1e3) ** -1
    s = (2.0 / (3.0 * k_eq)) * xp.sqrt(6.0 / R_eq) * xp.log(
        (xp.sqrt(1.0 + R_d) + xp.sqrt(R_d + R_eq)) / (1.0 + xp.sqrt(R_eq)))
    k_silk = (1.6 * wb_ ** 0.52 * wm_ ** 0.73
              * (1.0 + (10.4 * wm_) ** -0.95))
    q = k / (13.41 * k_eq)

    # CDM part
    a1 = (46.9 * wm_) ** 0.670 * (1.0 + (32.1 * wm_) ** -0.532)
    a2 = (12.0 * wm_) ** 0.424 * (1.0 + (45.0 * wm_) ** -0.582)
    alpha_c = a1 ** (-fb_) * a2 ** (-fb_ ** 3)
    bb1 = 0.944 / (1.0 + (458.0 * wm_) ** -0.708)
    bb2 = (0.395 * wm_) ** -0.0266
    beta_c = 1.0 / (1.0 + bb1 * (fc_ ** bb2 - 1.0))

    def T0(q, alpha, beta):
        C = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q ** 1.08)
        L = xp.log(np.e + 1.8 * beta * q)
        return L / (L + C * q ** 2)

    f = 1.0 / (1.0 + (k * s / 5.4) ** 4)
    Tc = f * T0(q, 1.0, beta_c) + (1.0 - f) * T0(q, alpha_c, beta_c)

    # baryon part
    y = (1.0 + z_eq) / (1.0 + z_d)
    sy = xp.sqrt(1.0 + y)
    G = y * (-6.0 * sy + (2.0 + 3.0 * y) * xp.log((sy + 1.0) / (sy - 1.0)))
    alpha_b = 2.07 * k_eq * s * (1.0 + R_d) ** -0.75 * G
    beta_node = 8.41 * wm_ ** 0.435
    ks = xp.maximum(k * s, 1e-12)
    s_tilde = s / (1.0 + (beta_node / ks) ** 3) ** (1.0 / 3.0)
    beta_b = 0.5 + fb_ + (3.0 - 2.0 * fb_) * xp.sqrt(
        (17.2 * wm_) ** 2 + 1.0)
    x = k * s_tilde
    sinc = xp.where(x > 1e-8, xp.sin(x) / xp.maximum(x, 1e-12), 1.0)
    Tb = (T0(q, 1.0, 1.0) / (1.0 + (ks / 5.2) ** 2)
          + alpha_b / (1.0 + (beta_b / ks) ** 3)
          * xp.exp(-(k / k_silk) ** 1.4)) * sinc
    return fb_ * Tb + fc_ * Tc


def linear_power(dens, params, k, z, xp, growth=None):
    """Linear P(k, z) in Mpc^3; k static or traced, z static array.

    P(k, z) = (8 pi^2 / 25) (k c^4 / (Om^2 H0^4)) As (k/k0)^(ns-1)
              T^2(k) D(z)^2 with D -> a in EdS (the standard curvature
    normalization; As = e^{logA} 1e-10).
    """
    As = xp.exp(xp.asarray(params["logA"])) * 1e-10
    ns = xp.asarray(params["ns"])
    om = dens["om"]
    H0 = dens["H0"]
    T = eh98_transfer(dens, k, xp)
    k = xp.asarray(k)
    c_H0 = Const.c_km_s / (H0[..., None] if np.ndim(H0) else H0)
    om_ = om[..., None] if np.ndim(om) else om
    As_ = As[..., None] if np.ndim(As) else As
    ns_ = ns[..., None] if np.ndim(ns) else ns
    P0 = (8.0 * np.pi ** 2 / 25.0) * k * c_H0 ** 4 / om_ ** 2 \
        * As_ * (k / K_PIVOT) ** (ns_ - 1.0) * T ** 2
    if growth is None:
        growth, _ = bg.growth_at_z(dens, z, xp)
    # growth: (..., nz); P0: (..., nk) -> (..., nz, nk)
    a, D, _ = bg.growth_tables(dens, xp)
    D0 = D[..., -1]
    g = growth  # already normalized D(z)/D(0)
    # absolute normalization: D(0) (not 1) enters the EdS-normalized formula
    gz = g * (D0[..., None] if np.ndim(D0) else D0)
    return P0[..., None, :] * gz[..., :, None] ** 2


def sigma_tophat(pk_z0, R, xp, window="tophat"):
    """sigma(R) from P(k, z=0) sampled on the static _KQ grid.

    pk_z0: (..., nk) on _KQ; R: static or traced (..., nR).
    """
    k = xp.asarray(_KQ)
    R = xp.asarray(R)
    kR = R[..., :, None] * k  # (..., nR, nk)
    if window == "tophat":
        x = xp.maximum(kR, 1e-8)
        W = 3.0 * (xp.sin(x) - x * xp.cos(x)) / x ** 3
        W2 = W ** 2
    else:  # gaussian
        W2 = xp.exp(-(kR ** 2))
    integrand = pk_z0[..., None, :] * (k ** 3 / (2 * np.pi ** 2)) * W2
    var = xp.sum(0.5 * (integrand[..., 1:] + integrand[..., :-1]),
                 axis=-1) * _DLNK
    return xp.sqrt(var)


def sigma8_0(dens, params, xp):
    """sigma8 today (R = 8/h Mpc top-hat)."""
    pk0 = linear_power(dens, params, _KQ, [0.0], xp)[..., 0, :]
    h = xp.sqrt(dens["h2"])
    R = (8.0 / h)[..., None] if np.ndim(h) else xp.asarray([8.0 / h])
    s = sigma_tophat(pk0, R, xp)
    return s[..., 0]


def halofit_takahashi(dens, params, k, z, pk_lin, xp):
    """Takahashi et al. (2012) halofit P_NL(k, z); pk_lin on the same (z, k).

    The spectral quantities (k_sigma, n_eff, C) come from Gaussian-filtered
    integrals of the z=0 linear power on the static quadrature grid, with
    the sigma(R)=1 condition solved by fixed bisection (jit-friendly).
    """
    k = xp.asarray(k)
    z = np.atleast_1d(np.asarray(z, float))
    pk0 = linear_power(dens, params, _KQ, [0.0], xp)[..., 0, :]
    growth, _ = bg.growth_at_z(dens, z, xp)

    kq = xp.asarray(_KQ)
    d2_base = pk0 * kq ** 3 / (2 * np.pi ** 2)  # Delta^2_lin(k, z=0)

    def sigma2_G(lnR, gz):
        # Gaussian-window variance at R = e^lnR, growth gz; both (..., nz)
        R = xp.exp(lnR)
        kR2 = (R[..., None] * kq) ** 2  # (..., nz, nk)
        integ = d2_base[..., None, :] * xp.exp(-kR2) * (gz ** 2)[..., None]
        return xp.sum(0.5 * (integ[..., 1:] + integ[..., :-1]),
                      axis=-1) * _DLNK

    # bisection for sigma_G(R) = 1 per z (and per batch)
    batch = np.broadcast_shapes(np.shape(dens["om"]), ())
    nz = len(z)
    lo = xp.full(batch + (nz,), np.log(1e-4))
    hi = xp.full(batch + (nz,), np.log(1e2))
    gz = growth  # (..., nz)
    for _ in range(48):
        mid = 0.5 * (lo + hi)
        s2 = sigma2_G(mid, gz)
        too_small = s2 > 1.0  # sigma too big -> R bigger
        lo = xp.where(too_small, mid, lo)
        hi = xp.where(too_small, hi, mid)
    lnR = 0.5 * (lo + hi)
    # n_eff and curvature from log-derivatives of sigma^2(R)
    eps = 0.05
    s2_0 = sigma2_G(lnR, gz)
    s2_p = sigma2_G(lnR + eps, gz)
    s2_m = sigma2_G(lnR - eps, gz)
    dln = (xp.log(s2_p) - xp.log(s2_m)) / (2 * eps)
    d2ln = (xp.log(s2_p) - 2 * xp.log(s2_0) + xp.log(s2_m)) / eps ** 2
    neff = -3.0 - dln
    C = -d2ln
    ksig = 1.0 / xp.exp(lnR)  # (..., nz)

    om = dens["om"][..., None] if np.ndim(dens["om"]) else dens["om"]
    ode = dens["ode"][..., None] if np.ndim(dens["ode"]) else dens["ode"]
    zp1 = (1.0 + z)
    Ez2 = om * zp1 ** 3 + ode + (dens["orad"][..., None] if
                                 np.ndim(dens["orad"]) else
                                 dens["orad"]) * zp1 ** 4
    omz = om * zp1 ** 3 / Ez2  # Omega_m(z), (..., nz)
    odez = ode / Ez2

    # w = -1 throughout, so the (1+w) dark-energy terms of Takahashi
    # eqs. A6-A7 vanish identically
    del odez
    an = 10 ** (1.5222 + 2.8553 * neff + 2.3706 * neff ** 2
                + 0.9903 * neff ** 3 + 0.2250 * neff ** 4
                - 0.6038 * C)
    bn = 10 ** (-0.5642 + 0.5864 * neff + 0.5716 * neff ** 2
                - 1.5474 * C)
    cn = 10 ** (0.3698 + 2.0404 * neff + 0.8161 * neff ** 2 + 0.5869 * C)
    gamma_n = 0.1971 - 0.0843 * neff + 0.8460 * C
    alpha_n = xp.abs(6.0835 + 1.3373 * neff - 0.1959 * neff ** 2
                     - 5.5274 * C)
    beta_n = (2.0379 - 0.7354 * neff + 0.3157 * neff ** 2
              + 1.2490 * neff ** 3 + 0.3980 * neff ** 4 - 0.1682 * C)
    mu_n = 0.0
    nu_n = 10 ** (5.2105 + 3.6902 * neff)
    f1 = omz ** -0.0307
    f2 = omz ** -0.0585
    f3 = omz ** 0.0743

    # y = k / k_sigma; Delta^2_lin(k, z)
    kk = k  # (nk,)
    y = kk / ksig[..., :, None]  # (..., nz, nk)
    d2lin = pk_lin * kk ** 3 / (2 * np.pi ** 2)
    # two-halo (quasi-linear)
    fy = y / 4.0 + y ** 2 / 8.0
    d2q = d2lin * ((1.0 + d2lin) ** beta_n[..., None]
                   / (1.0 + alpha_n[..., None] * d2lin)) * xp.exp(-fy)
    # one-halo
    d2h_prime = (an[..., None] * y ** (3 * f1[..., None])
                 / (1.0 + bn[..., None] * y ** f2[..., None]
                    + (cn[..., None] * f3[..., None] * y)
                    ** (3.0 - gamma_n[..., None])))
    d2h = d2h_prime / (1.0 + mu_n / y
                       + nu_n[..., None] / y ** 2)
    d2nl = d2q + d2h
    return d2nl * (2 * np.pi ** 2) / kk ** 3
