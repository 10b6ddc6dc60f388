"""Traced interpolation primitives (device-side likelihood tables).

The reference evaluates tabulated likelihoods with scipy splines on the host
(/root/reference/cobaya/likelihoods/base_classes/bao.py:179-240).  Here the
spline *fit* happens once at initialization on the host, and evaluation is a
pure jnp computation over precomputed coefficient tables — static shapes,
gather + fused polynomial — so tabulated likelihoods run inside the jitted
sampler epoch, batched over walkers.
"""

from __future__ import annotations

import numpy as np


class TracedSpline1D:
    """Interpolating cubic spline with traced evaluation.

    Coefficients are computed once with scipy (not-a-knot ends, matching
    an interpolating ``UnivariateSpline(s=0)``); ``__call__`` is jittable
    and returns ``out_of_bounds`` beyond the knot range.
    """

    def __init__(self, x, y, out_of_bounds=-np.inf):
        from scipy.interpolate import CubicSpline

        self.x = np.asarray(x, float)
        self.out_of_bounds = float(out_of_bounds)
        self._c = np.asarray(CubicSpline(self.x, np.asarray(y, float)).c)

    def __call__(self, v):
        import jax.numpy as jnp

        x = jnp.asarray(self.x)
        c = jnp.asarray(self._c)  # (4, n-1)
        v = jnp.asarray(v)
        idx = jnp.clip(jnp.searchsorted(x, v, side="right") - 1,
                       0, len(self.x) - 2)
        t = v - x[idx]
        val = ((c[0, idx] * t + c[1, idx]) * t + c[2, idx]) * t + c[3, idx]
        inside = (v >= self.x[0]) & (v <= self.x[-1])
        return jnp.where(inside, val, self.out_of_bounds)


class TracedLinearGridInterp:
    """Multilinear interpolation on a regular (rectilinear) grid, traced.

    Same math as ``scipy.interpolate.RegularGridInterpolator`` with
    ``method='linear'``; out-of-range queries return ``fill_value``.
    """

    def __init__(self, points, values, fill_value=-np.inf):
        self.points = [np.asarray(p, float) for p in points]
        self.values = np.asarray(values, float)
        self.fill_value = float(fill_value)
        assert self.values.shape == tuple(len(p) for p in self.points)

    def __call__(self, *coords):
        import jax.numpy as jnp

        vals = jnp.asarray(self.values)
        idxs, weights, inside = [], [], True
        for p, c in zip(self.points, coords):
            grid = jnp.asarray(p)
            c = jnp.asarray(c)
            i = jnp.clip(jnp.searchsorted(grid, c, side="right") - 1,
                         0, len(p) - 2)
            w = (c - grid[i]) / (grid[i + 1] - grid[i])
            idxs.append(i)
            weights.append(w)
            inside = inside & (c >= p[0]) & (c <= p[-1])
        out = 0.0
        ndim = len(self.points)
        for corner in range(2 ** ndim):
            bits = [(corner >> d) & 1 for d in range(ndim)]
            idx = tuple(i + b for i, b in zip(idxs, bits))
            w = 1.0
            for d, b in enumerate(bits):
                w = w * (weights[d] if b else (1.0 - weights[d]))
            out = out + w * vals[idx]
        return jnp.where(inside, out, self.fill_value)


def densify_spline_2d(spline, x, y, refine: int = 8):
    """Sample a host 2-D spline onto a refined grid for traced bilinear use.

    The refined sampling keeps the cubic shape to ~(dx/refine)^2 accuracy
    while letting evaluation be a pure traced gather (no spline state).
    """
    xs = np.linspace(x[0], x[-1], (len(x) - 1) * refine + 1)
    ys = np.linspace(y[0], y[-1], (len(y) - 1) * refine + 1)
    table = spline(xs, ys)
    return xs, ys, np.asarray(table)
