"""Numeric kernels: random rotations and quadratic forms.

Capability parity with /root/reference/cobaya/functions.py (numba-JIT
``random_SO_N`` via Householder chains, BLAS ``chi_squared``, LAPACK
``inverse_cholesky``) — as jittable JAX kernels that batch over walkers and
fuse into the sampling step.  Haar-random SO(N) here uses the QR
decomposition of a Gaussian matrix with the sign-of-diagonal correction
(Mezzadri 2007), which maps onto the MXU, instead of a sequential
Householder chain.
"""

from __future__ import annotations

import numpy as np


def random_SO_N(key, n: int, dtype=None):
    """Haar-random special-orthogonal N x N matrix (jittable).

    vmap over keys for batches of rotations.
    """
    import jax
    import jax.numpy as jnp

    g = jax.random.normal(key, (n, n), dtype=dtype or jnp.float32)
    q, r = jnp.linalg.qr(g)
    # make the distribution Haar: multiply columns by sign(diag(r))
    signs = jnp.sign(jnp.diagonal(r))
    signs = jnp.where(signs == 0, 1.0, signs)
    q = q * signs[None, :]
    # force determinant +1 (SO(N) rather than O(N)): flip first column if -1
    det = jnp.linalg.det(q)
    q = q.at[:, 0].multiply(jnp.sign(det))
    return q


def chi_squared(c_inv, delta):
    """delta^T C^{-1} delta (jittable; batches over leading dims of delta)."""
    import jax.numpy as jnp

    c_inv = jnp.asarray(c_inv)
    delta = jnp.asarray(delta)
    return jnp.einsum("...i,ij,...j->...", delta, c_inv, delta)


def inverse_cholesky_jax(cov):
    """Inverse of the lower Cholesky factor (jittable)."""
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    L = jnp.linalg.cholesky(jnp.asarray(cov))
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return jsl.solve_triangular(L, eye, lower=True)


def fast_logpdf_normal(x, loc, scale):
    """Vectorized normal logpdf (the reference's fast-normal path,
    tools.py:720)."""
    import jax.numpy as jnp

    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * np.log(2 * np.pi)
