"""Gelman-Rubin style convergence diagnostics over many chains.

Capability parity with the reference's convergence test
(/root/reference/cobaya/samplers/mcmc/mcmc.py:773-1032): R-1 on chain means,
computed as the largest |eigenvalue| of ``Linv @ cov(means) @ Linv.T`` where
``L`` is the Cholesky factor of the mean of the per-chain covariances, plus a
secondary R-1 on confidence-level bounds.

TPU-first: the primary statistic is computed on-device from the per-chain
moment accumulators (one jitted call, no chain history needed); across chips
the accumulators reduce with a single ``psum``.  The CL-bound statistic uses
weighted quantiles over the (thinned) stored samples.
"""

from __future__ import annotations

import numpy as np


def rminus1_of_moments_jax(mean_of_covs, cov_of_means):
    """R-1 of chain means (jittable).

    Follows the reference formula: normalize the covariance of the means by
    the mean of the (within-chain) covariances through its Cholesky factor
    and take the largest eigenvalue.
    """
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    # normalize: norm = diag(std); work with correlation-scaled matrices for
    # numerical stability (reference mcmc.py:856-908)
    std = jnp.sqrt(jnp.diagonal(mean_of_covs))
    norm = jnp.outer(std, std)
    corr_mean_covs = mean_of_covs / norm
    corr_cov_means = cov_of_means / norm
    L = jnp.linalg.cholesky(corr_mean_covs)
    Linv_cm = jsl.solve_triangular(L, corr_cov_means, lower=True)
    Linv_cm_LinvT = jsl.solve_triangular(L, Linv_cm.T, lower=True).T
    eigs = jnp.linalg.eigvalsh((Linv_cm_LinvT + Linv_cm_LinvT.T) / 2)
    return jnp.max(jnp.abs(eigs))


def rminus1_from_covs(mean_of_covs, cov_of_means) -> float:
    """Host (numpy) mirror of :func:`rminus1_of_moments_jax` — used to
    recompute R-1 after pooling window statistics across processes."""
    from scipy.linalg import solve_triangular

    std = np.sqrt(np.diagonal(mean_of_covs))
    norm = np.outer(std, std)
    cmc = np.asarray(mean_of_covs) / norm
    ccm = np.asarray(cov_of_means) / norm
    L = np.linalg.cholesky(cmc)
    Linv_cm = solve_triangular(L, ccm, lower=True)
    A = solve_triangular(L, Linv_cm.T, lower=True).T
    eigs = np.linalg.eigvalsh((A + A.T) / 2)
    return float(np.max(np.abs(eigs)))


def rminus1_of_moments(counts, means, covs, weighted: bool = True) -> float:
    """Host/numpy version (used at checkpoint time and in tests)."""
    counts = np.asarray(counts, float)
    means = np.asarray(means, float)
    covs = np.asarray(covs, float)
    w = counts / counts.sum() if weighted else np.full(len(counts),
                                                       1 / len(counts))
    mean_of_covs = np.einsum("c,cij->ij", w, covs)
    mean_of_means = np.einsum("c,ci->i", w, means)
    dm = means - mean_of_means
    cov_of_means = np.einsum("c,ci,cj->ij", w, dm, dm)
    std = np.sqrt(np.diag(mean_of_covs))
    if np.any(~np.isfinite(std)) or np.any(std == 0):
        return np.inf
    norm = np.outer(std, std)
    try:
        L = np.linalg.cholesky(mean_of_covs / norm)
    except np.linalg.LinAlgError:
        return np.inf
    Linv = np.linalg.inv(L)
    M = Linv @ (cov_of_means / norm) @ Linv.T
    return float(np.max(np.abs(np.linalg.eigvalsh((M + M.T) / 2))))


def weighted_quantile(values: np.ndarray, quantiles, weights=None):
    """Weighted quantile(s) along the last axis (host/numpy).

    Used for confidence-level bounds (getdist-equivalent capability for the
    secondary R-1 test).  values: (..., n); weights broadcastable to values.
    """
    values = np.asarray(values, float)
    q = np.atleast_1d(quantiles)
    if weights is None:
        return np.quantile(values, q, axis=-1)
    weights = np.broadcast_to(np.asarray(weights, float), values.shape)
    order = np.argsort(values, axis=-1)
    v_sorted = np.take_along_axis(values, order, axis=-1)
    w_sorted = np.take_along_axis(weights, order, axis=-1)
    cw = np.cumsum(w_sorted, axis=-1)
    total = cw[..., -1:]
    # position of each sample in [0, 1]: midpoint rule
    pos = (cw - 0.5 * w_sorted) / total
    out = np.empty(q.shape + values.shape[:-1])
    it = np.ndindex(values.shape[:-1])
    for idx in it:
        out[(slice(None),) + idx] = np.interp(q, pos[idx], v_sorted[idx])
    return out


def rminus1_cl_bounds(
    samples_per_chain: np.ndarray,
    weights_per_chain: np.ndarray | None,
    confidence: float = 0.95,
) -> np.ndarray:
    """R-1 of the upper/lower CL bounds across chains, per parameter.

    samples_per_chain: (C, n, d) thinned stored samples;
    weights_per_chain: (C, n) or None.
    Returns max over parameters and both bounds of
    ``std_over_chains(bound) / mean_over_chains(chain_std)`` (reference
    mcmc.py:918-1002).
    """
    C, n, d = samples_per_chain.shape
    qs = [(1 - confidence) / 2, 1 - (1 - confidence) / 2]
    bounds = np.empty((2, C, d))
    stds = np.empty((C, d))
    for c in range(C):
        w = None if weights_per_chain is None else weights_per_chain[c]
        for j in range(d):
            bounds[:, c, j] = weighted_quantile(
                samples_per_chain[c, :, j], qs, w
            )
            if w is None:
                stds[c, j] = samples_per_chain[c, :, j].std()
            else:
                mu = np.average(samples_per_chain[c, :, j], weights=w)
                stds[c, j] = np.sqrt(
                    np.average((samples_per_chain[c, :, j] - mu) ** 2,
                               weights=w)
                )
    mean_std = stds.mean(axis=0)
    rminus1 = np.abs(bounds.std(axis=1)) / np.maximum(mean_std, 1e-300)
    return rminus1.max(axis=0)  # (d,) per-parameter
