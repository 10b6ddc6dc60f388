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
    # unbiased weighted between-chain covariance (= np.cov's C/(C-1) for
    # equal counts, the reference's convention, mcmc.py:864)
    bessel = 1.0 / max(1.0 - float(np.sum(w ** 2)), 1e-12)
    cov_of_means = np.einsum("c,ci,cj->ij", w, dm, dm) * bessel
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
        # same midpoint-position rule as the weighted branch, so uniform
        # explicit weights and None give identical results
        weights = np.ones_like(values)
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


def cl_bounds_stats_jax(ring_x, confidence: float = 0.95):
    """Per-epoch CL-bound statistics over ALL walkers, on device.

    ``ring_x``: (M, C, d) recent thinned records per walker.  Returns the
    sufficient statistics to pool across processes and compute the
    reference's CL-bound R-1 (mcmc.py:918-1002): mean/variance over walkers
    of each confidence bound, the mean per-walker quantile *sampling*
    variance (so the pooled spread can be debiased — each walker's bound is
    estimated from only M records, whereas the reference's chains are long
    enough for that noise to vanish), the walker-averaged in-chain std, and
    the walker count.

    The sampling variance comes from the binomial (distribution-free)
    order-statistic interval: ranks ``r +- s`` with ``s = sqrt(n q (1-q))``
    span one standard deviation of the quantile estimator, so
    ``sd_q ~ (x_(r+s) - x_(r-s)) / 2`` (rescaled when clipped at the edge).
    """
    import jax.numpy as jnp

    n = ring_x.shape[0]
    qs = jnp.asarray([(1 - confidence) / 2, 1 - (1 - confidence) / 2])
    xs_sorted = jnp.sort(ring_x, axis=0)  # (M, C, d)
    # linear-interpolation quantiles from the sorted stack
    pos = qs * (n - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
    frac = (pos - i0)[:, None, None]
    bounds = (xs_sorted[i0] * (1 - frac) + xs_sorted[i0 + 1] * frac)
    # quantile sampling sd via the binomial order-statistic interval
    s = jnp.maximum(jnp.sqrt(n * qs * (1 - qs)), 1.0)
    r = jnp.round(pos).astype(jnp.int32)
    lo = jnp.clip(r - jnp.round(s).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(r + jnp.round(s).astype(jnp.int32), 0, n - 1)
    span = jnp.maximum((hi - lo).astype(ring_x.dtype), 1.0)
    sd_q = (xs_sorted[hi] - xs_sorted[lo]) * (s / span)[:, None, None]
    var_q = sd_q ** 2
    # records may be autocorrelated (early, before the ring stride has
    # grown): inflate the sampling variance by the AR(1) effective-sample
    # deflation (1+rho)/(1-rho), capped to keep the statistic informative
    mu = ring_x.mean(axis=0)
    dx = ring_x - mu
    denom = jnp.maximum((dx ** 2).sum(axis=0), 1e-30)
    rho = (dx[:-1] * dx[1:]).sum(axis=0) / denom  # (C, d)
    kappa = jnp.clip((1 + rho) / jnp.maximum(1 - rho, 1e-3), 1.0, 16.0)
    var_q = var_q * kappa[None]
    stds = jnp.std(ring_x, axis=0)  # (C, d)
    return (bounds.mean(axis=1), bounds.var(axis=1), var_q.mean(axis=1),
            stds.mean(axis=0), jnp.asarray(ring_x.shape[1], jnp.float32))


def pool_cl_bounds_stats(per_proc) -> float:
    """Combine per-process CL-bound statistics into the global R-1.

    Each entry: (mean_bounds (2, d), var_bounds (2, d), var_q (2, d),
    mean_std (d,), count).  The pooled across-walker variance adds the
    between-process spread of the bound means and subtracts the pooled
    per-walker quantile sampling variance (debias, see
    :func:`cl_bounds_stats_jax`).
    """
    ws = np.array([float(p[4]) for p in per_proc])
    w = ws / max(ws.sum(), 1e-30)
    mean_b = sum(wi * np.asarray(p[0]) for wi, p in zip(w, per_proc))
    var_b = sum(
        wi * (np.asarray(p[1]) + (np.asarray(p[0]) - mean_b) ** 2)
        for wi, p in zip(w, per_proc)
    )
    var_q = sum(wi * np.asarray(p[2]) for wi, p in zip(w, per_proc))
    mean_std = sum(wi * np.asarray(p[3]) for wi, p in zip(w, per_proc))
    var_adj = np.maximum(var_b - var_q, 0.0)
    rminus1 = np.sqrt(var_adj) / np.maximum(mean_std, 1e-300)
    return float(rminus1.max())


def rminus1_cl_bounds(
    samples_per_chain: np.ndarray,
    weights_per_chain: np.ndarray | None,
    confidence: float = 0.95,
) -> np.ndarray:
    """R-1 of the upper/lower CL bounds across chains, per parameter.

    samples_per_chain: (C, n, d) thinned stored samples;
    weights_per_chain: (C, n) or None.
    Returns a (d,) array: per parameter, the max over the two bounds of
    ``std_over_chains(bound) / mean_over_chains(chain_std)`` (reference
    mcmc.py:918-1002); callers reduce with ``.max()`` for the scalar test.
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
