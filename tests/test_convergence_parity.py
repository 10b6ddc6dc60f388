"""R-1 estimator parity against the reference's formulas.

The reference computes its convergence diagnostics from the literal second
half of each chain (/root/reference/cobaya/samplers/mcmc/mcmc.py:773-1032);
this repo computes them from streaming moment windows and weighted-quantile
rings.  These tests feed both estimators the *same* stored chains and
assert agreement within stated tolerances, closing the "drop-in
comparable" claim.
"""

import numpy as np

from cobaya_tpu.ops import moments as mom_ops
from cobaya_tpu.ops.convergence import (
    rminus1_cl_bounds, rminus1_from_covs, rminus1_of_moments,
    weighted_quantile)


def _make_chains(C=6, n=4000, d=4, seed=0, spread=0.05):
    """Weighted chains from slightly offset Gaussians (known R-1 regime)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(d, d))
    cov = A @ A.T + d * np.eye(d)
    L = np.linalg.cholesky(cov)
    chains = []
    for c in range(C):
        mu = rng.normal(0, spread, d)
        x = mu + rng.normal(size=(n, d)) @ L.T
        w = rng.integers(1, 5, n).astype(float)  # repeat-count weights
        chains.append((x, w))
    return chains


def _oracle_rminus1_means(chains):
    """Reference second-half means R-1, re-derived from mcmc.py:788-908:
    weighted per-chain mean/cov (aweights), W = Ns-weighted average of
    covs, B = unweighted np.cov of the means (ddof=1), R-1 = max |eig| of
    Linv B' Linv^T with L the Cholesky of the correlation-normalized W."""
    means, covs, Ns = [], [], []
    for x, w in chains:
        cut = len(x) // 2
        xs, ws = x[cut:], w[cut:]
        means.append(np.average(xs, axis=0, weights=ws))
        covs.append(np.cov(xs.T, aweights=ws))
        Ns.append(ws.sum())
    Ns = np.asarray(Ns)
    mean_of_covs = np.average(covs, weights=Ns, axis=0)
    cov_of_means = np.atleast_2d(np.cov(np.asarray(means).T))
    dd = np.sqrt(np.diag(cov_of_means))
    corr_of_means = (cov_of_means / dd).T / dd
    norm_mean_of_covs = (mean_of_covs / dd).T / dd
    Linv = np.linalg.inv(np.linalg.cholesky(norm_mean_of_covs))
    eigvals = np.linalg.eigvalsh(Linv @ corr_of_means @ Linv.T)
    return float(np.max(np.abs(eigvals))), mean_of_covs, \
        np.asarray(means), np.asarray(covs), Ns


def _oracle_rminus1_cl(chains, mean_of_covs, confidence=0.95):
    """Reference CL-bounds R-1 (mcmc.py:930-1002): per-chain two-tail
    weighted confidence limits of the second half; R-1 = max over params/
    bounds of std(bounds across chains)/sqrt(diag(W))."""
    lim = (1 - confidence) / 2
    bounds = []
    for x, w in chains:
        cut = len(x) // 2
        xs, ws = x[cut:], w[cut:]
        b = np.empty((2, xs.shape[1]))
        for j in range(xs.shape[1]):
            order = np.argsort(xs[:, j])
            v, wo = xs[order, j], ws[order]
            cw = np.cumsum(wo)
            # getdist-style: value where the cumulative weight fraction
            # reaches the tail fraction
            b[0, j] = np.interp(lim * cw[-1], cw, v)
            b[1, j] = np.interp((1 - lim) * cw[-1], cw, v)
        bounds.append(b)
    bounds = np.asarray(bounds)  # (C, 2, d)
    r = np.std(bounds, axis=0) / np.sqrt(np.diag(mean_of_covs))
    return float(np.max(r))


def test_rminus1_means_same_inputs_exact():
    """Given identical per-chain means/covs, the eigen machinery matches
    the reference's to numerical precision (the two normalizations are the
    same generalized eigenproblem)."""
    chains = _make_chains(seed=1)
    oracle, mean_of_covs, means, covs, Ns = _oracle_rminus1_means(chains)
    cov_of_means = np.atleast_2d(np.cov(means.T))
    ours = rminus1_from_covs(mean_of_covs, cov_of_means)
    np.testing.assert_allclose(ours, oracle, rtol=1e-9)


def test_rminus1_means_moment_accumulators():
    """Second-half chains streamed through the moment accumulators
    reproduce the reference estimator within 2%% (the residual difference
    is the weighted-vs-np.cov ddof convention)."""
    import jax.numpy as jnp

    chains = _make_chains(C=6, n=4000, d=4, seed=2)
    oracle, *_ = _oracle_rminus1_means(chains)
    halves = [(x[len(x) // 2:], w[len(w) // 2:]) for x, w in chains]
    n = min(len(x) for x, _ in halves)
    xs = jnp.asarray(np.stack([x[:n] for x, _ in halves]))  # (C, n, d)
    ws = jnp.asarray(np.stack([w[:n] for _, w in halves]))
    m = mom_ops.init(xs[:, 0, :])
    for t in range(n):
        m = mom_ops.update(m, xs[:, t, :], ws[:, t])
    ours = rminus1_from_covs(
        np.asarray(mom_ops.mean_of_covs(m)),
        np.asarray(mom_ops.cov_of_means(m, weighted=True)),
    )
    np.testing.assert_allclose(ours, oracle, rtol=0.02)
    # host-mirror path from the extracted per-chain statistics
    means_h = np.asarray(mom_ops.mean(m))
    covs_h = np.stack([
        np.cov(np.asarray(xs[c]).T, aweights=np.asarray(ws[c]))
        for c in range(xs.shape[0])
    ])
    counts = np.asarray(ws.sum(axis=1))
    ours_host = rminus1_of_moments(counts, means_h, covs_h)
    np.testing.assert_allclose(ours_host, oracle, rtol=0.02)


def test_rminus1_cl_bounds_parity():
    """The weighted-quantile CL-bound statistic matches the reference's
    getdist-interval formula on the same chains within 5%% + interpolation
    noise."""
    chains = _make_chains(C=8, n=6000, d=3, seed=3, spread=0.1)
    _, mean_of_covs, *_ = _oracle_rminus1_means(chains)
    oracle = _oracle_rminus1_cl(chains, mean_of_covs)
    halves = [(x[len(x) // 2:], w[len(w) // 2:]) for x, w in chains]
    n = min(len(x) for x, _ in halves)
    samples = np.stack([x[:n] for x, _ in halves])
    weights = np.stack([w[:n] for _, w in halves])
    per_param = rminus1_cl_bounds(samples, weights)
    # our statistic normalizes by the mean in-chain std; the reference by
    # sqrt(diag(mean-of-covs)) — rescale to compare the bound spreads
    ours = float(np.max(per_param * _mean_std(samples, weights)
                        / np.sqrt(np.diag(mean_of_covs))))
    assert abs(ours - oracle) < 0.05 * max(oracle, 0.05), (ours, oracle)


def _mean_std(samples, weights):
    C, n, d = samples.shape
    stds = np.empty((C, d))
    for c in range(C):
        mu = np.average(samples[c], axis=0, weights=weights[c])
        stds[c] = np.sqrt(np.average((samples[c] - mu) ** 2, axis=0,
                                     weights=weights[c]))
    return stds.mean(axis=0)


def test_grouped_between_within_math():
    """grouped_between_within matches a naive numpy superchain computation
    (nested R-hat sufficient statistics, arXiv:2110.13017)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    C, d, G = 24, 3, 4
    S = C // G
    n = 50
    xs = rng.normal(size=(C, n, d)) + rng.normal(0, 0.3, size=(C, 1, d))
    m = mom_ops.init(jnp.asarray(xs[:, 0, :]))
    for t in range(n):
        m = mom_ops.update(m, jnp.asarray(xs[:, t, :]))
    B, V = mom_ops.grouped_between_within(m, G)
    # naive: equal counts
    means = xs.mean(axis=1)  # (C, d)
    Mg = means.reshape(G, S, d).mean(axis=1)  # (G, d)
    B_ref = np.cov(Mg.T, ddof=1)
    dm = means.reshape(G, S, d) - Mg[:, None, :]
    V_ref = np.einsum("gsi,gsj->ij", dm, dm) / C * (S / (S - 1))
    np.testing.assert_allclose(np.asarray(B), B_ref, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(V), V_ref, rtol=1e-4, atol=1e-7)


def test_nested_rminus1_noise_floor_vs_per_walker():
    """At stationarity, per-walker R-1 is floored at ~tau/n while the
    grouped statistic's floor drops by the group size — the property that
    makes R-1 < 0.01 reachable for fleets of short chains."""
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    C, d, n, G = 512, 3, 25, 16  # 32 walkers per superchain
    xs = rng.normal(size=(C, n, d))  # iid: perfectly mixed, tau = 1
    m = mom_ops.init(jnp.asarray(xs[:, 0, :]))
    for t in range(n):
        m = mom_ops.update(m, jnp.asarray(xs[:, t, :]))
    r_walker = rminus1_from_covs(
        np.asarray(mom_ops.mean_of_covs(m)),
        np.asarray(mom_ops.cov_of_means(m)))
    B, V = mom_ops.grouped_between_within(m, G)
    r_grouped = rminus1_from_covs(
        np.asarray(mom_ops.mean_of_covs(m)) + np.asarray(V), np.asarray(B))
    # per-walker floor ~ 1/n (plus eigenvalue-max inflation over d dims)
    assert r_walker > 1.0 / n, r_walker
    # grouped floor ~ 1/(n*S): at least 8x below per-walker here
    assert r_grouped < r_walker / 8, (r_grouped, r_walker)


def test_nested_rminus1_detects_initialization_bias():
    """Superchains with group-clustered offsets (walkers that have not yet
    forgotten shared starting points) must fail the grouped test loudly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    C, d, n, G = 256, 3, 25, 8
    S = C // G
    offsets = np.repeat(rng.normal(0, 1.0, size=(G, d)), S, axis=0)
    xs = rng.normal(size=(C, n, d)) + offsets[:, None, :]
    m = mom_ops.init(jnp.asarray(xs[:, 0, :]))
    for t in range(n):
        m = mom_ops.update(m, jnp.asarray(xs[:, t, :]))
    B, V = mom_ops.grouped_between_within(m, G)
    r_grouped = rminus1_from_covs(
        np.asarray(mom_ops.mean_of_covs(m)) + np.asarray(V), np.asarray(B))
    assert r_grouped > 0.5, r_grouped


def test_weighted_quantile_matches_getdist_convention():
    """weighted_quantile's midpoint rule agrees with the cumulative-weight
    interpolation getdist uses to O(1/n)."""
    rng = np.random.default_rng(4)
    v = rng.normal(size=5000)
    w = rng.integers(1, 6, 5000).astype(float)
    for q in (0.025, 0.5, 0.975):
        ours = float(weighted_quantile(v, [q], w)[0])
        order = np.argsort(v)
        cw = np.cumsum(w[order])
        ref = float(np.interp(q * cw[-1], cw, v[order]))
        assert abs(ours - ref) < 0.02, (q, ours, ref)
