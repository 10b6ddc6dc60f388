"""Ensemble independence-remix move: O(1)-epoch burn-in for walker fleets.

The reference runs a handful of MPI chains, so the slowest chain's burn-in
is statistically typical (reference mcmc.py:773 gathers a few means/covs).
A TPU fleet runs thousands of vmapped walkers, and convergence is gated by
the *slowest straggler*: with 8k dispersed starts the max Mahalanobis
distance of the initial cloud is far in the tail, and a random-walk
Metropolis straggler needs O((distance/step)^2) steps to reach the typical
set.  This is a failure mode the reference never faces — it is created by
the massive-walker design, so the framework owns the cure.

The cure is a classic interacting-ensemble move (the red-black split of
Goodman & Weare 2010 / ter Braak's DE-MCMC, arXiv:1202.3665): split the
walkers in two halves; propose for each walker of half A an *independence*
draw from a Gaussian fitted to the CURRENT positions of half B (and vice
versa), accepted with the exact Metropolis-Hastings ratio

    log r = [lp(x') - lp(x)] + [log q(x) - log q(x')].

Because the proposal for half A depends only on half B's state, each half's
update is a valid MH kernel on the product chain (same argument as the
reference-independent emcee stretch move), so detailed balance w.r.t. the
product posterior is exact — at ANY cadence, not just during burn-in.

Behavior: a straggler has posterior mass pi(x) astronomically below typical
while q(x) is only polynomially small, so the importance ratio
pi(x)/q(x) ~ 0 and any proposed bulk point is accepted with probability
~ 1: stragglers teleport into the bulk in one application.  For bulk
walkers the move is a near-perfect independence sampler once the cloud
approximates the posterior, which also collapses the autocorrelation time
of the slowest directions.

Cost: two batched posterior evaluations per application (one per half),
~ 2/learn_every of an epoch's work at the default once-per-epoch cadence.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from .metropolis import MCMCCarry, tempered_logpost


def make_remix_fn(
    logpost_fn: Callable,
    full_eval: Callable | None = None,
    temperature: float = 1.0,
    inflate: float = 1.2,
    matmul_precision: str | None = "highest",
) -> Callable:
    """Build the jittable remix kernel.

    ``remix(carry) -> (carry, accept_frac)``; every array op runs on
    device.  ``full_eval`` (from ``Model.make_blocked_logposterior_fn``)
    keeps the per-walker component cache consistent for blocked samplers.
    ``inflate`` widens the fitted proposal for tail coverage; the MH
    correction keeps the move exact for any value.
    """
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    def eval_batch(xs):
        if full_eval is not None:
            lp, lpri, llik, der, cache = jax.vmap(full_eval)(xs)
        else:
            lp, lpri, llik, der = jax.vmap(logpost_fn)(xs)
            cache = ()
        return tempered_logpost(lpri, llik, temperature), lpri, llik, der, \
            cache

    def fit(xh):
        # moments of the complementary half; proposal covariance slightly
        # inflated, with a relative-jitter floor so early degenerate clouds
        # still factor
        mu = jnp.mean(xh, axis=0)
        dx = xh - mu
        cov = jnp.einsum("ci,cj->ij", dx, dx) / max(xh.shape[0] - 1, 1)
        cov = cov * (inflate ** 2)
        d = cov.shape[0]
        cov = cov + jnp.eye(d, dtype=cov.dtype) * (
            1e-6 * jnp.diag(cov) + 1e-30)
        return mu, jnp.linalg.cholesky(cov)

    def logq(x, mu, L):
        z = solve_triangular(L, (x - mu).T, lower=True)
        return -0.5 * jnp.sum(z * z, axis=0) \
            - jnp.sum(jnp.log(jnp.diagonal(L)))

    def take(tree, sl):
        return jax.tree_util.tree_map(lambda a: a[sl], tree)

    def update_half(key, half, other_x):
        """One MH independence update of ``half`` (a carry slice)."""
        x = half["x"]
        C2, d = x.shape
        mu, L = fit(other_x)
        k_prop, k_acc = jax.random.split(key)
        eps = jax.random.normal(k_prop, (C2, d), dtype=x.dtype)
        trial = mu + jnp.einsum("ci,ji->cj", eps, L)
        tlp_t, lpri_t, llik_t, der_t, cache_t = eval_batch(trial)
        prior_ok = jnp.isfinite(jnp.sum(lpri_t, axis=-1))
        log_r = (tlp_t - half["logpost"]) + (logq(x, mu, L)
                                             - logq(trial, mu, L))
        expdraw = jax.random.exponential(k_acc, (C2,), dtype=x.dtype)
        accept = prior_ok & jnp.isfinite(tlp_t) & (expdraw > -log_r)

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    accept.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                new, old)

        out = dict(half)
        out["x"] = sel(trial, x)
        out["logpost"] = jnp.where(accept, tlp_t, half["logpost"])
        out["logpriors"] = sel(lpri_t, half["logpriors"])
        out["loglikes"] = sel(llik_t, half["loglikes"])
        out["derived"] = sel(der_t, half["derived"])
        # an accepted teleport starts a fresh point: weight restarts, the
        # stuck-walker streak clears; n_accepted is left to the scheduled
        # steps so the acceptance-rate diagnostic keeps its meaning
        out["weight"] = jnp.where(accept, jnp.ones_like(half["weight"]),
                                  half["weight"])
        out["rejects_streak"] = jnp.where(
            accept, jnp.zeros_like(half["rejects_streak"]),
            half["rejects_streak"])
        if half["cache"]:
            out["cache"] = sel(cache_t, half["cache"])
        return out, jnp.mean(accept.astype(jnp.float32))

    def remix(carry: MCMCCarry):
        # the fitted-cloud matmuls and logq cancellations need full-f32 MXU
        # passes for the same reason the posterior does (model.py note)
        if matmul_precision:
            with jax.default_matmul_precision(matmul_precision):
                return remix_body(carry)
        return remix_body(carry)

    def remix_body(carry: MCMCCarry):
        C = carry.x.shape[0]
        C2 = C // 2
        key_next, k_a, k_b = jax.random.split(carry.key, 3)
        fields = {"x": carry.x, "logpost": carry.logpost,
                  "logpriors": carry.logpriors, "loglikes": carry.loglikes,
                  "derived": carry.derived, "weight": carry.weight,
                  "rejects_streak": carry.rejects_streak,
                  "cache": carry.cache}
        half_a = take(fields, np.s_[:C2])
        half_b = take(fields, np.s_[C2:])
        # sequential red-black: A updates against B's current state, then
        # B against A's UPDATED state (both are valid MH kernels)
        half_a, acc_a = update_half(k_a, half_a, half_b["x"])
        half_b, acc_b = update_half(k_b, half_b, half_a["x"])

        def cat(a, b):
            return jax.tree_util.tree_map(
                lambda u, v: jnp.concatenate([u, v], axis=0), a, b)

        merged = cat(half_a, half_b)
        new_carry = carry._replace(
            key=key_next, x=merged["x"], logpost=merged["logpost"],
            logpriors=merged["logpriors"], loglikes=merged["loglikes"],
            derived=merged["derived"], weight=merged["weight"],
            rejects_streak=merged["rejects_streak"],
            cache=merged["cache"] if carry.cache else carry.cache,
        )
        return new_carry, 0.5 * (acc_a + acc_b)

    return remix
