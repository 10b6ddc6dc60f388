"""Vmapped Hamiltonian Monte Carlo epoch kernel.

A capability beyond the reference (which has no gradient-based sampler):
this framework's posteriors are differentiable end-to-end when all
components are jittable, so HMC leapfrog trajectories run on device for
thousands of walkers at once.  The mass matrix is the learned posterior
covariance (the same adaptation pipeline as the Metropolis proposal), and
the step size adapts on the host between epochs toward a target acceptance.

Kernel contract matches ops.metropolis: ``epoch(carry, schedule,
mass_chol, eps)`` with the same carry/record pytrees, so the HMC sampler
reuses the whole MCMC infrastructure (records, moments, R-1, checkpoints).
"""

from __future__ import annotations

from typing import Callable

from . import moments as mom_ops
from .metropolis import MCMCCarry, make_epoch_record


def make_hmc_epoch_fn(
    logpost_fn: Callable,
    periodic_wrap: Callable | None,
    temperature: float = 1.0,
    n_leapfrog: int = 16,
    record_keep: int | None = None,
    full_x_records: bool = False,
) -> Callable:
    """Build the jittable HMC epoch function.

    ``logpost_fn(x) -> (logpost, logpriors, loglikes, derived)``; the
    tempered target is ``sum(logpriors) + sum(loglikes)/T``.  Momenta are
    drawn with covariance M (``p = mass_chol @ z``), so the kinetic energy
    is ``z^T z / 2`` at draw time and ``p^T M^{-1} p / 2`` along the
    trajectory (triangular solves against ``mass_chol``).
    """
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    inv_T = 1.0 / float(temperature)

    def tempered(x):
        _, lpri, llik, _ = logpost_fn(x)
        # full-posterior tempering (reference collection.py:75-84);
        # T==1 keeps the exact jaxpr (compile-cache stability)
        if temperature == 1:
            return jnp.sum(lpri) + inv_T * jnp.sum(llik)
        return inv_T * (jnp.sum(lpri) + jnp.sum(llik))

    value_and_grad = jax.value_and_grad(tempered)

    # Mass matrix M = Sigma^{-1} (Sigma = learned posterior covariance,
    # cov_chol = chol(Sigma)): momenta p ~ N(0, Sigma^{-1}) are drawn as
    # p = cov_chol^{-T} z; position updates dx = M^{-1} p = Sigma p scale
    # with the posterior widths; kinetic = p^T Sigma p / 2 = |cov_chol^T p|^2/2.
    def one_step(carry_w, draws, cov_chol, eps):
        x, tlp, lpri, llik, der = carry_w
        # all randomness is drawn batched by the caller (one key per batch,
        # not per walker): z momenta, step-size jitter, accept exponential
        z, eps_jitter, expdraw = draws
        # per-trajectory step-size jitter (standard: breaks resonances and
        # lets mis-scaled walkers find acceptable trajectories)
        eps = eps * eps_jitter
        p = jsl.solve_triangular(cov_chol.T, z, lower=False)
        kinetic0 = 0.5 * jnp.sum(z * z)
        # leapfrog
        tlp0, grad = value_and_grad(x)

        def leap(i, state):
            x, p, grad = state
            p_half = p + 0.5 * eps * grad
            dx = cov_chol @ (cov_chol.T @ p_half)
            x_new = x + eps * dx
            tlp_new, grad_new = value_and_grad(x_new)
            p_new = p_half + 0.5 * eps * grad_new
            return x_new, p_new, grad_new

        x_new, p_new, _ = jax.lax.fori_loop(0, n_leapfrog, leap,
                                            (x, p, grad))
        if periodic_wrap is not None:
            x_new = periodic_wrap(x_new)
        lp_new, lpri_new, llik_new, der_new = logpost_fn(x_new)
        tlp_new = (jnp.sum(lpri_new) + inv_T * jnp.sum(llik_new)
                   if temperature == 1 else
                   inv_T * (jnp.sum(lpri_new) + jnp.sum(llik_new)))
        u_new = cov_chol.T @ p_new
        kinetic_new = 0.5 * jnp.sum(u_new * u_new)
        dH = (tlp_new - kinetic_new) - (tlp - kinetic0)
        ok = jnp.isfinite(tlp_new) & jnp.isfinite(kinetic_new)
        accept = ok & ((dH > 0) | (expdraw > -dH))
        sel = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new, old
        )
        return (accept,
                jnp.where(accept, 0.0, 1.0),  # weight increment marker
                sel(x_new, x), jnp.where(accept, tlp_new, tlp),
                sel(lpri_new, lpri), sel(llik_new, llik),
                sel(der_new, der))

    step_batch = jax.vmap(
        one_step, in_axes=((0, 0, 0, 0, 0), (0, 0, 0), None, None))

    def epoch(carry: MCMCCarry, schedule, mass_chol, eps):
        n_rec, thin = schedule.shape

        def inner(carry: MCMCCarry, _):
            key_next, k_mom, k_eps, k_acc = jax.random.split(carry.key, 4)
            draws = (
                jax.random.normal(k_mom, carry.x.shape,
                                  dtype=carry.x.dtype),
                jax.random.uniform(k_eps, carry.logpost.shape,
                                   dtype=carry.x.dtype,
                                   minval=0.5, maxval=1.5),
                jax.random.exponential(k_acc, carry.logpost.shape,
                                       dtype=carry.x.dtype),
            )
            (accept, rej, x, tlp, lpri, llik, der) = step_batch(
                (carry.x, carry.logpost, carry.logpriors,
                 carry.loglikes, carry.derived), draws, mass_chol, eps,
            )
            return MCMCCarry(
                key=key_next, x=x, logpost=tlp, logpriors=lpri,
                loglikes=llik,
                derived=der,
                weight=jnp.where(accept, 1.0, carry.weight + 1.0),
                n_accepted=carry.n_accepted + accept,
                rejects_streak=jnp.where(
                    accept, 0, carry.rejects_streak + 1
                ),
                mom=carry.mom, mom2=carry.mom2, cache=carry.cache,
            ), None

        def outer(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None, length=thin)
            carry = carry._replace(
                mom=mom_ops.update(carry.mom, carry.x),
                mom2=mom_ops.update(carry.mom2, carry.x),
            )
            rec = make_epoch_record(carry, keep=record_keep,
                                    full_x=full_x_records)
            return carry, rec

        return jax.lax.scan(outer, carry, None, length=n_rec)

    return epoch
