"""Vmapped blocked-Metropolis epoch kernel.

The TPU-first replacement for the reference's per-point Python step loop
(/root/reference/cobaya/samplers/mcmc/mcmc.py:451-748): an entire *epoch* of
steps for thousands of independent walkers is one jitted two-level
``lax.scan`` (outer scan emits a thinned record, inner scan advances ``thin``
raw steps), with the proposal covariance, block schedule and RNG state as
explicit inputs so learned-proposal updates never trigger recompilation.

Acceptance follows the reference Metropolis rule (mcmc.py:670): accept if the
tempered log-posterior improves, or with probability
``exp(-(logp_cur - logp_trial)/T)`` via a standard-exponential draw.
Rejection bookkeeping (per-walker weights = repeat counts, non-prior
rejection streaks for stuck-chain detection) is carried in the state.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

from . import moments as mom_ops
from .moments import Moments


def tempered_logpost(logpriors, loglikes, temperature: float):
    """Tempered log-posterior: the FULL posterior to the power 1/T
    (cobaya semantics, reference collection.py:75-84)."""
    import jax.numpy as jnp

    pri = jnp.sum(logpriors, -1)
    lik = jnp.sum(loglikes, -1)
    if temperature == 1:
        return pri + lik
    return (pri + lik) / temperature


class MCMCCarry(NamedTuple):
    """Per-walker scan state; every leaf has leading dim = n_chains.

    Exception: ``key`` is ONE chain-batch PRNG key (threefry is
    counter-based and partitionable, so batched (C, ...) draws from a
    single key shard correctly over the device mesh; per-walker key
    vectors would cost C extra splits per step on the VPU).
    """

    key: Any  # scalar typed PRNG key for the whole batch
    x: Any  # (C, d)
    logpost: Any  # (C,) tempered log-posterior
    logpriors: Any  # (C, n_priors)
    loglikes: Any  # (C, n_likes)
    derived: Any  # (C, n_derived)
    weight: Any  # (C,) repeats of the current point so far
    n_accepted: Any  # (C,) total accepted points
    rejects_streak: Any  # (C,) consecutive rejections (any cause)
    mom: Moments  # per-walker moment window A (staggered resets)
    mom2: Moments  # per-walker moment window B
    cache: Any = ()  # per-component cached results (blocked evaluator only)


class EpochRecord(NamedTuple):
    """Thinned per-record outputs, shapes (n_records, C_kept, ...)."""

    x: Any
    logpost: Any
    logpriors: Any
    loglikes: Any
    derived: Any
    weight: Any


def make_epoch_record(carry: "MCMCCarry", keep: int | None = None,
                      full_x: bool = False) -> EpochRecord:
    """Record-boundary epoch output, sliced to the fetched walker subset.

    The host only ever consumes ``fetch_chains`` walkers of each record
    (plus the full ``x`` when the CL-bounds ring is active), so slicing
    inside the scan keeps the stacked (n_rec, C, ...) record buffers off
    the device — the working-set spill behind the 65k-walker throughput
    regression (docs/performance.md).
    """
    def cut(a):
        return a if keep is None else a[:keep]

    return EpochRecord(
        x=carry.x if full_x else cut(carry.x),
        logpost=cut(carry.logpost),
        logpriors=cut(carry.logpriors),
        loglikes=cut(carry.loglikes),
        derived=cut(carry.derived),
        weight=cut(carry.weight),
    )


def make_epoch_fn(
    logpost_fn: Callable,
    periodic_wrap: Callable | None,
    temperature: float = 1.0,
    block_eval: Callable | None = None,
    cycled_directions: bool = False,
    record_keep: int | None = None,
    full_x_records: bool = False,
) -> Callable:
    """Build the jittable epoch function.

    ``logpost_fn(x) -> (logpost, logpriors, loglikes, derived)`` for a single
    walker (vmapped internally).  Returns
    ``epoch(carry, schedule, transforms, dir_mask, block_sizes, scale)
    -> (carry, EpochRecord)`` where ``schedule`` has shape
    ``(n_records, thin)`` of block indices.  With ``cycled_directions``,
    the signature gains a ``directions`` array of shape
    ``(n_records, thin, d)`` right after ``schedule``: per-step precomputed
    SO(n) columns (reference proposal.py:58), shared across walkers.

    With ``block_eval`` (from :meth:`Model.make_blocked_logposterior_fn`),
    the carry's per-component cache is used so that each step recomputes only
    the components footprinted by the moved block (the speed hierarchy's
    work avoidance, reference theory.py:240 + proposal oversampling).
    """
    import jax
    import jax.numpy as jnp

    from .proposal import propose_batch

    logpost_batch = jax.vmap(logpost_fn) if block_eval is None else None
    def tempered(logpriors, loglikes):
        return tempered_logpost(logpriors, loglikes, temperature)

    def one_step(carry: MCMCCarry, block_index, direction, transforms,
                 dir_mask, block_sizes, scale):
        # ONE split per step; all per-walker randomness is drawn as batched
        # (C, ...) arrays (counter-based bits: i.i.d. across walkers), and
        # the proposal transform applies to the whole batch as a
        # (C, d) @ (d, d) MXU matmul (see propose_batch)
        key_next, k_prop, k_acc = jax.random.split(carry.key, 3)
        trial = propose_batch(k_prop, carry.x, block_index, transforms,
                              dir_mask, block_sizes, scale, direction)
        if periodic_wrap is not None:
            trial = periodic_wrap(trial)
        if block_eval is None:
            lp_t, lpri_t, llik_t, der_t = logpost_batch(trial)
            cache_t = carry.cache
        else:
            lp_t, lpri_t, llik_t, der_t, cache_t = jax.vmap(
                block_eval, in_axes=(None, 0, 0)
            )(block_index, trial, carry.cache)
        tlp_t = tempered(lpri_t, llik_t)
        tlp_c = carry.logpost
        # prior rejection: trial outside prior support
        prior_ok = jnp.isfinite(jnp.sum(lpri_t, -1))
        expdraw = jax.random.exponential(
            k_acc, carry.logpost.shape, dtype=carry.x.dtype)
        accept = prior_ok & jnp.isfinite(tlp_t) & (
            (tlp_t > tlp_c) | (expdraw > (tlp_c - tlp_t))
        )

        def sel(new, old):
            mask = accept.reshape(accept.shape + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        new_x = sel(trial, carry.x)
        new_cache = carry.cache if block_eval is None else jax.tree.map(
            lambda new, old: sel(new, old), cache_t, carry.cache
        )
        new_carry = MCMCCarry(
            key=key_next,
            x=new_x,
            logpost=jnp.where(accept, tlp_t, tlp_c),
            logpriors=sel(lpri_t, carry.logpriors),
            loglikes=sel(llik_t, carry.loglikes),
            derived=sel(der_t, carry.derived),
            weight=jnp.where(accept, 1.0, carry.weight + 1.0),
            n_accepted=carry.n_accepted + accept,
            rejects_streak=jnp.where(
                accept, 0, carry.rejects_streak + 1
            ),
            # moments are updated at record boundaries (in `epoch` below):
            # with thin << autocorrelation time the thinned stream carries
            # nearly all the information, at 1/thin the HBM traffic of the
            # (C, d, d) accumulators
            mom=carry.mom,
            mom2=carry.mom2,
            cache=new_cache,
        )
        return new_carry

    def epoch_impl(carry: MCMCCarry, schedule, directions, transforms,
                   dir_mask, block_sizes, scale):
        def outer_step(carry, xs):
            block_indices_thin, dirs_thin = xs

            def inner_step(c, xb):
                b, e = xb
                return one_step(c, b, e, transforms, dir_mask, block_sizes,
                                scale), None

            carry, _ = jax.lax.scan(
                inner_step, carry, (block_indices_thin, dirs_thin)
            )
            carry = carry._replace(
                mom=mom_ops.update(carry.mom, carry.x),
                mom2=mom_ops.update(carry.mom2, carry.x),
            )
            rec = make_epoch_record(carry, keep=record_keep,
                                    full_x=full_x_records)
            return carry, rec

        return jax.lax.scan(outer_step, carry, (schedule, directions))

    if cycled_directions:
        return epoch_impl

    def epoch(carry, schedule, transforms, dir_mask, block_sizes, scale):
        return epoch_impl(carry, schedule, None, transforms, dir_mask,
                          block_sizes, scale)

    return epoch


def init_carry(key, x0, logpost_fn, dtype=None,
               full_eval=None, temperature: float = 1.0) -> MCMCCarry:
    """Initial carry from starting points ``x0`` of shape (C, d).

    ``full_eval`` (the cache-building evaluator from
    ``make_blocked_logposterior_fn``) enables the blocked-cache path.
    """
    import jax
    import jax.numpy as jnp

    x0 = jnp.asarray(x0, dtype=dtype)
    C = x0.shape[0]
    if full_eval is not None:
        lp, lpri, llik, der, cache = jax.vmap(full_eval)(x0)
    else:
        lp, lpri, llik, der = jax.vmap(logpost_fn)(x0)
        cache = ()
    return MCMCCarry(
        key=key,
        x=x0,
        logpost=tempered_logpost(lpri, llik, temperature),
        logpriors=lpri,
        loglikes=llik,
        derived=der,
        weight=jnp.ones(C, x0.dtype),
        n_accepted=jnp.zeros(C, jnp.int32),
        rejects_streak=jnp.zeros(C, jnp.int32),
        mom=mom_ops.init(x0),
        mom2=mom_ops.init(x0),
        cache=cache,
    )


def reset_moments(carry: MCMCCarry, which: str = "both") -> MCMCCarry:
    """Reset a moment window (anchored at current points)."""
    fresh = mom_ops.init(carry.x)
    if which == "mom":
        return carry._replace(mom=fresh)
    if which == "mom2":
        return carry._replace(mom2=fresh)
    return carry._replace(mom=fresh, mom2=fresh)
