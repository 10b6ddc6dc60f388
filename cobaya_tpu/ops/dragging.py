"""Fast-dragging epoch kernel (Neal math/0502099).

Capability parity with the reference's ``get_new_sample_dragging``
(/root/reference/cobaya/samplers/mcmc/mcmc.py:564-668): propose once in the
slow subspace, then take ``drag_interp_steps`` fast-subspace steps applied to
*both* slow extremes, each accepted against the linearly-interpolated
log-posterior; the total step is Metropolis-tested on the trajectory-averaged
accumulators, keeping the end point on acceptance and the original point on
rejection.

TPU-first: the whole drag trajectory is an inner ``lax.scan`` inside the
vmapped walker step; early ``-inf`` rejections become masked lanes.  With the
blocked cached evaluator, fast proposals at each slow extreme recompute only
the fast components against that extreme's cached slow results — the exact
work pattern that makes dragging pay off for expensive slow components.
"""

from __future__ import annotations

from typing import Callable

from . import moments as mom_ops
from .metropolis import MCMCCarry, make_epoch_record

SLOW, FAST = 0, 1  # block indices under a fast/slow split


def make_drag_epoch_fn(
    logpost_fn: Callable,
    periodic_wrap: Callable | None,
    temperature: float = 1.0,
    block_eval: Callable | None = None,
    drag_interp_steps: int = 1,
    record_keep: int | None = None,
    full_x_records: bool = False,
) -> Callable:
    """Epoch function where every step is one dragging cycle.

    Requires a 2-block fast/slow split; the schedule array is ignored except
    for its shape (n_records, thin).
    """
    import jax
    import jax.numpy as jnp

    from .proposal import propose_jax

    inv_T = 1.0 / float(temperature)
    n_drag = max(int(drag_interp_steps), 1)

    def tempered(logpriors, loglikes):
        # full-posterior tempering (reference collection.py:75-84); the
        # T==1 branch keeps the exact pre-tempering jaxpr (compile cache)
        if temperature == 1:
            return jnp.sum(logpriors, -1) + inv_T * jnp.sum(loglikes, -1)
        return inv_T * (jnp.sum(logpriors, -1) + jnp.sum(loglikes, -1))

    def tempered_scalar(lpri, llik):
        if temperature == 1:
            return jnp.sum(lpri) + inv_T * jnp.sum(llik)
        return inv_T * (jnp.sum(lpri) + jnp.sum(llik))

    def eval_full(x, cache):
        if block_eval is None:
            lp, lpri, llik, der = logpost_fn(x)
            return (tempered_scalar(lpri, llik), lpri, llik, der, cache)
        lp, lpri, llik, der, cache = block_eval(SLOW, x, cache)
        return (tempered_scalar(lpri, llik), lpri, llik, der, cache)

    def eval_fast(x, cache):
        if block_eval is None:
            lp, lpri, llik, der = logpost_fn(x)
            return (tempered_scalar(lpri, llik), lpri, llik, der, cache)
        lp, lpri, llik, der, cache = block_eval(FAST, x, cache)
        return (tempered_scalar(lpri, llik), lpri, llik, der, cache)

    def drag_step_single(carry_w, transforms, dir_mask, block_sizes, scale):
        """One dragging cycle for ONE walker (vmapped by the caller)."""
        (key, x, tlp, lpri, llik, der, cache) = carry_w
        key, k_slow, k_final = jax.random.split(key, 3)
        # slow proposal (drags fast coords through the triangular transform)
        x_end = propose_jax(k_slow, x, SLOW, transforms, dir_mask,
                            block_sizes, scale)
        if periodic_wrap is not None:
            x_end = periodic_wrap(x_end)
        tlp_end, lpri_e, llik_e, der_e, cache_end = eval_full(x_end, cache)
        slow_ok = jnp.isfinite(jnp.sum(lpri_e)) & jnp.isfinite(tlp_end)

        # drag the fast subspace along both extremes
        def drag_body(dc, _):
            (key, xs, tlp_s, xe, tlp_e, lpri_e, llik_e, der_e, cache_s,
             cache_e, acc_s, acc_e, i_step) = dc
            key, k_fast, k_acc = jax.random.split(key, 3)
            delta = propose_jax(
                k_fast, jnp.zeros_like(xs), FAST, transforms, dir_mask,
                block_sizes, scale,
            )
            xs_new = xs + delta
            xe_new = xe + delta
            if periodic_wrap is not None:
                xs_new = periodic_wrap(xs_new)
                xe_new = periodic_wrap(xe_new)
            tlp_s_new, lpri_s2, _, _, cache_s_new = eval_fast(xs_new, cache_s)
            tlp_e_new, lpri_e2, llik_e2, der_e2, cache_e_new = eval_fast(
                xe_new, cache_e
            )
            ok = (jnp.isfinite(jnp.sum(lpri_s2)) & jnp.isfinite(tlp_s_new)
                  & jnp.isfinite(jnp.sum(lpri_e2)) & jnp.isfinite(tlp_e_new))
            frac = i_step.astype(xs.dtype) / (1 + n_drag)
            interp_new = (1 - frac) * tlp_s_new + frac * tlp_e_new
            interp_cur = (1 - frac) * tlp_s + frac * tlp_e
            expdraw = jax.random.exponential(k_acc)
            accept = ok & (
                (interp_new > interp_cur)
                | (expdraw > (interp_cur - interp_new))
            )

            def sel(new, old):
                if new is None or old is None or new is old:
                    return old
                return jax.tree.map(
                    lambda a, b: jnp.where(
                        accept.reshape((1,) * b.ndim), a, b
                    ) if a.ndim == b.ndim else b, new, old,
                )

            xs = jnp.where(accept, xs_new, xs)
            xe = jnp.where(accept, xe_new, xe)
            tlp_s = jnp.where(accept, tlp_s_new, tlp_s)
            tlp_e = jnp.where(accept, tlp_e_new, tlp_e)
            lpri_e = sel(lpri_e2, lpri_e)
            llik_e = sel(llik_e2, llik_e)
            der_e = sel(der_e2, der_e)
            cache_s = sel(cache_s_new, cache_s)
            cache_e = sel(cache_e_new, cache_e)
            acc_s = acc_s + tlp_s
            acc_e = acc_e + tlp_e
            return (key, xs, tlp_s, xe, tlp_e, lpri_e, llik_e, der_e,
                    cache_s, cache_e, acc_s, acc_e, i_step + 1), None

        dc0 = (key, x, tlp, x_end, tlp_end, lpri_e, llik_e, der_e, cache,
               cache_end, tlp, tlp_end, jnp.asarray(1, jnp.int32))
        dc, _ = jax.lax.scan(drag_body, dc0, None, length=n_drag)
        (key, _, _, xe, tlp_e, lpri_e, llik_e, der_e, _, cache_e,
         acc_s, acc_e, _) = dc
        n_avg = 1 + n_drag
        expdraw = jax.random.exponential(k_final)
        mean_s, mean_e = acc_s / n_avg, acc_e / n_avg
        accept = slow_ok & (
            (mean_e > mean_s) | (expdraw > (mean_s - mean_e))
        )

        def selv(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(accept.reshape((1,) * b.ndim), a, b),
                new, old,
            )

        x_out = jnp.where(accept, xe, x)
        return (key, accept, slow_ok,
                x_out,
                jnp.where(accept, tlp_e, tlp),
                selv(lpri_e, lpri), selv(llik_e, llik), selv(der_e, der),
                selv(cache_e, cache) if block_eval is not None else cache)

    def epoch(carry: MCMCCarry, schedule, transforms, dir_mask, block_sizes,
              scale):
        n_rec, thin = schedule.shape

        def one_cycle(carry: MCMCCarry, _):
            # ONE carried key: per-walker keys for this cycle are derived
            # with a single batched split (the dragging inner loop draws
            # per-walker sequences of data-dependent length-n_drag, so the
            # vmapped per-walker key style stays inside the cycle)
            key_next, k_cycle = jax.random.split(carry.key)
            walker_keys = jax.random.split(k_cycle, carry.x.shape[0])
            (_, accept, slow_ok, x, tlp, lpri, llik, der, cache) = jax.vmap(
                drag_step_single,
                in_axes=((0, 0, 0, 0, 0, 0, 0), None, None, None, None),
            )((walker_keys, carry.x, carry.logpost, carry.logpriors,
               carry.loglikes, carry.derived, carry.cache),
              transforms, dir_mask, block_sizes, scale)
            import jax.numpy as jnp

            return MCMCCarry(
                key=key_next, x=x, logpost=tlp, logpriors=lpri,
                loglikes=llik,
                derived=der,
                weight=jnp.where(accept, 1.0, carry.weight + 1.0),
                n_accepted=carry.n_accepted + accept,
                rejects_streak=jnp.where(
                    accept, 0, carry.rejects_streak + slow_ok
                ),
                mom=carry.mom,
                mom2=carry.mom2,
                cache=cache,
            ), None

        def outer_step(carry, _):
            carry, _ = jax.lax.scan(one_cycle, carry, None, length=thin)
            carry = carry._replace(
                mom=mom_ops.update(carry.mom, carry.x),
                mom2=mom_ops.update(carry.mom2, carry.x),
            )
            rec = make_epoch_record(carry, keep=record_keep,
                                    full_x=full_x_records)
            return carry, rec

        return jax.lax.scan(outer_step, carry, None, length=n_rec)

    return epoch
