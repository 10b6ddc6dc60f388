"""Streaming per-chain moment accumulators (anchored, f32-safe).

The MCMC scan carries, for every walker, running first and second moments of
the sampled vector.  To stay accurate in float32 on TPU (no native f64), the
sums are *anchored*: we accumulate ``sum(x - anchor)`` and
``sum((x - anchor)(x - anchor)^T)`` with the anchor taken near the walker's
starting point, so the accumulated values stay O(n * sigma) instead of
O(n * |x|) and catastrophic cancellation is avoided when recovering mean/cov.

Replaces the reference's pandas second-half mean/cov computations
(/root/reference/cobaya/collection.py:893,936) with an on-device streaming
form; cross-chip reduction is a single psum over the moment pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Moments(NamedTuple):
    """Batched accumulator. Leading dims of every field = batch (chains)."""

    count: jnp.ndarray  # (...,)
    anchor: jnp.ndarray  # (..., d)
    s1: jnp.ndarray  # (..., d)      sum of (x - anchor)
    s2: jnp.ndarray  # (..., d, d)   sum of outer(x - anchor)


def init(anchor) -> Moments:
    anchor = jnp.asarray(anchor)
    batch = anchor.shape[:-1]
    d = anchor.shape[-1]
    return Moments(
        count=jnp.zeros(batch, anchor.dtype),
        anchor=anchor,
        s1=jnp.zeros(batch + (d,), anchor.dtype),
        s2=jnp.zeros(batch + (d, d), anchor.dtype),
    )


def update(m: Moments, x, weight=1.0) -> Moments:
    """Add one (batched) observation with the given weight."""
    dx = x - m.anchor
    w = jnp.asarray(weight, dx.dtype)
    if w.ndim == 0:
        w1 = w2 = w
    else:
        w1, w2 = w[..., None], w[..., None, None]
    return Moments(
        count=m.count + w,
        anchor=m.anchor,
        s1=m.s1 + w1 * dx,
        s2=m.s2 + w2 * dx[..., :, None] * dx[..., None, :],
    )


def mean(m: Moments) -> jnp.ndarray:
    return m.anchor + m.s1 / jnp.maximum(m.count, 1.0)[..., None]


def cov(m: Moments, ddof: int = 1) -> jnp.ndarray:
    n = jnp.maximum(m.count, 1.0)
    mu = m.s1 / n[..., None]  # mean - anchor
    raw = m.s2 / n[..., None, None] - mu[..., :, None] * mu[..., None, :]
    corr = n / jnp.maximum(n - ddof, 1.0)
    return raw * corr[..., None, None]


def merge(a: Moments, b: Moments) -> Moments:
    """Combine two accumulators with the same anchor."""
    return Moments(
        count=a.count + b.count,
        anchor=a.anchor,
        s1=a.s1 + b.s1,
        s2=a.s2 + b.s2,
    )


def reanchor(m: Moments, new_anchor) -> Moments:
    """Express the accumulated sums relative to a different anchor."""
    new_anchor = jnp.broadcast_to(jnp.asarray(new_anchor, m.anchor.dtype),
                                  m.anchor.shape)
    shift = m.anchor - new_anchor
    s1 = m.s1 + m.count[..., None] * shift
    s2 = (
        m.s2
        + m.s1[..., :, None] * shift[..., None, :]
        + shift[..., :, None] * m.s1[..., None, :]
        + m.count[..., None, None] * shift[..., :, None] * shift[..., None, :]
    )
    return Moments(count=m.count, anchor=new_anchor, s1=s1, s2=s2)


def reduce_chains(m: Moments, anchor=None) -> Moments:
    """Merge the chain axis (axis 0) into a single accumulator.

    ``anchor``: common anchor for the result (default: zeros — safe for
    cross-device psum where each shard re-anchors independently).
    """
    if anchor is None:
        anchor = jnp.zeros_like(m.anchor)
    re = reanchor(m, anchor)
    return Moments(
        count=re.count.sum(0),
        anchor=re.anchor[0],
        s1=re.s1.sum(0),
        s2=re.s2.sum(0),
    )
