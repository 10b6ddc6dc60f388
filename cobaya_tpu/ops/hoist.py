"""Hoisting of static data tables out of traced posterior programs.

Likelihood/theory components own large constant arrays (inverse covariances,
binning matrices, foreground templates, emulator tables).  Materializing them
inside the trace (``jnp.asarray(self.covinv)``) bakes each table into the
serialized HLO as a literal constant: the flagship cosmology program carried
>1 GB of constants and the remote-compile service rejected it outright
(HTTP 413).  The reference has no analogue of this problem — its likelihoods
keep numpy arrays on the host (planck_pliklite.py:178,
planck_2018_CamSpec_python.py:412 of /root/reference) — but any jit-compiled
rebuild must hoist them.

The mechanism is a thread-local registry with three modes:

- **bare** (no active context): ``hoisted(key, value)`` == ``jnp.asarray
  (value)`` — legacy behavior, used by scripted/eager evaluation and tests
  that trace the posterior directly.
- **collect**: :func:`collect` traces a function abstractly
  (``jax.eval_shape`` — nothing is compiled or transferred) and records every
  ``hoisted`` call's value under its key, returning the constants dict.
- **bind**: inside a jitted wrapper that receives the constants dict as a
  *runtime argument*, ``bind(consts)`` makes each ``hoisted(key, ...)`` call
  return the matching traced argument instead of a baked literal.

Samplers use :func:`jit_with_consts`, which packages collect-once /
bind-per-trace so their epoch programs contain zero large constants; the
tables are device-resident buffers passed (by reference) at each call.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from functools import partial
from typing import Any, Callable

import numpy as np

_local = threading.local()


def _stack() -> list:
    stack = getattr(_local, "stack", None)
    if stack is None:
        stack = _local.stack = []
    return stack


class _Collect:
    __slots__ = ("consts",)

    def __init__(self):
        self.consts: dict[str, np.ndarray] = {}


class _Bind:
    __slots__ = ("consts",)

    def __init__(self, consts):
        self.consts = consts


def hoisted(key: str, value) -> Any:
    """A traced constant that samplers can lift out of the compiled program.

    Identical to ``jnp.asarray(value)`` unless a collect/bind context is
    active (see module docstring).  ``key`` must be stable across traces of
    the same model (components use ``"<component-name>/<attr>"``).
    """
    import jax.numpy as jnp

    stack = _stack()
    if stack:
        top = stack[-1]
        if isinstance(top, _Bind):
            bound = top.consts.get(key)
            if bound is not None:
                return jnp.asarray(bound)
            # not collected (new site / different code path): fall through
            # and bake — correct, just not hoisted
        else:
            consts = top.consts
            if key not in consts:
                consts[key] = np.asarray(value)
            return jnp.asarray(consts[key])
    return jnp.asarray(value)


@contextmanager
def bind(consts: dict):
    """Make ``hoisted(key, ...)`` resolve to ``consts[key]`` while tracing."""
    stack = _stack()
    stack.append(_Bind(consts))
    try:
        yield
    finally:
        stack.pop()


def collect(fn: Callable, *example_args, **example_kwargs) -> dict:
    """Abstractly trace ``fn`` and return its hoistable constants.

    Uses ``jax.eval_shape``: no compilation, no device transfers — the only
    cost is one Python trace.  The returned dict maps hoist keys to the
    (host, numpy) constant arrays; convert with ``jnp.asarray`` under the
    dtype policy in force at *run* time before binding.
    """
    import jax

    ctx = _Collect()
    _stack().append(ctx)
    try:
        jax.eval_shape(fn, *example_args, **example_kwargs)
    finally:
        _stack().pop()
    return ctx.consts


def device_consts(consts: dict) -> dict:
    """Convert collected constants to device arrays (current dtype policy)."""
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in consts.items()}


def consts_bytes(consts: dict) -> int:
    """Total footprint of a constants dict in bytes."""
    return int(sum(np.asarray(v).nbytes for v in consts.values()))


def jit_with_consts(fn: Callable, consts: dict, **jit_kwargs) -> Callable:
    """``jax.jit(fn)`` with the hoisted tables threaded as runtime args.

    The returned callable has ``fn``'s signature (positional args only); the
    constants dict rides along as a leading jit argument so the compiled
    program references the tables as parameters, not HLO literals.  With an
    empty dict this is exactly ``jax.jit(fn, **jit_kwargs)``.
    """
    import jax

    if not consts:
        return jax.jit(fn, **jit_kwargs)
    if "donate_argnums" in jit_kwargs:
        d = jit_kwargs["donate_argnums"]
        jit_kwargs["donate_argnums"] = tuple(
            i + 1 for i in ((d,) if isinstance(d, int) else tuple(d))
        )

    @partial(jax.jit, **jit_kwargs)
    def wrapped(consts_, *args):
        with bind(consts_):
            return fn(*args)

    def call(*args):
        return wrapped(consts, *args)

    call._consts = consts  # introspection (tests, size accounting)
    call.lower = lambda *args: wrapped.lower(consts, *args)
    return call
