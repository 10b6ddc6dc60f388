"""Jittable 1D probability distributions.

The reference framework builds priors and reference pdfs from
``scipy.stats`` frozen distributions (/root/reference/cobaya/tools.py:611).
On TPU the prior logpdf is evaluated inside the jitted sampling step for
thousands of walkers at once, so each supported distribution is implemented
natively in jax.numpy (logpdf + sampling).  A frozen scipy distribution is
kept alongside for host-side operations (ppf for confidence bounds, support).

Spec convention (same as the reference input schema): a dict with ``dist``
(default ``uniform``) plus scipy kwargs; ``min``/``max`` may replace
``loc``/``scale`` (for ``truncnorm`` they are converted to ``a``/``b``).
A bare 2-list is a uniform range; a bare number is a delta.
"""

from __future__ import annotations

import math
import numbers
from collections.abc import Sequence
from typing import Any, Callable

import numpy as np

from .utils.log import LoggedError, get_logger

log = get_logger("dists")

_LOG2PI = math.log(2 * math.pi)


def _jnp():
    import jax.numpy as jnp

    return jnp


class Dist1D:
    """A 1D distribution with jittable logpdf and sampler.

    Attributes
    ----------
    name : scipy.stats distribution name
    kwargs : scipy-style keyword args (loc, scale, shape params)
    scipy_dist : frozen scipy.stats distribution (host-side ops)
    """

    def __init__(self, name: str, **kwargs):
        self.name = name
        self.kwargs = dict(kwargs)
        self.loc = float(kwargs.get("loc", 0.0))
        self.scale = float(kwargs.get("scale", 1.0))
        import scipy.stats as stats

        try:
            family = getattr(stats, name)
        except AttributeError as exc:
            raise LoggedError(
                log, "'%s' is not a valid scipy.stats distribution.", name
            ) from exc
        try:
            self.scipy_dist = family(**kwargs)
        except TypeError as exc:
            raise LoggedError(
                log, "Error initializing scipy.stats.%s: %s", name, exc
            ) from exc
        impl = _IMPLS.get(name)
        if impl is None:
            self._logpdf_jax = None
            self._sample_jax = None
        else:
            self._logpdf_jax, self._sample_jax = impl(self)

    # ---- host-side ops -----------------------------------------------------
    def support(self) -> tuple[float, float]:
        if self.name == "uniform" and self.scale == 0:
            return self.loc, self.loc  # delta distribution
        lo, hi = self.scipy_dist.support()
        return float(lo), float(hi)

    def interval(self, confidence: float) -> tuple[float, float]:
        lo, hi = self.scipy_dist.interval(confidence)
        return float(lo), float(hi)

    def ppf(self, q):
        return self.scipy_dist.ppf(q)

    def std(self) -> float:
        return float(self.scipy_dist.std())

    def mean(self) -> float:
        return float(self.scipy_dist.mean())

    @property
    def jittable(self) -> bool:
        return self._logpdf_jax is not None

    # ---- device-side ops ----------------------------------------------------
    def logpdf(self, x):
        """Jittable elementwise log-density (jnp arrays in/out)."""
        if self._logpdf_jax is not None:
            return self._logpdf_jax(x)
        # Fallback: host callback (works under jit, slower).
        import jax

        spec = jax.ShapeDtypeStruct(
            getattr(x, "shape", ()), getattr(x, "dtype", np.float32)
        )

        def host_logpdf(v):
            from .utils.tools import ensure_callback_thread_x64

            ensure_callback_thread_x64([spec])
            return np.asarray(
                self.scipy_dist.logpdf(np.asarray(v)), dtype=spec.dtype
            )

        return jax.pure_callback(
            host_logpdf, spec, x, vmap_method="expand_dims",
        )

    def sample(self, key, shape=()):
        """Jittable sampler (jax.random key)."""
        if self._sample_jax is not None:
            return self._sample_jax(key, shape)
        import jax

        seed = jax.random.randint(key, (), 0, np.iinfo(np.int32).max)

        sample_spec = jax.ShapeDtypeStruct(shape, np.float64)

        def _draw(s):
            from .utils.tools import ensure_callback_thread_x64

            ensure_callback_thread_x64([sample_spec])
            rng = np.random.default_rng(int(s))
            return self.scipy_dist.rvs(size=shape, random_state=rng).astype(np.float64)

        return jax.pure_callback(_draw, sample_spec, seed)

    def __repr__(self):
        return f"Dist1D({self.name}, {self.kwargs})"


# --------------------------------------------------------------------------
# native implementations: each returns (logpdf_fn, sample_fn)
# --------------------------------------------------------------------------
def _uniform(d: Dist1D):
    jnp = _jnp()
    import jax

    lo, w = d.loc, d.scale
    logw = -math.log(w) if w > 0 else math.inf  # delta: logpdf -> +inf at point

    def logpdf(x):
        if w == 0:
            return jnp.where(x == lo, jnp.inf, -jnp.inf)
        inside = (x >= lo) & (x <= lo + w)
        return jnp.where(inside, logw, -jnp.inf)

    def sample(key, shape=()):
        return jax.random.uniform(key, shape, minval=lo, maxval=lo + max(w, 0.0))

    return logpdf, sample


def _norm(d: Dist1D):
    jnp = _jnp()
    import jax

    mu, sig = d.loc, d.scale
    const = -math.log(sig) - 0.5 * _LOG2PI

    def logpdf(x):
        z = (x - mu) / sig
        return const - 0.5 * z * z

    def sample(key, shape=()):
        return mu + sig * jax.random.normal(key, shape)

    return logpdf, sample


def _truncnorm(d: Dist1D):
    jnp = _jnp()
    import jax
    from scipy.stats import norm as _snorm

    a = float(d.kwargs.get("a", -np.inf))
    b = float(d.kwargs.get("b", np.inf))
    mu, sig = d.loc, d.scale
    lognorm_const = math.log(_snorm.cdf(b) - _snorm.cdf(a))
    const = -math.log(sig) - 0.5 * _LOG2PI - lognorm_const

    def logpdf(x):
        z = (x - mu) / sig
        inside = (z >= a) & (z <= b)
        return jnp.where(inside, const - 0.5 * z * z, -jnp.inf)

    def sample(key, shape=()):
        return mu + sig * jax.random.truncated_normal(key, a, b, shape)

    return logpdf, sample


def _halfnorm(d: Dist1D):
    jnp = _jnp()
    import jax

    mu, sig = d.loc, d.scale
    const = 0.5 * math.log(2.0 / math.pi) - math.log(sig)

    def logpdf(x):
        z = (x - mu) / sig
        return jnp.where(z >= 0, const - 0.5 * z * z, -jnp.inf)

    def sample(key, shape=()):
        return mu + sig * jnp.abs(jax.random.normal(key, shape))

    return logpdf, sample


def _expon(d: Dist1D):
    jnp = _jnp()
    import jax

    mu, sig = d.loc, d.scale
    const = -math.log(sig)

    def logpdf(x):
        z = (x - mu) / sig
        return jnp.where(z >= 0, const - z, -jnp.inf)

    def sample(key, shape=()):
        return mu + sig * jax.random.exponential(key, shape)

    return logpdf, sample


def _beta(d: Dist1D):
    jnp = _jnp()
    import jax
    from scipy.special import betaln

    a = float(d.kwargs["a"])
    b = float(d.kwargs["b"])
    mu, sig = d.loc, d.scale
    const = -float(betaln(a, b)) - math.log(sig)

    def logpdf(x):
        z = (x - mu) / sig
        inside = (z > 0) & (z < 1)
        zs = jnp.clip(z, 1e-300, 1 - 1e-16)
        return jnp.where(
            inside, const + (a - 1) * jnp.log(zs) + (b - 1) * jnp.log1p(-zs), -jnp.inf
        )

    def sample(key, shape=()):
        return mu + sig * jax.random.beta(key, a, b, shape)

    return logpdf, sample


def _gamma(d: Dist1D):
    jnp = _jnp()
    import jax
    from scipy.special import gammaln

    a = float(d.kwargs["a"])
    mu, sig = d.loc, d.scale
    const = -float(gammaln(a)) - math.log(sig)

    def logpdf(x):
        z = (x - mu) / sig
        zs = jnp.clip(z, 1e-300, None)
        return jnp.where(z > 0, const + (a - 1) * jnp.log(zs) - zs, -jnp.inf)

    def sample(key, shape=()):
        return mu + sig * jax.random.gamma(key, a, shape)

    return logpdf, sample


def _lognorm(d: Dist1D):
    jnp = _jnp()
    import jax

    s = float(d.kwargs["s"])
    mu, sig = d.loc, d.scale

    def logpdf(x):
        z = (x - mu) / sig
        zs = jnp.clip(z, 1e-300, None)
        lz = jnp.log(zs)
        return jnp.where(
            z > 0,
            -lz - math.log(s) - 0.5 * _LOG2PI - 0.5 * (lz / s) ** 2 - math.log(sig),
            -jnp.inf,
        )

    def sample(key, shape=()):
        return mu + sig * jnp.exp(s * jax.random.normal(key, shape))

    return logpdf, sample


_IMPLS: dict[str, Callable[[Dist1D], tuple[Callable, Callable]]] = {
    "uniform": _uniform,
    "norm": _norm,
    "truncnorm": _truncnorm,
    "halfnorm": _halfnorm,
    "expon": _expon,
    "beta": _beta,
    "gamma": _gamma,
    "lognorm": _lognorm,
}


def get_1d_dist(definition: float | Sequence | dict) -> Dist1D:
    """Create a :class:`Dist1D` from an input-file prior/ref specification.

    Follows the reference conventions (tools.py:611): number = delta, 2-list =
    uniform range, dict = scipy name + kwargs with min/max <-> loc/scale.
    """
    if definition is None or (
        not isinstance(definition, numbers.Real) and not definition
    ):
        raise LoggedError(
            log, "Pass a range [min, max], a number, or a dict; got %r", definition
        )
    if isinstance(definition, numbers.Real) and not isinstance(definition, bool):
        kwargs: dict[str, Any] = {"dist": "uniform", "loc": float(definition), "scale": 0.0}
    elif (
        isinstance(definition, Sequence)
        and len(definition) == 2
        and all(isinstance(v, numbers.Real) for v in definition)
    ):
        kwargs = {"dist": "uniform", "min": definition[0], "max": definition[1]}
    elif isinstance(definition, dict):
        kwargs = dict(definition)
    else:
        raise LoggedError(log, "Invalid prior/ref definition: %r", definition)
    name = kwargs.pop("dist", "uniform")
    if not isinstance(name, str):
        raise LoggedError(log, "'dist' must be a string, got %r", name)
    if "min" in kwargs or "max" in kwargs:
        if name == "truncnorm":
            if "a" in kwargs or "b" in kwargs:
                raise LoggedError(
                    log, "Cannot mix 'a/b' and 'min/max' for truncnorm."
                )
            loc = float(kwargs.get("loc", 0))
            scale = float(kwargs.get("scale", 1))
            kwargs["a"] = (float(kwargs.pop("min", -np.inf)) - loc) / scale
            kwargs["b"] = (float(kwargs.pop("max", np.inf)) - loc) / scale
        else:
            if "loc" in kwargs or "scale" in kwargs:
                raise LoggedError(
                    log, "Cannot mix 'loc/scale' and 'min/max' conventions."
                )
            lo = float(kwargs.pop("min", 0.0))
            hi = float(kwargs.pop("max", 1.0))
            kwargs["loc"] = lo
            kwargs["scale"] = hi - lo
    if kwargs.get("scale", 1) < 0:
        raise LoggedError(log, "Negative range/scale in definition %r", definition)
    if not np.all(np.isfinite([kwargs.get("loc", 0), kwargs.get("scale", 1)])):
        raise LoggedError(log, "Improper prior: non-finite range/scale.")
    dist = Dist1D(name, **kwargs)
    lo, hi = dist.support()
    if ("loc" in kwargs or "scale" in kwargs) and name != "truncnorm":
        pass
    return dist


# ---- traced scipy.stats facade ------------------------------------------------

class _TracedFrozen:
    """Frozen-distribution view with jittable logpdf/pdf."""

    def __init__(self, dist: Dist1D):
        self._dist = dist

    def logpdf(self, x):
        return self._dist.logpdf(x)

    def pdf(self, x):
        return _jnp().exp(self._dist.logpdf(x))

    def __getattr__(self, name):  # host-side ops: ppf, cdf, rvs, ...
        return getattr(self._dist.scipy_dist, name)


class _TracedFamily:
    """One scipy.stats family exposed with trace-safe logpdf/pdf.

    ``stats.norm.logpdf(x, loc=, scale=)`` and ``stats.norm(loc=, scale=)``
    both work under jit for every family in ``_IMPLS``; other families
    fall through to scipy (host-only, like the reference).
    """

    # positional shape-arg names per supported family (scipy conventions)
    _SHAPES = {"truncnorm": ("a", "b"), "beta": ("a", "b"),
               "gamma": ("a",), "lognorm": ("s",)}

    def __init__(self, name: str):
        self._name = name

    def _freeze(self, *args, **kwargs) -> _TracedFrozen:
        shapes = self._SHAPES.get(self._name, ())
        kw = dict(zip(list(shapes) + ["loc", "scale"], args))
        kw.update(kwargs)
        return _TracedFrozen(Dist1D(self._name, **kw))

    def __call__(self, *args, **kwargs):
        return self._freeze(*args, **kwargs)

    def logpdf(self, x, *args, **kwargs):
        return self._freeze(*args, **kwargs).logpdf(x)

    def pdf(self, x, *args, **kwargs):
        return self._freeze(*args, **kwargs).pdf(x)

    def __getattr__(self, name):  # everything else: plain scipy
        import scipy.stats as stats

        return getattr(getattr(stats, self._name), name)


class TracedStats:
    """`scipy.stats` facade for user lambda strings (priors, dynamic params,
    external likelihoods): distributions with native implementations in
    ``_IMPLS`` get jittable logpdf/pdf so the expression traces into the
    device program; anything else falls back to real scipy.stats."""

    def __getattr__(self, name):
        if name in _IMPLS:
            return _TracedFamily(name)
        import scipy.stats as stats

        return getattr(stats, name)


traced_stats = TracedStats()
