"""Prior: separable 1D priors + external joint prior functions.

Capability parity with /root/reference/cobaya/prior.py: any scipy.stats
distribution per sampled parameter, external (joint) log-prior callables over
input parameters, confidence-level bounds, periodic-parameter wrapping,
reference pdfs for chain starting points, and reference variances as proposal
fallbacks.

TPU-first design: the 1D prior log-density over the whole sampled vector is
compiled once into a single jittable function.  Uniform priors collapse to a
precomputed constant plus a vectorized bounds mask; normal priors are grouped
into one vectorized evaluation; other families evaluate per-parameter (XLA
fuses them).  The function maps over walker batches with ``vmap`` for free.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

import numpy as np

from ..dists import Dist1D, get_1d_dist
from ..utils.log import HasLogger, LoggedError
from ..utils.tools import get_external_function, getfullargspec_args
from .parameterization import Parameterization


class ExternalPrior:
    """A user-supplied joint prior: callable over input parameters.

    Traced evaluation (``logp_traced``) probes once whether the callable
    is jittable; numpy-style callables with Python control flow (the
    common cobaya idiom, e.g. ``lambda x: 0 if x < 1 else -np.inf``) fall
    back to a vmappable ``jax.pure_callback`` so they still work inside
    the compiled sampling path (reference evaluates priors on the host
    unconditionally, /root/reference/cobaya/prior.py:866).
    """

    def __init__(self, name: str, spec):
        self.name = name
        self.func = get_external_function(spec, name)
        self.params = getfullargspec_args(self.func)
        self._jittable: bool | None = None

    def logp(self, input_params: Mapping[str, Any]):
        return self.func(*[input_params[p] for p in self.params])

    def logp_traced(self, input_params: Mapping[str, Any]):
        """Evaluate under jax tracing; host-callback fallback if needed."""
        import jax
        import jax.numpy as jnp

        args = [jnp.asarray(input_params[p]) for p in self.params]
        dtype = jnp.result_type(*args) if args else jnp.float32
        if self._jittable is None:
            try:
                jax.eval_shape(
                    lambda *a: jnp.asarray(self.func(*a), dtype),
                    *[jax.ShapeDtypeStruct((), dtype) for _ in args],
                )
                self._jittable = True
            except Exception:
                self._jittable = False
        if self._jittable:
            return jnp.asarray(self.func(*args), dtype)
        func = np.vectorize(self.func, otypes=[np.float64])
        spec = jax.ShapeDtypeStruct((), dtype)

        def host(*a):
            from ..utils.tools import ensure_callback_thread_x64

            ensure_callback_thread_x64([spec])
            return np.asarray(func(*a), dtype=dtype)

        return jax.pure_callback(
            host, spec, *args, vmap_method="expand_dims",
        )


class Prior(HasLogger):
    """Joint prior over the sampled parameters."""

    def __init__(
        self,
        parameterization: Parameterization,
        info_prior: Mapping | None = None,
    ):
        self.set_logger()
        self.parameterization = parameterization
        sampled_info = parameterization.sampled_params_info()
        self.params: list[str] = list(sampled_info)
        self.dists: list[Dist1D] = []
        self.ref_pdfs: list[Any] = []  # Dist1D | float | None
        self._periodic = np.zeros(len(self.params), dtype=bool)
        self._bounds = np.empty((len(self.params), 2))
        for i, (p, info) in enumerate(sampled_info.items()):
            try:
                dist = get_1d_dist(info["prior"])
            except LoggedError as exc:
                raise LoggedError(
                    self.log, "Error in prior of parameter '%s': %s", p, exc
                ) from exc
            self.dists.append(dist)
            lo, hi = dist.support()
            self._bounds[i] = (lo, hi)
            self._periodic[i] = bool(info.get("periodic", False))
            if self._periodic[i] and not np.all(np.isfinite(self._bounds[i])):
                raise LoggedError(
                    self.log, "Periodic parameter '%s' needs a bounded prior.", p
                )
            self.ref_pdfs.append(self._parse_ref(info.get("ref")))
        self._uniform_idx = np.array(
            [i for i, d in enumerate(self.dists) if d.name == "uniform"], dtype=int
        )
        self._norm_idx = np.array(
            [i for i, d in enumerate(self.dists) if d.name == "norm"], dtype=int
        )
        self._other_idx = [
            i for i, d in enumerate(self.dists)
            if d.name not in ("uniform", "norm")
        ]
        # precomputed uniform constant
        widths = np.array([self.dists[i].scale for i in self._uniform_idx])
        if np.any(widths <= 0):
            raise LoggedError(self.log, "Zero-width uniform prior on a sampled param.")
        self._uniform_logconst = float(-np.sum(np.log(widths))) if len(widths) else 0.0
        self._norm_loc = np.array([self.dists[i].loc for i in self._norm_idx])
        self._norm_scale = np.array([self.dists[i].scale for i in self._norm_idx])
        # external priors
        self.external: dict[str, ExternalPrior] = {}
        for name, spec in (info_prior or {}).items():
            self.external[name] = ExternalPrior(name, spec)
            self.mpi_info("Loaded external prior '%s'", name)
        self._jax_logps_1d = None

    @staticmethod
    def _parse_ref(ref):
        """One ref spec -> None | float | Dist1D (reference prior.py:411)."""
        if ref is None:
            return None
        if isinstance(ref, (int, float)) and not isinstance(ref, bool):
            if np.isnan(ref):
                return None  # 'ref: .nan' = no ref (reference prior.py:909)
            return float(ref)
        if isinstance(ref, Sequence) and len(ref) == 2 and all(
            isinstance(v, (int, float)) for v in ref
        ):
            # [loc, scale] shorthand = normal ref pdf
            return get_1d_dist({"dist": "norm", "loc": ref[0],
                                "scale": ref[1]})
        return get_1d_dist(ref)

    def set_reference(self, ref_info: Mapping):
        """Set or update reference pdfs per parameter (reference prior.py:786).

        ``ref_info`` maps parameter name -> ref definition.  Parameters not
        mentioned keep their current reference pdf; an explicit ``None``
        resets a parameter to drawing from its prior.
        """
        unknown = set(ref_info) - set(self.params)
        if unknown:
            raise LoggedError(
                self.log, "Cannot set reference for non-sampled params: %r",
                sorted(unknown),
            )
        for p, ref in ref_info.items():
            self.ref_pdfs[self.params.index(p)] = self._parse_ref(ref)

    def covmat(self, ignore_external: bool = False) -> np.ndarray:
        """Covariance matrix of the (separable) prior (reference prior.py:774)."""
        if not ignore_external and self.external:
            raise LoggedError(
                self.log, "It is not possible to get the covariance matrix "
                "of an external prior.",
            )
        return np.diag([dist.std() ** 2 for dist in self.dists])

    # ---- geometry -------------------------------------------------------------
    def d(self) -> int:
        return len(self.params)

    @property
    def names(self) -> list[str]:
        """Prior names as they appear in output columns: '0' + external names."""
        return ["0"] + list(self.external)

    def bounds(self, confidence: float = 1.0,
               confidence_for_unbounded: float = 1.0) -> np.ndarray:
        """Per-parameter (lower, upper) bounds array, shape (d, 2).

        ``confidence`` shrinks all intervals; ``confidence_for_unbounded``
        only affects parameters with infinite support (for samplers needing a
        bounded box, cf. prior.py:594).
        """
        out = np.empty((self.d(), 2))
        for i, dist in enumerate(self.dists):
            lo, hi = dist.support()
            if confidence < 1.0:
                lo, hi = dist.interval(confidence)
            elif not np.all(np.isfinite([lo, hi])) and confidence_for_unbounded < 1.0:
                lo, hi = dist.interval(confidence_for_unbounded)
            out[i] = (lo, hi)
        return out

    @property
    def periodic_params_bounds(self):
        return self._periodic, self._bounds

    def reduce_periodic(self, x):
        """Wrap periodic coordinates back into their [lo, hi) range (jittable)."""
        if not np.any(self._periodic):
            return x
        import jax.numpy as jnp

        lo = jnp.asarray(self._bounds[:, 0])
        width = jnp.asarray(self._bounds[:, 1] - self._bounds[:, 0])
        wrapped = lo + jnp.mod(x - lo, width)
        return jnp.where(jnp.asarray(self._periodic), wrapped, x)

    # ---- log-densities ----------------------------------------------------------
    def logps_internal_jax(self, x):
        """Jittable sum of the separable 1D prior logps at ``x`` (shape (d,))."""
        import jax.numpy as jnp

        x = jnp.asarray(x)
        total = jnp.asarray(self._uniform_logconst, dtype=x.dtype)
        inside = jnp.all(
            (x >= jnp.asarray(self._bounds[:, 0], dtype=x.dtype))
            & (x <= jnp.asarray(self._bounds[:, 1], dtype=x.dtype))
        )
        if len(self._norm_idx):
            z = (x[self._norm_idx] - self._norm_loc) / self._norm_scale
            total = total + jnp.sum(
                -0.5 * z * z - jnp.log(jnp.asarray(self._norm_scale))
                - 0.5 * np.log(2 * np.pi)
            )
        for i in self._other_idx:
            total = total + self.dists[i].logpdf(x[i])
        return jnp.where(inside, total, -jnp.inf)

    def logps_internal(self, x) -> float:
        """Host-friendly scalar version (numpy in, float out)."""
        import jax.numpy as jnp

        return float(self.logps_internal_jax(jnp.asarray(np.asarray(x, float))))

    def logps_external(self, input_params: Mapping[str, Any]) -> list:
        return [ext.logp(input_params) for ext in self.external.values()]

    def logps(self, x) -> list[float]:
        x = np.asarray(x, dtype=float)  # int input would truncate bounds
        logps = [self.logps_internal(x)]
        if self.external:
            input_params = self.parameterization.to_input(x)
            logps += [float(v) for v in self.logps_external(input_params)]
        return logps

    def logp(self, x) -> float:
        return float(np.sum(self.logps(x)))

    # ---- sampling ---------------------------------------------------------------
    def sample(self, n: int = 1, ignore_external: bool = False,
               random_state=None) -> np.ndarray:
        """Draw ``n`` points from the separable prior (host-side numpy)."""
        if not ignore_external and self.external:
            raise LoggedError(
                self.log, "Cannot sample from external priors directly."
            )
        rng = np.random.default_rng(random_state)
        cols = [d.scipy_dist.rvs(size=n, random_state=rng) for d in self.dists]
        return np.column_stack(cols) if cols else np.empty((n, 0))

    def sample_jax(self, key, n_or_shape=()):
        """Jittable prior draw; returns array of shape (*shape, d)."""
        import jax
        import jax.numpy as jnp

        shape = (n_or_shape,) if isinstance(n_or_shape, int) else tuple(n_or_shape)
        if not self.d():
            return jnp.empty(shape + (0,))
        keys = jax.random.split(key, self.d())
        cols = [d.sample(k, shape) for d, k in zip(self.dists, keys)]
        return jnp.stack(cols, axis=-1)

    def reference(self, max_tries: int = 1000, warn_if_no_ref: bool = True,
                  ignore_fixed: bool = False, random_state=None) -> np.ndarray:
        """One starting point drawn from the reference pdfs (host-side).

        Falls back to the prior for params without a ``ref``.  Fixed refs
        (plain numbers) are returned as-is unless ``ignore_fixed``.
        """
        rng = np.random.default_rng(random_state)
        point = np.empty(self.d())
        where_no_ref = []
        for attempt in range(max(int(max_tries), 1)):
            for i, (dist, ref) in enumerate(zip(self.dists, self.ref_pdfs)):
                if ref is None:
                    point[i] = dist.scipy_dist.rvs(random_state=rng)
                    if attempt == 0:
                        where_no_ref.append(self.params[i])
                elif isinstance(ref, float):
                    if ignore_fixed:
                        point[i] = dist.scipy_dist.rvs(random_state=rng)
                    else:
                        point[i] = ref
                else:
                    point[i] = ref.scipy_dist.rvs(random_state=rng)
            # redraw until the full point has non-null prior density (a ref
            # pdf may put mass outside the prior; reference prior.py:926)
            if np.isfinite(self.logp(point)):
                break
        else:
            raise LoggedError(
                self.log,
                "Could not find a reference point with non-null prior "
                "density in %d tries. Check that the ref pdfs overlap the "
                "prior support.", max_tries,
            )
        if where_no_ref and warn_if_no_ref:
            self.mpi_warning(
                "No reference pdf for params %s: starting from the prior "
                "(which might be a poor choice).", where_no_ref,
            )
        return point

    def reference_jax(self, key, shape=()):
        """Jittable batch of reference draws, shape (*shape, d)."""
        import jax
        import jax.numpy as jnp

        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        keys = jax.random.split(key, self.d())
        cols = []
        for dist, ref, k in zip(self.dists, self.ref_pdfs, keys):
            if ref is None:
                cols.append(dist.sample(k, shape))
            elif isinstance(ref, float):
                cols.append(jnp.full(shape, ref))
            else:
                cols.append(ref.sample(k, shape))
        return jnp.stack(cols, axis=-1)

    def reference_is_pointlike(self) -> bool:
        return all(isinstance(r, float) for r in self.ref_pdfs) and bool(self.ref_pdfs)

    def reference_variances(self) -> np.ndarray:
        """Variance of each ref pdf (prior variance if no ref; nan if fixed ref)."""
        out = np.empty(self.d())
        for i, (dist, ref) in enumerate(zip(self.dists, self.ref_pdfs)):
            if ref is None:
                out[i] = dist.scipy_dist.var()
            elif isinstance(ref, float):
                out[i] = np.nan
            else:
                out[i] = ref.scipy_dist.var()
        return out
