"""General utilities.

Capability parity with /root/reference/cobaya/tools.py (numbers-with-units,
external-function compilation, covariance/Cholesky helpers, optimal
parameter-block ordering, fuzzy name suggestions).  Implementations are
original; the block-ordering cost model follows the algorithm described in
the cobaya paper (Torrado & Lewis arXiv:2005.05290, appendix).
"""

from __future__ import annotations

import ast
import difflib
import math
import numbers
import re
from collections.abc import Mapping, Sequence
from copy import deepcopy
from itertools import permutations
from typing import Any, Callable

import numpy as np

from .log import LoggedError, get_logger

log = get_logger("tools")


# --------------------------------------------------------------------------
# numbers with units ("40d" = 40 x dimension, "60s" = 60 seconds)
# --------------------------------------------------------------------------
class NumberWithUnits:
    """A number optionally tagged with a unit suffix, e.g. ``"40d"``.

    ``value`` is resolved once a scale (the numeric meaning of one unit) is
    known.  Plain numbers have ``unit is None`` and ``value`` set directly.
    """

    def __init__(self, n_with_unit: Any, unit: str, dtype=float, scale=None):
        self.unit: str | None = None
        self.value: float = math.nan

        def cast(x) -> float | int:
            val = float(x)
            if dtype is int and math.isfinite(val):
                if val == 0:
                    return 0
                return int(math.copysign(max(abs(val), 1), val))
            return val

        if isinstance(n_with_unit, str):
            text = n_with_unit.strip().lower()
            unit = unit.lower()
            if not text.endswith(unit):
                raise LoggedError(
                    log, "string '%s' lacks expected unit '%s'", n_with_unit, unit
                )
            self.unit = unit
            head = text[: -len(unit)]
            try:
                self.unit_value = cast(head) if head else dtype(1)
            except ValueError as exc:
                raise LoggedError(
                    log, "cannot parse number from '%s'", n_with_unit
                ) from exc
        else:
            try:
                self.unit_value = cast(n_with_unit)
            except (TypeError, ValueError) as exc:
                raise LoggedError(
                    log, "cannot convert %r to a number", n_with_unit
                ) from exc
            self.value = self.unit_value
        self.set_scale(1 if scale is None else scale)

    def set_scale(self, scale) -> None:
        if self.unit:
            self.scale = scale
            self.value = self.unit_value * scale

    def __bool__(self) -> bool:
        return bool(self.unit_value)


def read_dnumber(n: Any, dim: int):
    """Resolve a number given possibly as a multiple of the dimension."""
    return NumberWithUnits(n, "d", dtype=int, scale=dim).value


# --------------------------------------------------------------------------
# external function compilation (string lambdas in input files)
# --------------------------------------------------------------------------
def is_valid_variable_name(name: str) -> bool:
    return isinstance(name, str) and name.isidentifier() and not _is_keyword(name)


def _is_keyword(name: str) -> bool:
    import keyword

    return keyword.iskeyword(name)


def get_external_function(spec, name: str | None = None) -> Callable:
    """Turn a function spec (callable or lambda/def source string) into a callable.

    String lambdas are evaluated with jax.numpy available as both ``np`` and
    ``jnp`` (plus ``numpy`` as the real numpy), so that dynamically-defined
    parameters and external priors trace under jit.  This replaces the
    reference's numpy-`eval` scheme (parameterization.py / prior.py) with a
    trace-compatible one.
    """
    if callable(spec):
        return spec
    if not isinstance(spec, str):
        raise LoggedError(log, "Expected callable or string for %s, got %r", name, spec)
    import jax.numpy as jnp

    from ..dists import traced_stats

    namespace: dict[str, Any] = {
        "np": jnp, "jnp": jnp, "numpy": np, "math": math,
        # scipy.stats facade with jittable logpdf/pdf for common families,
        # so e.g. the Planck SZ joint prior traces into the device program
        "stats": traced_stats,
        "lambda_": None,
    }
    import importlib

    namespace["import_module"] = importlib.import_module
    try:
        tree = ast.parse(spec, mode="eval")
        fn = eval(compile(tree, "<input-function>", "eval"), namespace)  # noqa: S307
        if not callable(fn):
            raise ValueError("expression does not evaluate to a callable")
    except Exception as exc:
        raise LoggedError(
            log, "Could not load '%s' as a function: %s", spec, exc
        ) from exc
    if isinstance(tree.body, ast.Lambda):
        # only label anonymous lambdas: renaming an imported module-level
        # function would mutate the user's shared object
        fn.__doc__ = spec
        if name:
            fn.__name__ = name
    return fn


def getfullargspec_args(fn: Callable) -> list[str]:
    import inspect

    try:
        return list(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return []


# --------------------------------------------------------------------------
# matrix helpers
# --------------------------------------------------------------------------
def cov_to_std_and_corr(cov: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Standard deviations (1D) and correlation matrix of a covariance."""
    cov = np.asarray(cov, dtype=float)
    std = np.sqrt(np.diag(cov))
    inv = np.where(std > 0, 1.0 / np.where(std > 0, std, 1.0), 0.0)
    corr = cov * inv[:, None] * inv[None, :]
    np.fill_diagonal(corr, 1.0)
    return std, corr


def choleskyL_corr(M: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decompose M = (S Lp)(S Lp)^T with S = diag(std) and Lp = chol(corr).

    Returns (S, Lp).  Used to build decorrelating affine transforms for the
    blocked proposal.
    """
    std, corr = cov_to_std_and_corr(M)
    return np.diag(std), np.linalg.cholesky(corr)


def KL_norm(m1=None, S1=(), m2=None, S2=(), symmetric=False) -> float:
    """KL divergence between two multivariate normals."""
    S1 = np.atleast_2d(np.asarray(S1, dtype=float))
    dim = S1.shape[0]
    assert dim, "Must give at least S1"
    m1 = np.zeros(dim) if m1 is None else np.asarray(m1, dtype=float)
    S2 = np.atleast_2d(np.asarray(S2, dtype=float))
    if not S2.shape[0]:
        S2 = np.identity(dim)
    m2 = np.zeros(dim) if m2 is None else np.asarray(m2, dtype=float)

    def _kl(ma, Sa, mb, Sb):
        Sb_inv = np.linalg.inv(Sb)
        dm = mb - ma
        return 0.5 * (
            np.trace(Sb_inv @ Sa)
            + dm @ Sb_inv @ dm
            - dim
            + np.log(np.linalg.det(Sb) / np.linalg.det(Sa))
        )

    if symmetric:
        return _kl(m1, S1, m2, S2) + _kl(m2, S2, m1, S1)
    return _kl(m1, S1, m2, S2)


def inverse_cholesky(cov: np.ndarray) -> np.ndarray:
    """Inverse of the lower Cholesky factor of ``cov``."""
    import scipy.linalg

    L = np.linalg.cholesky(np.asarray(cov, dtype=float))
    return scipy.linalg.solve_triangular(L, np.eye(L.shape[0]), lower=True)


# --------------------------------------------------------------------------
# optimal parameter-block ordering (speed hierarchy)
# --------------------------------------------------------------------------
def sort_parameter_blocks(
    blocks: Sequence[Sequence[str]],
    speeds: Sequence[float],
    footprints: Sequence[Sequence[int]],
    oversample_power: float = 0.0,
):
    """Find the block ordering minimizing total cost of varying every param.

    In the Cholesky-mixed basis, moving a parameter of the block at position
    ``i`` forces recomputation of every component required by blocks at
    positions ``>= i``.  We therefore search over permutations for the one
    minimizing ``sum_i n_i * oversample_i * cost_i`` where ``cost_i`` is the
    cost of all components footprinted by blocks ``i..end`` and
    ``oversample_i = (cost_0 / cost_i) ** oversample_power``.

    Returns ``(ordering, per_block_costs, oversample_factors)`` with costs and
    factors given in the optimal order.  Reference behavior:
    /root/reference/cobaya/tools.py:955 (algorithm from arXiv:2005.05290).
    """
    n_per_block = np.array([len(b) for b in blocks])
    comp_costs = 1.0 / np.asarray(speeds, dtype=float)
    foot = np.asarray(footprints)
    nb = len(n_per_block)
    if oversample_power >= 1:
        ordering, _, _ = sort_parameter_blocks(
            blocks, speeds, footprints, oversample_power=1 - 1e-3
        )
        candidate_orderings = [tuple(ordering)]
    else:
        candidate_orderings = list(permutations(range(nb)))

    # upper-triangular accumulation: cost at position i includes footprints of
    # all positions >= i
    best = None
    for order in candidate_orderings:
        f = foot[list(order)]
        # cumulative OR of footprints from the end
        cum = np.minimum(1, np.cumsum(f[::-1], axis=0)[::-1])
        costs = cum @ comp_costs
        oversample = (costs[0] / costs) ** oversample_power
        total = float((n_per_block[list(order)] * oversample) @ costs)
        if best is None or total < best[0]:
            best = (total, order, costs, oversample)
    assert best is not None
    _, order, costs, oversample = best
    return order, costs, np.floor(oversample).astype(int)


# --------------------------------------------------------------------------
# misc
# --------------------------------------------------------------------------
def str_to_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, str):
        return [x]
    return list(x)


def ensure_latex(string: str) -> str:
    s = string.strip()
    if not s.startswith("$"):
        s = "$" + s
    if not s.endswith("$"):
        s = s + "$"
    return s


def ensure_nolatex(string: str) -> str:
    return string.strip().strip("$")


def fuzzy_match(name: str, candidates: Sequence[str], n: int = 3) -> list[str]:
    """Closest matches for an unrecognized name ("did you mean ...")."""
    return difflib.get_close_matches(name, candidates, n=n, cutoff=0.5)


def similar_internal_class_names(name: str) -> list[str]:
    from ..models.component import get_available_internal_class_names

    return fuzzy_match(name, get_available_internal_class_names())


def are_different_params_lists(
    list_A: Sequence, list_B: Sequence, name_A="A", name_B="B"
) -> dict:
    """Duplicates within and differences between two name lists."""
    result = {}
    for tag, lst in ((name_A, list(list_A)), (name_B, list(list_B))):
        dups = {x for x in lst if lst.count(x) > 1}
        if dups:
            result[f"duplicate_{tag}"] = sorted(dups)
    only_A = set(list_A) - set(list_B)
    only_B = set(list_B) - set(list_A)
    if only_A:
        result[f"{name_A}_but_not_{name_B}"] = sorted(only_A)
    if only_B:
        result[f"{name_B}_but_not_{name_A}"] = sorted(only_B)
    return result


def deepcopy_where_possible(d):
    """Deep copy that falls back to reference-sharing for uncopyable leaves.

    Framework component instances, classes, and bound methods are kept by
    reference (reference tools.py:925-930): copying them would break
    instance identity for ready-made components passed in the input.
    """
    if isinstance(d, Mapping):
        return {k: deepcopy_where_possible(v) for k, v in d.items()}
    if isinstance(d, (list, tuple)):
        return type(d)(deepcopy_where_possible(x) for x in d)
    from .log import HasLogger

    if isinstance(d, (HasLogger, type)):
        return d
    if callable(d) and hasattr(d, "__self__"):
        return d  # bound method
    try:
        return deepcopy(d)
    except Exception:
        return d


def recursive_update(base, update, copied=True):
    """Deep-merge ``update`` into ``base`` (update wins); returns new dict."""
    if copied:
        base = deepcopy_where_possible(base) if base else {}
    base = base or {}
    for k, v in (update or {}).items():
        if isinstance(v, Mapping) and isinstance(base.get(k), Mapping):
            base[k] = recursive_update(base[k], v, copied=False)
        else:
            base[k] = v
    return base


def prepare_comment(comment: str) -> str:
    return "".join(
        "# " + line.lstrip("#").strip() + "\n"
        for line in comment.split("\n") if line.strip()
    )


def truncate_to_end_line(file_name: str) -> None:
    """Drop a trailing incomplete (no-newline) last line of a text file."""
    with open(file_name, "r+b") as f:
        f.seek(0, 2)
        end = f.tell()
        if end == 0:
            return
        f.seek(end - 1)
        if f.read(1) == b"\n":
            return
        pos = end - 1
        while pos > 0:
            f.seek(pos - 1)
            if f.read(1) == b"\n":
                break
            pos -= 1
        f.seek(pos)
        f.truncate()


def format_time(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{seconds * 1e6:.3g} us"
    if seconds < 1:
        return f"{seconds * 1e3:.3g} ms"
    return f"{seconds:.3g} s"


_NOT_SET = object()


def getattr_chain(obj, path: str, default=_NOT_SET):
    cur = obj
    for part in path.split("."):
        cur = getattr(cur, part, _NOT_SET)
        if cur is _NOT_SET:
            if default is _NOT_SET:
                raise AttributeError(path)
            return default
    return cur


# --------------------------------------------------------------------------
# Pools of requested computation points (z-grids etc., for theory codes)
# --------------------------------------------------------------------------
class Pool1D:
    """Accumulates requested 1D values; computed union is sorted + unique."""

    def __init__(self, values=None):
        self._values: set[float] = set()
        if values is not None:
            self.update(values)

    def update(self, values):
        self._values.update(float(v) for v in np.atleast_1d(values))

    d = 1

    @property
    def values(self) -> np.ndarray:
        return np.array(sorted(self._values))

    def __getitem__(self, idx):
        return self.values[idx]

    def indices(self, values) -> np.ndarray:
        pool = self.values
        req = np.atleast_1d(values).astype(float)
        idx = np.searchsorted(pool, req)
        if not np.allclose(pool[np.clip(idx, 0, len(pool) - 1)], req):
            raise LoggedError(log, "Requested values not in pool: %s", req)
        return idx

    def find_indices(self, values, rtol: float = 1e-3,
                     atol: float = 1e-6) -> np.ndarray:
        """Indices of the pool elements closest to ``values``, matched within
        tolerance; raises ValueError on a miss (reference tools.py:1334)."""
        pool = self.values
        req = np.atleast_1d(np.asarray(values, dtype=float).squeeze())
        req = req.reshape(-1)
        hi = np.clip(np.searchsorted(pool, req), 0, len(pool) - 1)
        lo = np.clip(hi - 1, 0, len(pool) - 1)
        pick = np.where(
            np.abs(pool[hi] - req) <= np.abs(pool[lo] - req), hi, lo
        )
        ok = np.isclose(pool[pick], req, rtol=rtol, atol=atol)
        if not np.all(ok):
            raise ValueError(
                f"Could not find {req[~ok]} in pool (closest: "
                f"{pool[pick[~ok]]})"
            )
        return pick


class Pool2D:
    """Accumulates requested 2D pairs (e.g. (z1, z2) pairs)."""

    def __init__(self, values=None):
        self._values: set[tuple[float, float]] = set()
        if values is not None:
            self.update(values)

    def update(self, values):
        for pair in np.atleast_2d(values):
            self._values.add((float(pair[0]), float(pair[1])))

    d = 2

    @property
    def values(self) -> np.ndarray:
        return np.array(sorted(self._values))

    def __getitem__(self, idx):
        return self.values[idx]

    def indices(self, values) -> np.ndarray:
        pool = [tuple(p) for p in self.values.tolist()]
        lookup = {p: i for i, p in enumerate(pool)}
        req = np.atleast_2d(values)
        try:
            return np.array([lookup[(float(a), float(b))] for a, b in req])
        except KeyError as exc:
            raise LoggedError(log, "Requested pair not in pool: %s", exc) from exc

    def find_indices(self, values, rtol: float = 1e-3,
                     atol: float = 1e-6) -> np.ndarray:
        """Indices of pool pairs matching ``values`` within tolerance;
        raises ValueError on a miss (reference tools.py:1334)."""
        pool = self.values
        req = np.atleast_2d(np.asarray(values, dtype=float))
        out = np.empty(len(req), dtype=int)
        for i, pair in enumerate(req):
            close = np.flatnonzero(
                np.all(np.isclose(pool, pair, rtol=rtol, atol=atol), axis=1)
            )
            if not len(close):
                raise ValueError(f"Could not find {pair} in pool.")
            out[i] = close[0]
        return out


def ensure_callback_thread_x64(specs) -> None:
    """Keep 64-bit host-callback results from being downcast by JAX.

    ``jax.pure_callback`` results pass through ``dtypes.canonicalize_value``
    on the RUNTIME thread that executes the callback.  ``jax.enable_x64`` is
    thread-local: a worker thread spawned while x64 was off silently
    downcasts a declared-float64 result to float32 and the callback errors
    with a dtype mismatch.  Call this inside the host callback (it runs on
    the same thread as the canonicalization) whenever the declared result
    spec contains 64-bit dtypes; it pins this thread's x64 state on, which
    is a no-op for 32-bit results.
    """
    if any(np.dtype(s.dtype).itemsize == 8 and np.dtype(s.dtype).kind in "fiu"
           for s in specs):
        from jax._src import config as _jax_config

        if not _jax_config.enable_x64.value:
            _jax_config.enable_x64.set_local(True)
