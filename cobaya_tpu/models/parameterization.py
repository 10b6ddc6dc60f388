"""Parameter roles and translation between sampler and likelihood spaces.

Capability parity with /root/reference/cobaya/parameterization.py: three
parameter roles — sampled (has ``prior``), fixed/function (``value``),
derived (``derived``) — with shorthand expansion, ``drop`` semantics,
renames, LaTeX labels, and dependency-ordered evaluation of dynamically
defined (lambda) parameters.

TPU-first design difference: ``to_input`` / ``to_derived`` are *pure*
functions of their inputs (no instance state is mutated by the hot path), so
they trace cleanly under ``jit``/``vmap``; dynamic-parameter lambdas are
compiled with jax.numpy in scope and evaluate on-device for whole walker
batches at once.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from numbers import Real
from typing import Any, Callable

import numpy as np

from ..utils.log import HasLogger, LoggedError
from ..utils.tools import (
    deepcopy_where_possible,
    ensure_nolatex,
    get_external_function,
    getfullargspec_args,
    is_valid_variable_name,
    str_to_list,
)
from ..utils.typing_ import ParamDict, ParamsDict, ParamValuesDict, partags


def is_fixed_or_function_param(info_param) -> bool:
    return expand_info_param(info_param).get("value") is not None


def is_sampled_param(info_param) -> bool:
    return "prior" in expand_info_param(info_param)


def is_derived_param(info_param) -> bool:
    return expand_info_param(info_param).get("derived", False) is not False


def expand_info_param(info_param, default_derived: bool = True) -> ParamDict:
    """Expand shorthand parameter specs to the unambiguous dict form.

    Shorthands (reference schema, parameterization.py:60):
    number/string-lambda -> fixed ``value``; 2-list -> uniform ``prior``;
    4/5-list -> prior + ref (loc, scale) [+ proposal]; None/latex-only dict ->
    derived.
    """
    info = deepcopy_where_possible(info_param)
    if not isinstance(info, Mapping):
        if info is None:
            info = {}
        elif isinstance(info, Sequence) and not isinstance(info, str):
            values = list(info)
            if len(values) not in (2, 4, 5):
                raise LoggedError(
                    __name__,
                    "Parameter shorthand list must have length 2, 4 or 5; got %d",
                    len(values),
                )
            info = {"prior": [values[0], values[1]]}
            if len(values) >= 4:
                info["ref"] = [values[2], values[3]]
            if len(values) == 5:
                info["proposal"] = values[4]
        else:
            info = {"value": info}
    else:
        info = dict(info)
    if all(k not in info for k in ("prior", "value", "derived")):
        info["derived"] = default_derived
    value = info.get("value")
    if isinstance(value, str) or callable(value):
        # dynamically-defined input params are saved as derived by default
        info["derived"] = info.get("derived", True)
    return info


def reduce_info_param(info_param: ParamDict):
    """Inverse of :func:`expand_info_param`: drop defaults for compact dumps."""
    info = deepcopy_where_possible(info_param)
    if not isinstance(info, dict):
        return None
    if info.get("derived") is True:
        info.pop("derived")
    if list(info) == ["value"] and not callable(info["value"]):
        return info["value"]
    return info


def _toposort_funcs(
    funcs: dict[str, Callable],
    args: dict[str, list[str]],
    known: set[str],
    logger,
    what: str,
) -> list[str]:
    """Order function-params so dependencies are computed first."""
    order: list[str] = []
    pending = dict(args)
    resolved = set(known)
    while pending:
        progress = False
        for p in list(pending):
            if all(a in resolved or a not in funcs for a in pending[p]):
                order.append(p)
                resolved.add(p)
                del pending[p]
                progress = True
        if not progress:
            raise LoggedError(
                logger, "Circular dependency among %s parameters: %s",
                what, list(pending),
            )
    return order


class Parameterization(HasLogger):
    """Manages parameter roles and sampler<->likelihood translation."""

    def __init__(
        self,
        info_params: ParamsDict,
        allow_renames: bool = True,
        ignore_unused_sampled: bool = False,
    ):
        self.set_logger()
        self.allow_renames = allow_renames
        self._infos: dict[str, ParamDict] = {}
        self._constant: ParamValuesDict = {}
        self._sampled: list[str] = []
        self._sampled_renames: dict[str, list[str]] = {}
        self._input_order: list[str] = []  # all input params, in input order
        self._input_funcs: dict[str, Callable] = {}
        self._input_args: dict[str, list[str]] = {}
        self._derived: list[str] = []  # saved derived params, in order
        self._derived_funcs: dict[str, Callable] = {}
        self._derived_args: dict[str, list[str]] = {}
        self._derived_inputs: list[str] = []  # derived that mirror an input value
        self._output: list[str] = []  # params computed by components
        self._dropped: set[str] = set()

        for p, raw in info_params.items():
            if isinstance(raw, Mapping) and not set(raw).issubset(partags):
                raise LoggedError(
                    self.log, "Parameter '%s' has unknown options %s",
                    p, set(raw) - partags,
                )
            info = expand_info_param(raw)
            self._infos[p] = info
            if is_fixed_or_function_param(info):
                if isinstance(info["value"], Real):
                    self._constant[p] = float(info["value"])
                    self._input_order.append(p)
                else:
                    self._input_funcs[p] = get_external_function(info["value"], p)
                    self._input_args[p] = getfullargspec_args(self._input_funcs[p])
                    self._input_order.append(p)
                if info.get("drop"):
                    self._dropped.add(p)
            if is_sampled_param(info):
                self._sampled.append(p)
                self._input_order.append(p)
                if info.get("drop"):
                    self._dropped.add(p)
                self._sampled_renames[p] = str_to_list(info.get("renames") or [])
            if is_derived_param(info):
                if info.get("periodic", False) and (
                    info.get("min") is None or info.get("max") is None
                ):
                    raise LoggedError(
                        self.log,
                        "Derived parameter '%s' is periodic but lacks min/max.", p,
                    )
                self._derived.append(p)
                if info["derived"] is True and is_fixed_or_function_param(info):
                    self._derived_inputs.append(p)
                elif info["derived"] is True:
                    self._output.append(p)
                else:
                    self._derived_funcs[p] = get_external_function(info["derived"], p)
                    self._derived_args[p] = getfullargspec_args(self._derived_funcs[p])

        for p in list(self._sampled) + list(self._derived):
            if not is_valid_variable_name(p):
                raise LoggedError(
                    self.log,
                    "Parameter name '%s' is not a valid Python variable name. "
                    "Define an alias with a valid name via a dynamic parameter.", p,
                )

        known_input = set(self._input_order)
        all_input_args = set()
        for a in self._input_args.values():
            all_input_args.update(a)
        bad = all_input_args - known_input
        if bad:
            raise LoggedError(
                self.log,
                "Input parameters defined as functions can only depend on other "
                "input parameters; %r are not input parameters.", sorted(bad),
            )
        # unknown derived-function args are assumed to be component outputs
        all_derived_args = set()
        for a in self._derived_args.values():
            all_derived_args.update(a)
        for arg in sorted(
            (all_input_args | all_derived_args) - known_input - set(self._derived)
        ):
            self._output.append(arg)

        self._directly_output = [p for p in self._derived if p in self._output]
        self._input_func_order = _toposort_funcs(
            self._input_funcs, self._input_args,
            set(self._constant) | set(self._sampled), self.log, "input",
        )
        self._derived_func_order = _toposort_funcs(
            self._derived_funcs, self._derived_args,
            known_input | set(self._output) | set(self._derived_inputs),
            self.log, "derived",
        )
        # which input params change when each sampled param changes
        self._sampled_input_dependence = {
            s: [
                p for p in self._input_funcs
                if s in self._transitive_args(p)
            ]
            for s in self._sampled
        }
        if not ignore_unused_sampled:
            self._dropped_not_directly_used = self._dropped.intersection(
                p for p, deps in self._sampled_input_dependence.items() if not deps
            )
        else:
            self._dropped_not_directly_used = set()

    def _transitive_args(self, p: str) -> set[str]:
        seen: set[str] = set()
        stack = list(self._input_args.get(p, []))
        while stack:
            a = stack.pop()
            if a in seen:
                continue
            seen.add(a)
            stack.extend(self._input_args.get(a, []))
        return seen

    # ---- introspection -------------------------------------------------------
    def dropped_param_set(self) -> set[str]:
        return set(self._dropped)

    def input_params(self) -> ParamValuesDict:
        return {p: np.nan for p in self._input_order}

    def output_params(self) -> ParamValuesDict:
        return {p: np.nan for p in self._output}

    def constant_params(self) -> ParamValuesDict:
        return dict(self._constant)

    def sampled_params(self) -> ParamValuesDict:
        return {p: np.nan for p in self._sampled}

    def sampled_params_info(self) -> dict[str, ParamDict]:
        return {
            p: deepcopy_where_possible(self._infos[p]) for p in self._sampled
        }

    def sampled_params_renames(self) -> dict[str, list[str]]:
        return {p: list(r) for p, r in self._sampled_renames.items()}

    def derived_params(self) -> ParamValuesDict:
        return {p: np.nan for p in self._derived}

    def derived_params_info(self) -> dict[str, ParamDict]:
        return {
            p: deepcopy_where_possible(self._infos[p]) for p in self._derived
        }

    def get_sampled_params_proposals(self) -> dict[str, float | None]:
        return {p: self._infos[p].get("proposal") for p in self._sampled}

    def sampled_input_dependence(self) -> dict[str, list[str]]:
        return {p: list(d) for p, d in self._sampled_input_dependence.items()}

    @property
    def input_dependencies(self) -> dict[str, set[str]]:
        return {p: self._transitive_args(p) for p in self._input_funcs}

    def labels(self) -> dict[str, str]:
        return {
            p: ensure_nolatex(info.get("latex") or p.replace("_", r"\ "))
            for p, info in self._infos.items()
        }

    def get_bounds(self) -> dict[str, tuple[float, float]]:
        """Literal min/max bounds declared per parameter (for derived params)."""
        out = {}
        for p, info in self._infos.items():
            # a present-but-null key ('min:' in YAML) means unbounded too
            lo = info.get("min")
            hi = info.get("max")
            out[p] = (float(-np.inf if lo is None else lo),
                      float(np.inf if hi is None else hi))
        return out

    # ---- hot-path translation (pure, trace-safe) ------------------------------
    def to_input(self, sampled_params_values) -> ParamValuesDict:
        """All input-parameter values given the sampled ones.

        Accepts an array (ordered like ``sampled_params()``) or a dict.
        Pure function: returns a fresh dict; values may be traced arrays.
        """
        if isinstance(sampled_params_values, Mapping):
            sampled = dict(sampled_params_values)
        else:
            sampled = dict(zip(self._sampled, sampled_params_values))
        values: dict[str, Any] = dict(self._constant)
        values.update(sampled)
        for p in self._input_func_order:
            func, args = self._input_funcs[p], self._input_args[p]
            try:
                values[p] = func(*[values.get(a) for a in args])
            except Exception as exc:
                raise LoggedError(
                    self.log, "Error evaluating input parameter '%s': %s", p, exc
                ) from exc
        return values

    def to_derived(
        self, output_params_values, input_values: Mapping | None = None
    ) -> ParamValuesDict:
        """Values of all saved derived params, given component outputs.

        ``input_values`` must be the dict previously returned by
        :meth:`to_input` for the same point (pure-style threading replaces the
        reference's instance-state caching).
        """
        if not isinstance(output_params_values, Mapping):
            output_params_values = dict(zip(self._output, output_params_values))
        input_values = dict(input_values or {})
        derived: dict[str, Any] = {}
        for p in self._directly_output:
            derived[p] = output_params_values[p]
        for p in self._derived_inputs:
            derived[p] = input_values[p]
        scope = {**input_values, **output_params_values, **derived}
        for p in self._derived_func_order:
            func, args = self._derived_funcs[p], self._derived_args[p]
            try:
                val = func(*[scope.get(a) for a in args])
            except Exception as exc:
                raise LoggedError(
                    self.log, "Error evaluating derived parameter '%s': %s", p, exc
                ) from exc
            derived[p] = val
            scope[p] = val
        return {p: derived[p] for p in self._derived}

    def check_sampled(self, sampled_params):
        if sampled_params is None:
            sampled_params = []
        if hasattr(sampled_params, "keys"):
            return self.check_sampled_dict(**sampled_params)
        if len(sampled_params) != len(self._sampled):
            raise LoggedError(
                self.log,
                "Wrong number of sampled parameters: %d given vs %d expected",
                len(sampled_params), len(self._sampled),
            )
        return sampled_params

    def check_sampled_dict(self, **sampled_params) -> ParamValuesDict:
        out: ParamValuesDict = {}
        given = dict(sampled_params)
        for p, renames in self._sampled_renames.items():
            names = [p] + (renames if self.allow_renames else [])
            found = [n for n in names if n in given]
            if not found:
                raise LoggedError(
                    self.log, "Missing sampled parameter '%s' (renames: %s)",
                    p, renames,
                )
            out[p] = given.pop(found[0])
        if given:
            raise LoggedError(
                self.log, "Unknown sampled parameters passed: %s", list(given)
            )
        return out

    def check_dropped(self, external_dependence: set[str]):
        """Error if dropped sampled params are used nowhere (not even priors)."""
        unused = self._dropped_not_directly_used - set(external_dependence)
        if unused:
            raise LoggedError(
                self.log,
                "Dropped sampled parameters not used by any function: %r",
                sorted(unused),
            )
