"""Likelihoods: theories exposing a log-likelihood.

Capability parity with /root/reference/cobaya/likelihood.py: the
``LikelihoodInterface`` contract (``current_logp``), class-based likelihoods
implementing ``logp(**params)``, external-function likelihoods with argspec
introspection and ``_self`` provider access, the params-absorbing unit
likelihood, and ``LikelihoodCollection`` with aggregated type labels.

TPU-first: jittable likelihoods implement ``logp_jax(params, provider) ->
(logp, derived)`` in jnp; the eager ``logp(**params)`` default delegates to
it, so there is a single source of truth for both the hot device path and the
cobaya-style scripted API.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Optional

import numpy as np

from ..utils.log import LoggedError
from ..utils.tools import getfullargspec_args, str_to_list
from .component import ComponentCollection, get_component_class
from .theory import Theory


class LikelihoodInterface:
    """Mixin marking a component that contributes a log-likelihood."""

    @property
    def current_logp(self) -> float:
        value = self.current_state.get("logp")  # type: ignore[attr-defined]
        if value is None:
            return np.nan
        return float(np.asarray(value))


def is_LikelihoodInterface(cls) -> bool:
    return isinstance(cls, type) and issubclass(cls, LikelihoodInterface)


class Likelihood(Theory, LikelihoodInterface):
    """Base class for likelihoods."""

    type: Optional[str | list] = None  # aggregated chi2 labels
    delay: float = 0  # artificial per-evaluation sleep (testing aid)

    def get_requirements(self):
        return {}

    def wait(self):
        """Sleep ``delay`` seconds (reference likelihood.py:140)."""
        if getattr(self, "delay", 0):
            import time

            self.log.debug("Sleeping for %f seconds.", self.delay)
            time.sleep(self.delay)

    def logp(self, _derived: dict | None = None, **params_values) -> float:
        """Eager log-likelihood; default delegates to :meth:`logp_jax`,
        exposing upstream products by provider-component name (the same view
        the jitted path threads through)."""
        provider_products = {}
        if self.provider is not None:
            for comp in self.provider.requirement_providers.values():
                provider_products.setdefault(comp.get_name(), comp.current_state)
        logp, derived = self._split_logp_jax(
            self.logp_jax(params_values, provider_products)
        )
        if _derived is not None and derived:
            _derived.update(derived)
        return logp

    @staticmethod
    def _split_logp_jax(result):
        """``logp_jax`` may return a bare scalar or ``(logp, derived)``."""
        if isinstance(result, tuple):
            return result[0], (result[1] or {})
        return result, {}

    def logp_jax(
        self, params: Mapping[str, Any],
        provider_products: Mapping[str, Any] | None = None,
    ) -> tuple[Any, dict]:
        """Traced log-likelihood: (scalar logp, derived dict), jnp values."""
        raise LoggedError(
            self.log, "Likelihood '%s' implements neither logp nor logp_jax.",
            self.get_name(),
        )

    def calculate(self, state: dict, want_derived: bool = True,
                  **params_values_dict):
        derived: dict | None = {} if want_derived else None
        state["logp"] = self.logp(_derived=derived, **params_values_dict)
        if want_derived:
            state["derived"] = derived

    def calculate_jax(self, params, want_derived=True, provider_products=None):
        logp, derived = self._split_logp_jax(
            self.logp_jax(params, provider_products)
        )
        return {"logp": logp}, (derived if want_derived else {})

    def marginal(self, directions=None, params_values=None):
        raise LoggedError(self.log, "Exact marginal likelihood not implemented.")

    def get_type_list(self) -> list[str]:
        return str_to_list(self.type or [])


class AbsorbUnusedParamsLikelihood(Likelihood):
    """A likelihood that absorbs any unassigned parameters (the 'one' base)."""

    def get_allow_agnostic(self):
        return True


class LikelihoodExternalFunction(Likelihood):
    """Wraps a user-supplied callable as a likelihood.

    The callable's signature determines its input params; a ``_self`` argument
    gives it access to this component (and through it the provider); extra
    requirements can be declared via the ``requires`` info key; derived
    params are returned via an ``_derived`` dict argument or as the tail of a
    returned tuple.  Reference behavior: likelihood.py:150.
    """

    def __init__(self, info: Mapping, name: str, timing=None):
        external = info.get("external")
        if not callable(external):
            raise LoggedError(None, "'external' entry of '%s' is not callable.", name)
        self.external_function = external
        argnames = getfullargspec_args(external)
        import inspect

        sig = inspect.signature(external)
        self._self_arg = "_self" in argnames
        self._derived_arg = "_derived" in argnames
        self._has_var_kwargs = any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in sig.parameters.values()
        )
        self._input_arg_names = [
            a for a in argnames if a not in ("_self", "_derived")
            and sig.parameters[a].kind is not inspect.Parameter.VAR_KEYWORD
            and sig.parameters[a].default is inspect.Parameter.empty
        ]
        self._optional_args = [
            a for a in argnames if a not in ("_self", "_derived")
            and sig.parameters[a].kind is not inspect.Parameter.VAR_KEYWORD
            and sig.parameters[a].default is not inspect.Parameter.empty
        ]
        self._jittable: bool | None = None
        base_info = {
            k: v for k, v in info.items()
            if k not in ("external", "requires", "input_params", "output_params")
        }
        self._declared_requirements = info.get("requires") or {}
        base_info.setdefault("type", info.get("type"))
        super().__init__(base_info, name=name, timing=timing, standalone=False)
        self.input_params = list(
            info.get("input_params") or self._input_arg_names
        )
        self.output_params = list(info.get("output_params") or [])

    def get_requirements(self):
        return self._declared_requirements

    def get_can_support_params(self):
        return self._optional_args

    def logp(self, _derived: dict | None = None, **params_values):
        """Eager host evaluation: call the external function directly (no
        tracing machinery — this is the host-callback bridge's path)."""
        names = self._accepted_params(params_values)
        logp, derived = self._call_external(
            {n: params_values[n] for n in names}
        )
        if _derived is not None and derived:
            _derived.update(derived)
        return logp

    def _accepted_params(self, params) -> list:
        accepted = set(self._input_arg_names) | set(self._optional_args)
        if self._has_var_kwargs:
            accepted |= set(self.input_params)
        return [p for p in params if p in accepted]

    def _call_external(self, kwargs: dict):
        """One evaluation: returns ``(logp, derived_dict)``."""
        derived: dict = {}
        if self._self_arg:
            kwargs["_self"] = self
        if self._derived_arg:
            kwargs["_derived"] = derived
        result = self.external_function(**kwargs)
        if isinstance(result, tuple):
            logp, extra = result[0], result[1]
            if isinstance(extra, Mapping):
                derived.update(extra)
            else:
                derived.update(dict(zip(self.output_params, np.atleast_1d(extra))))
        else:
            logp = result
        return logp, derived

    def logp_jax(self, params, provider_products=None):
        """Traced evaluation; probes jittability once and falls back to a
        ``jax.pure_callback`` for numpy-style callables (same contract as
        ExternalPrior.logp_traced; reference evaluates on the host
        unconditionally, likelihood.py:228)."""
        import jax
        import jax.numpy as jnp

        names = self._accepted_params(params)
        vals = [params[p] for p in names]
        dtype = (jnp.result_type(*[jnp.asarray(v) for v in vals])
                 if vals else jnp.float32)
        if self._jittable is None:
            try:
                jax.eval_shape(
                    lambda *a: jnp.asarray(
                        self._call_external(dict(zip(names, a)))[0], dtype
                    ),
                    *[jax.ShapeDtypeStruct((), dtype) for _ in vals],
                )
                self._jittable = True
            except Exception:
                self._jittable = False
                self.mpi_info(
                    "External function '%s' is not jax-traceable; evaluating "
                    "through a host callback.", self.get_name(),
                )
        if self._jittable:
            return self._call_external(dict(zip(names, vals)))
        out_params = list(self.output_params)
        specs = (jax.ShapeDtypeStruct((), dtype),
                 jax.ShapeDtypeStruct((len(out_params),), dtype))

        def host(*a):
            from ..utils.tools import ensure_callback_thread_x64

            ensure_callback_thread_x64(specs)
            logp, derived = self._call_external(
                {n: np.asarray(v) for n, v in zip(names, a)}
            )
            dvec = np.asarray([derived.get(p, np.nan) for p in out_params],
                              dtype=dtype)
            return np.asarray(logp, dtype=dtype), dvec

        logp, dvec = jax.pure_callback(
            host, specs, *vals, vmap_method="sequential",
        )
        return logp, dict(zip(out_params, dvec))


class LikelihoodCollection(ComponentCollection):
    """Ordered collection of likelihood instances."""

    def __init__(self, info_likelihood: Mapping, packages_path=None,
                 timing=None, theory=None):
        super().__init__()
        # helper theories created by likelihoods join the theory collection
        # (reference likelihood.py:335)
        self.theory = theory
        for name, info in (info_likelihood or {}).items():
            if isinstance(info, Theory):
                # a ready-made component instance (reference likelihood.py:275)
                self.add_instance(name, info)
                continue
            if callable(info) and not isinstance(info, type):
                info = {"external": info}
            elif isinstance(info, str):
                # bare string lambda shorthand (reference input.py:249)
                info = {"external": info}
            info = dict(info or {})
            if "external" in info:
                external = info["external"]
                if isinstance(external, Theory):
                    self.add_instance(name, external)
                    continue
                if isinstance(external, str):
                    # string lambda from YAML input
                    from ..utils.tools import get_external_function

                    info = dict(info, external=get_external_function(
                        external, name
                    ))
                    external = info["external"]
                if isinstance(external, type):
                    if not issubclass(external, Theory):
                        raise LoggedError(
                            None, "External class '%s' must subclass Likelihood", name
                        )
                    self.add_instance(name, external(
                        info, name=name, timing=timing, packages_path=packages_path
                    ))
                elif callable(external):
                    self.add_instance(name, LikelihoodExternalFunction(
                        info, name, timing=timing
                    ))
                else:
                    raise LoggedError(
                        None, "'external' entry of '%s' is neither class nor "
                        "callable.", name,
                    )
                continue
            cls = get_component_class(
                name, kind="likelihood",
                component_path=info.pop("python_path", None),
                class_name=info.pop("class", None),
            )
            self.add_instance(name, cls(
                info, name=name, timing=timing, packages_path=packages_path
            ))
        for like in self.values():
            if not isinstance(like, LikelihoodInterface):
                raise LoggedError(
                    None, "'%s' is not a likelihood.", like.get_name()
                )

    def get_helper_theory_collection(self):
        return self.theory if self.theory is not None else self

    def get_type_dict(self) -> dict[str, list[str]]:
        return {name: like.get_type_list() for name, like in self.items()}

    @property
    def all_types(self) -> set:
        types = set()
        for like in self.values():
            types.update(like.get_type_list())
        return types
