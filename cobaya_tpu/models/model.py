"""Model: the posterior pipeline.

Capability parity with /root/reference/cobaya/model.py: requirement
resolution and provider assignment across theories/likelihoods, topological
component ordering with circular-dependency detection, the multi-rule
input/output parameter assignment algorithm, prior-short-circuited
``logposterior`` evaluation, per-likelihood ``chi2__*`` derived wiring,
speed-based parameter blocking (footprints x costs -> blocks + oversampling,
optional fast/slow split), speed measurement, and ``get_model()``.

TPU-first design: besides the eager cobaya-style API
(``model.logposterior(point)``), the Model compiles the whole pipeline into a
single pure jittable function over the sampled vector
(:meth:`Model.make_logposterior_fn`), which samplers ``vmap`` over thousands
of walkers.  Jittable components trace inline; non-jittable ones are bridged
with batched ``jax.pure_callback``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections.abc import Mapping, Sequence
from typing import Any, Callable

import numpy as np

from ..utils import conventions as cv
from ..utils.log import HasLogger, LoggedError, logger_setup
from ..utils.tools import (
    deepcopy_where_possible,
    ensure_callback_thread_x64,
    sort_parameter_blocks,
    str_to_list,
)
from ..utils.typing_ import InputDict
from .component import ComponentCollection, Timer
from .input_ import load_input_dict, update_info
from .likelihood import (
    AbsorbUnusedParamsLikelihood,
    LikelihoodCollection,
    LikelihoodInterface,
    is_LikelihoodInterface,
)
from .parameterization import Parameterization
from .prior import Prior
from .theory import Provider, Theory, TheoryCollection, check_requirement


@dataclasses.dataclass
class LogPosterior:
    """A posterior evaluation: log-priors, log-likelihoods, derived params.

    ``logpost = sum(logpriors) + sum(loglikes)`` (consistency enforced,
    cf. reference model.py:100).
    """

    logpost: float | None = None
    logpriors: Sequence[float] | None = None
    loglikes: Sequence[float] | None = None
    derived: Sequence[float] | None = None
    finite: bool = False

    def __post_init__(self):
        if self.logpriors is not None:
            self.logprior = float(np.sum(self.logpriors))
        else:
            self.logprior = None
        if self.loglikes is not None:
            self.loglike = float(np.sum(self.loglikes))
        else:
            self.loglike = None
        if self.logpost is None:
            if self.logprior is None or self.loglike is None:
                raise ValueError("Cannot compute logpost")
            self.logpost = (
                self.logprior + self.loglike
                if np.isfinite(self.logprior) else -np.inf
            )
        if self.finite:
            self.logpost = float(np.nan_to_num(self.logpost, nan=-np.inf))
        elif (
            self.logprior is not None
            and self.loglike is not None
            and np.isfinite(self.logprior)
            and np.isfinite(self.logpost)
        ):
            expected = self.logprior + self.loglike
            if not np.isclose(self.logpost, expected, rtol=1e-6, atol=1e-8):
                raise ValueError(
                    f"logposterior inconsistency: {self.logpost} != "
                    f"{self.logprior} + {self.loglike}"
                )

    def as_dict(self, model: "Model") -> dict:
        return {
            "logpost": self.logpost,
            "logpriors": dict(zip(model.prior.names, self.logpriors or [])),
            "loglikes": dict(zip(model.likelihood, self.loglikes or [])),
            "derived": dict(
                zip(model.parameterization.derived_params(), self.derived or [])
            ),
        }


class Model(HasLogger):
    """The statistical model: parameterization + prior + component DAG."""

    def __init__(
        self,
        info_params: Mapping,
        info_likelihood: Mapping,
        info_prior: Mapping | None = None,
        info_theory: Mapping | None = None,
        packages_path: str | None = None,
        timing: bool | None = None,
        allow_renames: bool = True,
        stop_at_error: bool = False,
        post: bool = False,
        skip_unused_theories: bool = False,
        dropped_theory_params: Sequence[str] | None = None,
        matmul_precision: str | None = "highest",
    ):
        self.set_logger("model")
        self._updated_info: InputDict = {
            "params": deepcopy_where_possible(info_params),
            "likelihood": deepcopy_where_possible(info_likelihood),
        }
        if not self._updated_info["likelihood"] and not post:
            raise LoggedError(self.log, "No likelihood requested!")
        for k, v in (("prior", info_prior), ("theory", info_theory),
                     ("packages_path", packages_path), ("timing", timing)):
            if v not in (None, {}):
                self._updated_info[k] = deepcopy_where_possible(v)
        self.parameterization = Parameterization(
            info_params, allow_renames=allow_renames,
            ignore_unused_sampled=post,
        )
        self.prior = Prior(self.parameterization, info_prior)
        self.timing = timing
        self.theory = TheoryCollection(
            info_theory, packages_path=packages_path, timing=timing
        )
        self.likelihood = LikelihoodCollection(
            info_likelihood, packages_path=packages_path, timing=timing,
            theory=self.theory,
        )
        if stop_at_error:
            for comp in self.components:
                comp.stop_at_error = True
        self.skip_unused_theories = skip_unused_theories
        self._assign_params(info_likelihood, info_theory,
                            dropped_theory_params)
        self._set_dependencies_and_providers()
        # wire chi2__<like> names
        self._chi2_names = [cv.chi2_name(name) for name in self.likelihood]
        self._aggr_chi2_names = {
            cv.chi2_name(t): [
                i for i, like in enumerate(self.likelihood.values())
                if t in like.get_type_list()
            ]
            for t in sorted(self.likelihood.all_types)
        }
        self._measured_speeds: dict[str, float] | None = None
        self._jitted_logposterior_fn = None
        # Matmul precision for traced posterior programs.  On TPU, float32
        # matmuls default to fast bfloat16 MXU passes; a batched (vmapped)
        # likelihood then loses ~3 decimal digits per contraction, which for
        # chi^2 magnitudes of O(10^4) corrupts logp by O(10^2) — the sampler
        # explores numerical-error terrain instead of the posterior (observed:
        # flagship logp off by 253 at the truth point, R-1 stuck at ~10^4).
        # Metropolis/HMC accept decisions resolve O(1) logp differences, so
        # posterior evaluation must run the MXU in full-f32 ("highest",
        # 6-pass) mode; proposal/moment matmuls elsewhere keep the default.
        self.matmul_precision = matmul_precision

    # ------------------------------------------------------------------
    # parameter assignment (reference model.py:1115; spec DEVEL.rst:94-160)
    # ------------------------------------------------------------------
    @property
    def components(self) -> list[Theory]:
        return list(self.theory.values()) + list(self.likelihood.values())

    def _assign_params(self, info_likelihood, info_theory=None,
                       dropped_theory_params=None):
        """Multi-rule assignment (reference model.py:1115; DEVEL.rst:94-160):

        1. explicit input/output params list;  2. params-name prefix (an empty
        prefix matches everything);  3. class 'params' dict from defaults;
        4. declared requirements;  5. parameter-agnostic components collect
        leftovers;  6. components that "can support"/"can provide" a param get
        unassigned ones; finally the unit likelihood absorbs the rest.
        """
        input_params = [
            p for p in self.parameterization.input_params()
            if p not in self.parameterization.dropped_param_set()
        ]
        output_params = list(self.parameterization.output_params())
        comps = self.components

        assigned_input: dict[str, list[Theory]] = {p: [] for p in input_params}
        assigned_output: dict[str, list[Theory]] = {p: [] for p in output_params}
        assign_components = [
            c for c in comps if not isinstance(c, AbsorbUnusedParamsLikelihood)
        ]
        for assign, option, prefix_attr, derived_param in (
            (assigned_input, "input_params", "input_params_prefix", False),
            (assigned_output, "output_params", "output_params_prefix", True),
        ):
            agnostic: list[Theory] = []
            for comp in assign_components:
                class_params = comp.params if isinstance(comp.params, Mapping) \
                    else {}
                if derived_param:
                    required_params = set(
                        str_to_list(getattr(comp, "provides", []) or [])
                    )
                else:
                    required_params = {
                        p for p, v in check_requirement(
                            comp.get_requirements()
                        ).items() if v is None
                    }
                explicit = getattr(comp, option, None)
                prefix = getattr(comp, prefix_attr, None)
                # 1. explicit list (set by info or by external-function intro)
                if explicit is not None:
                    for p in explicit:
                        if p in assign:
                            assign[p].append(comp)
                        elif not derived_param:
                            raise LoggedError(
                                self.log,
                                "Parameter '%s' needed as input for '%s' but "
                                "not provided.", p, comp.get_name(),
                            )
                # 2. prefix rule ('' matches everything)
                elif prefix is not None:
                    for p in assign:
                        if p.startswith(prefix):
                            assign[p].append(comp)
                # 3/4. class params dict and/or requirements
                elif class_params or required_params:
                    for p, options in class_params.items():
                        is_derived_entry = (
                            isinstance(options, Mapping)
                            and bool(options.get("derived", False))
                        ) or options is None
                        if (is_derived_entry is derived_param) and p in assign:
                            assign[p].append(comp)
                    for p in required_params:
                        if p in assign and comp not in assign[p]:
                            assign[p].append(comp)
                # 5. no parameter knowledge
                elif comp.get_allow_agnostic():
                    agnostic.append(comp)
            # 6. supporting components take unassigned params
            unassigned_now = [p for p, cs in assign.items() if not cs]
            for comp in assign_components:
                supports = set(
                    comp.get_can_provide_params() if derived_param
                    else comp.get_can_support_params()
                )
                if dropped_theory_params and not isinstance(
                    comp, LikelihoodInterface
                ):
                    supports -= set(dropped_theory_params)
                for p in (unassigned_now if derived_param else list(assign)):
                    if p in supports and comp not in assign[p]:
                        assign[p].append(comp)
            if len(agnostic) > 1 and not all(assign.values()):
                raise LoggedError(
                    self.log,
                    "More than one parameter-agnostic component for %s: %r",
                    option, [c.get_name() for c in agnostic],
                )
            if agnostic:
                for p, cs in assign.items():
                    if not cs:
                        cs.append(agnostic[0])
        # the unit likelihood absorbs remaining inputs
        for like in self.likelihood.values():
            if isinstance(like, AbsorbUnusedParamsLikelihood):
                for p, cs in assigned_input.items():
                    if not cs:
                        cs.append(like)
                break
        # params used by dynamic input functions of assigned params are fine
        input_deps = self.parameterization.input_dependencies
        used_in_dynamic: set[str] = set()
        for p, cs in assigned_input.items():
            if cs:
                used_in_dynamic |= set(input_deps.get(p, ()))
        # params used by external priors are fine too
        for ext in self.prior.external.values():
            used_in_dynamic |= set(ext.params)
        unassigned = [
            p for p, cs in assigned_input.items()
            if not cs and p not in used_in_dynamic
        ]
        # aggregated chi2__<type> / chi2__<like> params are provided by the
        # model itself (wired from loglikes), never by components
        model_provided = {
            p for p in output_params if p.startswith(cv.OUT_CHI2 + cv.SEPARATOR)
        }
        for p in model_provided:
            assigned_output[p] = []
        still_unassigned_out = [
            p for p, cs in assigned_output.items()
            if not cs and p not in model_provided
        ]
        if unassigned:
            raise LoggedError(
                self.log,
                "Could not assign input parameters to any component: %r. "
                "If these are only used in priors or dynamic parameters, add "
                "the 'one' likelihood or mark them with 'drop: True'.",
                unassigned,
            )
        if still_unassigned_out:
            raise LoggedError(
                self.log,
                "Could not find a component providing output parameters: %r",
                still_unassigned_out,
            )
        multi_out = {p: cs for p, cs in assigned_output.items() if len(cs) > 1}
        if multi_out:
            raise LoggedError(
                self.log,
                "Output params can only be computed by one component: %r",
                {p: [c.get_name() for c in cs] for p, cs in multi_out.items()},
            )
        self._input_assignments = assigned_input
        self._output_assignments = {
            p: (cs[0] if cs else None) for p, cs in assigned_output.items()
        }
        for comp in comps:
            comp.input_params = [
                p for p, cs in assigned_input.items() if comp in cs
            ]
            comp.output_params = [
                p for p, comp_of in self._output_assignments.items()
                if comp_of is comp
            ]
            comp.initialize_with_params()
        if self.is_debug():
            for comp in comps:
                self.log.debug(
                    "%s: input=%s output=%s", comp.get_name(),
                    comp.input_params, comp.output_params,
                )

    # ------------------------------------------------------------------
    # requirements DAG (reference model.py:813)
    # ------------------------------------------------------------------
    def _set_dependencies_and_providers(self):
        comps = self.components
        # what each component can provide: products + derived params
        can_provide: dict[str, list[Theory]] = {}
        for comp in comps:
            names = set(check_requirement(comp.get_can_provide()))
            names.update(comp.get_can_provide_methods())
            names.update(comp.get_can_provide_params())
            names.update(comp.output_params)
            for n in names:
                can_provide.setdefault(n, []).append(comp)
        # gather requirements, iterating must_provide until stable
        requirements: dict[str, dict] = {
            comp.get_name(): check_requirement(comp.get_requirements())
            for comp in comps
        }
        providers: dict[str, Theory] = {}
        requested_by: dict[str, dict] = {}
        dependencies: dict[str, set[str]] = {c.get_name(): set() for c in comps}
        pending = [
            (comp, dict(requirements[comp.get_name()])) for comp in comps
        ]
        max_rounds = 10
        for _ in range(max_rounds):
            new_pending = []
            for comp, reqs in pending:
                for req_name, options in reqs.items():
                    if req_name in self.parameterization.input_params():
                        continue  # plain input param, not a product
                    cands = [
                        c for c in can_provide.get(req_name, []) if c is not comp
                    ]
                    if not cands:
                        raise LoggedError(
                            self.log,
                            "Requirement '%s' of component '%s' cannot be "
                            "provided by any other component.",
                            req_name, comp.get_name(),
                        )
                    provider = cands[0]
                    if len(cands) > 1:
                        self.mpi_warning(
                            "Requirement '%s' provided by several components %s;"
                            " using '%s'", req_name,
                            [c.get_name() for c in cands], provider.get_name(),
                        )
                    providers[req_name] = provider
                    requested_by.setdefault(
                        provider.get_name(), {}
                    )[req_name] = options
                    dependencies[comp.get_name()].add(provider.get_name())
                    # notify the provider: may create new conditional reqs
                    new_reqs = provider.must_provide(**{req_name: options})
                    new_reqs = check_requirement(new_reqs)
                    if new_reqs:
                        new_pending.append((provider, new_reqs))
            if not new_pending:
                break
            pending = new_pending
        else:
            raise LoggedError(
                self.log, "Requirements did not stabilize after %d rounds "
                "(circular conditional requirements?)", max_rounds,
            )
        # topological sort with cycle detection
        order: list[Theory] = []
        temp, perm = set(), set()
        by_name = {c.get_name(): c for c in comps}

        def visit(name: str):
            if name in perm:
                return
            if name in temp:
                raise LoggedError(
                    self.log, "Circular dependency involving component '%s'", name
                )
            temp.add(name)
            for dep in sorted(dependencies.get(name, ())):
                visit(dep)
            temp.discard(name)
            perm.add(name)
            order.append(by_name[name])

        for comp in comps:
            visit(comp.get_name())
        if self.skip_unused_theories:
            used = set()
            for like in self.likelihood.values():
                used.add(like.get_name())
                stack = list(dependencies[like.get_name()])
                while stack:
                    n = stack.pop()
                    if n not in used:
                        used.add(n)
                        stack.extend(dependencies[n])
            order = [
                c for c in order
                if c.get_name() in used or isinstance(c, LikelihoodInterface)
            ]
        self._component_order = order
        self._requested_by = requested_by
        self._dependencies = dependencies
        self.provider = Provider(self, providers)
        for comp in comps:
            comp.initialize_with_provider(self.provider)
        self.requirements = requirements

    # ------------------------------------------------------------------
    # public introspection
    # ------------------------------------------------------------------
    def info(self) -> InputDict:
        return deepcopy_where_possible(self._updated_info)

    def get_versions(self, add_version_field=False):
        return {
            "theory": self.theory.get_versions(add_version_field),
            "likelihood": self.likelihood.get_versions(add_version_field),
        }

    def get_speeds(self, ignore_sub=False) -> dict:
        """Measured/declared speeds per component (reference model.py:784)."""
        return {
            "theory": {name: c.get_speed()
                       for name, c in self.theory.items()},
            "likelihood": {name: c.get_speed()
                           for name, c in self.likelihood.items()},
        }

    def requested(self) -> dict:
        """Requirements computed by each component (reference model.py:1106)."""
        return {name: dict(reqs)
                for name, reqs in self._requested_by.items() if reqs}

    def set_cache_size(self, n_states: int):
        """Host-state cache depth for every component (model.py:1511)."""
        for comp in self.components:
            comp.set_cache_size(n_states)

    def get_auto_covmat(self, params_info=None):
        """Automatic covariance matrix for the model+data, from any theory
        exposing a covmat database (reference model.py:1521)."""
        if params_info is None:
            params_info = self.parameterization.sampled_params_info()
        try:
            for theory in self.theory.values():
                if hasattr(theory, "get_auto_covmat"):
                    return theory.get_auto_covmat(
                        params_info, self.info()["likelihood"]
                    )
            return None
        except Exception as e:
            self.log.warning("Something went wrong getting an automatic "
                             "covariance matrix: %s", e)
            return None

    def sampled_dependence(self) -> dict[str, list[Theory]]:
        """Which components must recompute when each sampled param changes."""
        dep_input = self.parameterization.sampled_input_dependence()
        out: dict[str, list[Theory]] = {}
        downstream_cache: dict[str, set[str]] = {}

        def downstream(name: str) -> set[str]:
            if name not in downstream_cache:
                result = {name}
                for other, deps in self._dependencies.items():
                    if name in deps:
                        result |= downstream(other)
                downstream_cache[name] = result
            return downstream_cache[name]

        for s in self.parameterization.sampled_params():
            touched = {s} | set(dep_input.get(s, []))
            direct = {
                comp.get_name() for comp in self.components
                if touched & set(comp.input_params)
            }
            all_names: set[str] = set()
            for name in direct:
                all_names |= downstream(name)
            out[s] = [
                c for c in self._component_order if c.get_name() in all_names
            ]
        return out

    # ------------------------------------------------------------------
    # eager evaluation (cobaya-style scripted API)
    # ------------------------------------------------------------------
    def logposterior(
        self, params_values, return_derived: bool = True,
        make_finite: bool = False, cached: bool = True,
        _no_check: bool = False,
    ) -> LogPosterior:
        if not _no_check:
            params_values = self.parameterization.check_sampled(params_values)
        if hasattr(params_values, "keys"):
            x = np.array(
                [params_values[p] for p in self.parameterization.sampled_params()]
            )
        else:
            x = np.asarray(params_values, dtype=float)
        logprior_internal = float(self.prior.logps_internal_jax(x))
        input_values = None
        logpriors = [logprior_internal]
        if self.prior.external:
            input_values = self.parameterization.to_input(x)
            logpriors += [
                float(np.asarray(v))
                for v in self.prior.logps_external(input_values)
            ]
        if not np.isfinite(np.sum(logpriors)):
            n_der = len(self.parameterization.derived_params())
            return LogPosterior(
                logpriors=logpriors,
                loglikes=[-np.inf] * len(self.likelihood),
                derived=[np.nan] * n_der if return_derived else None,
                finite=make_finite,
            )
        if input_values is None:
            input_values = self.parameterization.to_input(x)
        loglikes, derived = self._loglikes_input_params(
            input_values, return_derived=return_derived, cached=cached
        )
        return LogPosterior(
            logpriors=logpriors, loglikes=loglikes,
            derived=derived if return_derived else None, finite=make_finite,
        )

    def _loglikes_input_params(
        self, input_values: Mapping, return_derived: bool = True,
        cached: bool = True,
    ):
        self.provider.set_current_input_params(input_values)
        loglikes = np.full(len(self.likelihood), np.nan)
        outputs: dict[str, Any] = {}
        states: dict[str, Any] = {}
        like_index = {
            like: i for i, like in enumerate(self.likelihood.values())
        }
        for comp in self._component_order:
            params = {
                p: input_values[p] for p in comp.input_params
                if p in input_values
            }
            # cache key includes upstream components' state identities, so a
            # change in a dependency invalidates this component's cache
            dep_params = tuple(
                repr((states.get(d) or {}).get("_key"))
                for d in sorted(self._dependencies.get(comp.get_name(), ()))
            )
            state = comp.check_cache_and_compute(
                params, dependency_params=dep_params,
                want_derived=return_derived, cached=cached,
            )
            if state is False:
                self.log.debug(
                    "Component '%s' failed at %r", comp.get_name(), params
                )
                loglikes[:] = -np.inf
                n_der = len(self.parameterization.derived_params())
                return loglikes.tolist(), (
                    [np.nan] * n_der if return_derived else None
                )
            states[comp.get_name()] = state
            outputs.update(state.get("derived") or {})
            if comp in like_index:
                loglikes[like_index[comp]] = float(
                    np.asarray(state.get("logp"))
                )
        derived_list = None
        if return_derived:
            # chi2 wiring: per-likelihood and per-type aggregates
            for i, like_name in enumerate(self.likelihood):
                outputs.setdefault(cv.chi2_name(like_name), -2 * loglikes[i])
            for name, idxs in self._aggr_chi2_names.items():
                outputs[name] = -2 * float(np.sum(loglikes[idxs]))
            derived = self.parameterization.to_derived(
                {p: outputs.get(p, np.nan)
                 for p in self.parameterization.output_params()},
                input_values,
            )
            derived_list = [
                float(np.asarray(v)) for v in derived.values()
            ]
        return loglikes.tolist(), derived_list

    def loglikes(self, params_values=None, as_dict=False,
                 make_finite=False, return_derived=True, cached=True):
        result = self.logposterior(
            params_values, return_derived=return_derived,
            make_finite=make_finite, cached=cached,
        )
        if as_dict:
            loglikes = dict(zip(self.likelihood, result.loglikes))
            derived = dict(zip(
                self.parameterization.derived_params(), result.derived or []
            ))
            return (loglikes, derived) if return_derived else loglikes
        if return_derived:
            return np.array(result.loglikes), np.array(result.derived or [])
        return np.array(result.loglikes)

    def loglike(self, params_values=None, make_finite=False,
                return_derived=True, cached=True):
        if return_derived:
            loglikes, derived = self.loglikes(
                params_values, make_finite=make_finite, cached=cached
            )
            return float(np.sum(loglikes)), derived
        return float(np.sum(self.loglikes(
            params_values, make_finite=make_finite, return_derived=False,
            cached=cached,
        )))

    def logpriors(self, params_values=None, make_finite=False, as_dict=False):
        params_values = self.parameterization.check_sampled(params_values)
        if hasattr(params_values, "keys"):
            x = np.array(
                [params_values[p]
                 for p in self.parameterization.sampled_params()]
            )
        else:
            x = np.asarray(params_values, dtype=float)
        logps = self.prior.logps(x)
        if make_finite:
            logps = np.nan_to_num(logps).tolist()
        if as_dict:
            return dict(zip(self.prior.names, logps))
        return np.array(logps)

    def logprior(self, params_values=None, make_finite=False):
        return float(np.sum(self.logpriors(params_values,
                                           make_finite=make_finite)))

    def logpost(self, params_values=None, make_finite=False, cached=True):
        return self.logposterior(
            params_values, return_derived=False, make_finite=make_finite,
            cached=cached,
        ).logpost

    def get_valid_point(
        self, max_tries: int, ignore_fixed_ref: bool = False,
        logposterior_as_dict: bool = False, random_state=None,
    ):
        """Draw from the reference pdf until the posterior is finite."""
        for i in range(int(max_tries)):
            point = self.prior.reference(
                warn_if_no_ref=(i == 0), ignore_fixed=ignore_fixed_ref,
                random_state=random_state,
            )
            results = self.logposterior(point)
            if np.isfinite(results.logpost):
                if logposterior_as_dict:
                    return point, results.as_dict(self)
                return point, results
            if self.prior.reference_is_pointlike():
                raise LoggedError(
                    self.log,
                    "The reference point is fixed but has non-finite posterior.",
                )
        raise LoggedError(
            self.log,
            "Could not find a point with finite posterior after %d tries. "
            "Check priors/likelihoods or provide better 'ref' values.",
            max_tries,
        )

    def add_requirements(self, requirements):
        """Request extra products (scripted API); re-resolves the DAG."""
        reqs = check_requirement(requirements)
        existing = check_requirement(
            self.likelihood["_manual_reqs"].get_requirements()
        ) if "_manual_reqs" in self.likelihood else {}
        existing.update(reqs)

        class _ManualReqs(AbsorbUnusedParamsLikelihood):
            jittable = False

            def get_requirements(self):
                return existing

            def logp_jax(self, params, provider_products=None):
                return 0.0, {}

        self.likelihood["_manual_reqs"] = _ManualReqs(
            {}, name="_manual_reqs", timing=self.timing
        )
        self.likelihood["_manual_reqs"].input_params = []
        self.likelihood["_manual_reqs"].output_params = []
        self._set_dependencies_and_providers()

    # ------------------------------------------------------------------
    # jit compilation of the full pipeline (TPU hot path)
    # ------------------------------------------------------------------
    @property
    def derived_names(self) -> list[str]:
        return list(self.parameterization.derived_params())

    @property
    def like_names(self) -> list[str]:
        return list(self.likelihood)

    def make_logposterior_fn(self, clip_to_bounds: bool = True) -> Callable:
        """Build a pure jittable function x -> (logpost, logpriors, loglikes, derived).

        ``x`` is the sampled vector (shape (d,)); outputs are jnp arrays of
        shapes ((), (1+n_ext_priors,), (n_likes,), (n_derived,)).  Out-of-prior
        points short-circuit: likelihoods evaluate at the clipped point and
        their values are masked, so no NaNs leak out of support.
        Vmap/vmap-of-grad safe.
        """
        import jax
        import jax.numpy as jnp

        sampled_names = list(self.parameterization.sampled_params())
        bounds = self.prior.bounds(confidence_for_unbounded=1.0)
        lo = np.where(np.isfinite(bounds[:, 0]), bounds[:, 0], -np.inf)
        hi = np.where(np.isfinite(bounds[:, 1]), bounds[:, 1], np.inf)
        like_list = list(self.likelihood.values())
        like_names = list(self.likelihood.keys())
        comp_order = list(self._component_order)
        output_names = list(self.parameterization.output_params())
        derived_names = self.derived_names
        aggr = dict(self._aggr_chi2_names)
        n_ext = len(self.prior.external)

        precision = self.matmul_precision

        def fn(x):
            if precision:
                with jax.default_matmul_precision(precision):
                    return body(x)
            return body(x)

        def body(x):
            x = jnp.asarray(x)
            logprior0 = self.prior.logps_internal_jax(x)
            x_safe = jnp.clip(x, jnp.asarray(lo, x.dtype), jnp.asarray(hi, x.dtype)) \
                if clip_to_bounds else x
            sampled = dict(zip(sampled_names, x_safe))
            input_values = self.parameterization.to_input(sampled)
            logpriors = [logprior0]
            for ext in self.prior.external.values():
                logpriors.append(jnp.asarray(ext.logp_traced(input_values)))
            # mirror Provider.get_param's input-param fallback (the
            # reference provider resolves param requirements from the
            # current input params first, theory.py:447)
            products: dict[str, Any] = {"__input__": input_values}
            outputs: dict[str, Any] = {}
            loglikes_list = []
            for comp in comp_order:
                params = {
                    p: input_values[p] for p in comp.input_params
                    if p in input_values
                }
                prods, derived = self._component_jax_step(comp)(
                    params, products
                )
                # derived params are consumable as requirements downstream
                products[comp.get_name()] = {**prods, **(derived or {})}
                outputs.update(derived or {})
                if isinstance(comp, LikelihoodInterface):
                    loglikes_list.append(jnp.asarray(prods["logp"]))
            loglikes = (
                jnp.stack(loglikes_list) if loglikes_list
                else jnp.zeros((0,), x.dtype)
            )
            for i, like_name in enumerate(like_names):
                outputs.setdefault(cv.chi2_name(like_name), -2 * loglikes[i])
            for name, idxs in aggr.items():
                outputs[name] = -2 * sum(
                    (loglikes[i] for i in idxs), start=jnp.asarray(0.0, x.dtype)
                )
            derived_dict = self.parameterization.to_derived(
                {p: outputs.get(p, jnp.nan) for p in output_names},
                input_values,
            )
            derived = (
                jnp.stack([jnp.asarray(derived_dict[p], dtype=x.dtype)
                           for p in derived_names])
                if derived_names else jnp.zeros((0,), x.dtype)
            )
            logpriors_arr = jnp.stack([jnp.asarray(v, dtype=x.dtype)
                                       for v in logpriors])
            prior_ok = jnp.isfinite(logprior0)
            loglikes = jnp.where(prior_ok, loglikes, -jnp.inf)
            logpost = jnp.where(
                prior_ok, jnp.sum(logpriors_arr) + jnp.sum(loglikes), -jnp.inf
            )
            return logpost, logpriors_arr, loglikes, derived

        return fn

    def make_blocked_logposterior_fn(self, block_param_indices,
                                     clip_to_bounds: bool = True):
        """Work-avoiding evaluator for blocked samplers (speed hierarchy).

        Functional replacement of the reference's per-component LRU state
        cache (theory.py:240): per-component results are carried explicitly,
        and evaluating after a move of block ``b`` recomputes ONLY the
        components footprinted by that block (computed from
        :meth:`sampled_dependence`), reusing the carried results of the rest
        — inside jit, via ``lax.switch`` over per-block step functions.

        Returns ``(full_eval, block_eval)``:
        ``full_eval(x) -> (logpost, logpriors, loglikes, derived, cache)``;
        ``block_eval(b, x, cache) -> same`` with ``b`` a traced int32.
        """
        import jax
        import jax.numpy as jnp

        sampled_names = list(self.parameterization.sampled_params())
        dep = self.sampled_dependence()
        comp_order = list(self._component_order)
        comp_names = [c.get_name() for c in comp_order]
        # footprint per block: components to recompute when the block moves.
        # In the Cholesky-mixed basis a block's move also drags every FASTER
        # block's parameters (triangular transform, proposal.py:226-260 of
        # the reference), so block b's footprint includes all blocks >= b.
        per_block = []
        for block in block_param_indices:
            needed = set()
            for i_param in block:
                for comp in dep[sampled_names[i_param]]:
                    needed.add(comp_names.index(comp.get_name()))
            per_block.append(needed)
        block_footprints = [
            sorted(set().union(*per_block[b:]))
            for b in range(len(per_block))
        ]
        bounds = self.prior.bounds(confidence_for_unbounded=1.0)
        lo = np.where(np.isfinite(bounds[:, 0]), bounds[:, 0], -np.inf)
        hi = np.where(np.isfinite(bounds[:, 1]), bounds[:, 1], np.inf)
        like_flags = [isinstance(c, LikelihoodInterface) for c in comp_order]
        output_names = list(self.parameterization.output_params())
        derived_names = self.derived_names
        like_names = list(self.likelihood.keys())
        aggr = dict(self._aggr_chi2_names)
        steps = [self._component_jax_step(c) for c in comp_order]

        precision = self.matmul_precision

        def _eval(x, cache, recompute_idx):
            # full-f32 MXU passes: logp errors of O(1) flip accept decisions
            # (see Model.__init__ matmul_precision note)
            if precision:
                with jax.default_matmul_precision(precision):
                    return _eval_body(x, cache, recompute_idx)
            return _eval_body(x, cache, recompute_idx)

        def _eval_body(x, cache, recompute_idx):
            x = jnp.asarray(x)
            logprior0 = self.prior.logps_internal_jax(x)
            x_safe = jnp.clip(x, jnp.asarray(lo, x.dtype),
                              jnp.asarray(hi, x.dtype)) \
                if clip_to_bounds else x
            input_values = self.parameterization.to_input(
                dict(zip(sampled_names, x_safe))
            )
            logpriors = [logprior0] + [
                jnp.asarray(ext.logp_traced(input_values))
                for ext in self.prior.external.values()
            ]
            new_cache = list(cache)
            products: dict[str, Any] = {"__input__": input_values}
            for i, comp in enumerate(comp_order):
                if i in recompute_idx:
                    params = {p: input_values[p] for p in comp.input_params
                              if p in input_values}
                    prods, derived = steps[i](params, products)
                    new_cache[i] = (prods, derived)
                prods, derived = new_cache[i]
                products[comp.get_name()] = {**prods, **(derived or {})}
            outputs: dict[str, Any] = {}
            loglikes_list = []
            for i, comp in enumerate(comp_order):
                prods, derived = new_cache[i]
                outputs.update(derived or {})
                if like_flags[i]:
                    loglikes_list.append(jnp.asarray(prods["logp"]))
            loglikes = (jnp.stack(loglikes_list) if loglikes_list
                        else jnp.zeros((0,), x.dtype))
            for i, like_name in enumerate(like_names):
                outputs.setdefault(cv.chi2_name(like_name), -2 * loglikes[i])
            for name, idxs in aggr.items():
                outputs[name] = -2 * sum(
                    (loglikes[i] for i in idxs),
                    start=jnp.asarray(0.0, x.dtype),
                )
            derived_dict = self.parameterization.to_derived(
                {p: outputs.get(p, jnp.nan) for p in output_names},
                input_values,
            )
            derived = (
                jnp.stack([jnp.asarray(derived_dict[p], dtype=x.dtype)
                           for p in derived_names])
                if derived_names else jnp.zeros((0,), x.dtype)
            )
            logpriors_arr = jnp.stack([jnp.asarray(v, dtype=x.dtype)
                                       for v in logpriors])
            prior_ok = jnp.isfinite(logprior0)
            loglikes = jnp.where(prior_ok, loglikes, -jnp.inf)
            logpost = jnp.where(
                prior_ok, jnp.sum(logpriors_arr) + jnp.sum(loglikes),
                -jnp.inf,
            )
            return logpost, logpriors_arr, loglikes, derived, tuple(new_cache)

        def full_eval(x):
            dummy = tuple((None, None) for _ in comp_order)
            return _eval(x, dummy, set(range(len(comp_order))))

        branch_fns = [
            (lambda fp: (lambda x, cache: _eval(x, cache, set(fp))))(fp)
            for fp in block_footprints
        ]

        def block_eval(b, x, cache):
            return jax.lax.switch(
                b, [lambda op, f=f: f(*op) for f in branch_fns], (x, cache)
            )

        return full_eval, block_eval

    def _callback_pool_size(self, comp: Theory) -> int:
        """Worker count for comp's host bridge (0/1 = serial)."""
        pool = getattr(comp, "callback_pool", None)
        if pool is None:
            pool = os.environ.get("COBAYA_TPU_CALLBACK_POOL") or 0
        try:
            return max(int(pool), 0)
        except (TypeError, ValueError):
            return 0

    def _callback_executor(self, pool: int):
        """Shared, lazily-grown thread pool for all host-bridge callbacks."""
        import concurrent.futures

        ex = getattr(self, "_cb_executor", None)
        if ex is None or self._cb_executor_size < pool:
            if ex is not None:
                ex.shutdown(wait=False)
            ex = concurrent.futures.ThreadPoolExecutor(
                max_workers=pool, thread_name_prefix="cobaya-cb"
            )
            self._cb_executor = ex
            self._cb_executor_size = pool
        return ex

    def _component_jax_step(self, comp: Theory) -> Callable:
        """Traced step for one component: (params, products_so_far) -> (prods, derived)."""
        import jax
        import jax.numpy as jnp

        if getattr(comp, "jittable", False):
            def step(params, products_so_far):
                return comp.calculate_jax(
                    params, want_derived=True,
                    provider_products=products_so_far,
                )
            return step

        # Host bridge: batched pure_callback.  Output spec from the component
        # or (for likelihoods) default to scalar logp + declared output params.
        # Non-likelihood components additionally emit an int32 "__token__":
        # the per-walker host-side state lives in the component's object
        # store, and downstream host components resolve the token back to it
        # (so object products — e.g. a CAMBdata — flow per-walker through
        # the device program without serialization).
        spec = dict(comp.callback_output_spec())
        is_like = isinstance(comp, LikelihoodInterface)
        if not spec and is_like:
            spec = {"logp": jax.ShapeDtypeStruct((), jnp.float32)}
            for p in comp.output_params:
                spec[p] = jax.ShapeDtypeStruct((), jnp.float32)
        if not is_like:
            spec["__token__"] = jax.ShapeDtypeStruct((), jnp.int32)
        param_names = list(comp.input_params)
        out_names = list(spec)
        # upstream providers whose products this component reads via
        # self.provider: host (non-jittable) ones hand over a token; traced
        # (jittable) ones hand over their product arrays
        by_name = {c.get_name(): c for c in self.components}
        dep_names = sorted(self._dependencies.get(comp.get_name(), ()))
        up_host = [by_name[n] for n in dep_names
                   if not getattr(by_name[n], "jittable", False)]
        up_jit_names = [n for n in dep_names
                        if getattr(by_name[n], "jittable", False)]

        def host_eval(token_arrays, jit_leaf_views, *arrays):
            # 64-bit results survive JAX's runtime-thread canonicalization
            ensure_callback_thread_x64(spec.values())
            if comp.timer:
                comp.timer.start()
            arrays = [np.asarray(a) for a in arrays]
            tokens = [np.asarray(t) for t in token_arrays]
            # under vmap(expand_dims), unbatched operands (fixed params,
            # unmoved products) carry size-1 batch dims: broadcast-index
            batch_shape = np.broadcast_shapes(
                *(a.shape for a in arrays), *(t.shape for t in tokens)
            )
            nb = len(batch_shape)
            n = int(np.prod(batch_shape)) if batch_shape else 1

            def row(a, i):
                a = np.asarray(a)
                event = a.shape[nb:] if a.ndim >= nb else ()
                rows = a.reshape((-1,) + tuple(event))
                return rows[i if rows.shape[0] > 1 else 0]

            flat = [a.reshape(-1) for a in arrays]
            tokens = [t.reshape(-1) for t in tokens]
            results = {k: np.empty((n,) + spec[k].shape,
                                   dtype=spec[k].dtype) for k in out_names}

            def eval_rows(lo: int, hi: int):
                # runs in (possibly) a worker thread: provider views are
                # thread-local, result rows are disjoint, the token store
                # is lock-protected — safe to fan out
                try:
                    for i in range(lo, hi):
                        for prov, tok in zip(up_host, tokens):
                            prov._callback_view = prov._resolve_state_object(
                                int(tok[i if tok.size > 1 else 0])
                            )
                        for prov_name, view in jit_leaf_views:
                            by_name[prov_name]._callback_view = {
                                k: row(v, i) for k, v in view.items()
                            }
                        params = {
                            p: float(v[i if v.size > 1 else 0])
                            for p, v in zip(param_names, flat)
                        }
                        if is_like:
                            derived: dict = {}
                            logp = comp.logp(_derived=derived, **params)
                            values = {"logp": logp, **derived}
                        else:
                            state: dict = {"derived": {}}
                            comp.calculate(state, True, **params)
                            values = {**state,
                                      **(state.get("derived") or {})}
                            values.update(comp.callback_export(state))
                            values["__token__"] = comp._store_state_object(
                                state, batch_size=n
                            )
                        for k in out_names:
                            results[k][i] = values.get(k, np.nan)
                finally:
                    for prov in up_host:
                        prov._callback_view = None
                    for prov_name, _ in jit_leaf_views:
                        by_name[prov_name]._callback_view = None

            pool = self._callback_pool_size(comp)
            if pool > 1 and n > 1:
                # amortize slow host evaluations across workers (the
                # reference's one-CAMB-per-MPI-rank, as threads: compiled
                # theory cores release the GIL)
                executor = self._callback_executor(pool)
                chunk = -(-n // min(pool, n))
                futures = [
                    executor.submit(eval_rows, lo, min(lo + chunk, n))
                    for lo in range(0, n, chunk)
                ]
                errs = [f.exception() for f in futures]
                for e in errs:
                    if e is not None:
                        raise e
            else:
                eval_rows(0, n)
            if comp.timer:
                comp.timer.increment()
            return tuple(
                results[k].reshape(batch_shape + spec[k].shape)
                for k in out_names
            )

        def step(params, products_so_far):
            arrays = [jnp.asarray(params[p]) for p in param_names]
            token_arrays = [
                products_so_far[c.get_name()]["__token__"] for c in up_host
            ]
            jit_view_keys = [
                (n, [k for k in products_so_far.get(n, {})])
                for n in up_jit_names
            ]
            jit_leaves = [
                products_so_far[n][k] for n, keys in jit_view_keys
                for k in keys
            ]
            n_par, n_tok = len(arrays), len(token_arrays)

            def host_cb(*all_arrays):
                arrs = all_arrays[:n_par]
                toks = all_arrays[n_par:n_par + n_tok]
                leaves = list(all_arrays[n_par + n_tok:])
                views, pos = [], 0
                for pname, keys in jit_view_keys:
                    views.append((pname, {
                        k: leaves[pos + j] for j, k in enumerate(keys)
                    }))
                    pos += len(keys)
                return host_eval(toks, views, *arrs)

            out = jax.pure_callback(
                host_cb,
                tuple(spec[k] for k in out_names),
                *arrays, *token_arrays, *jit_leaves,
                vmap_method="expand_dims",
            )

            values = dict(zip(out_names, out))
            derived = {
                p: values[p] for p in getattr(comp, "output_params", [])
                if p in values
            }
            return values, derived

        return step

    # ------------------------------------------------------------------
    # speed measurement & parameter blocking (reference model.py:1340-1592)
    # ------------------------------------------------------------------
    def measure_and_set_speeds(self, n: int | None = None,
                               discard: int = 1, max_tries: int = 10,
                               random_state=None):
        """Time per-component evaluation over n random reference points."""
        n = int(n or 3)
        self.mpi_info("Measuring speeds... (%d evaluations)", n)
        timers = {c.get_name(): Timer() for c in self.components}
        for comp in self.components:
            if comp.timer is None:
                comp.set_timing_on(True)
        for _ in range(n + discard):
            point = self.prior.reference(
                warn_if_no_ref=False, ignore_fixed=True,
                random_state=random_state,
            )
            self.logposterior(point, cached=False)
        for comp in self.components:
            avg = comp.timer.get_time_avg() if comp.timer else None
            if avg:
                # host-bridge components amortize the walker batch across
                # their callback pool: the per-walker cost the blocking
                # math should see is the single-eval time / pool size
                pool = self._callback_pool_size(comp)
                if pool > 1 and not getattr(comp, "jittable", False):
                    avg /= pool
                comp.set_measured_speed(1.0 / avg)
                self.log.debug(
                    "Measured speed of %s: %g evals/s", comp.get_name(),
                    1.0 / avg,
                )
        self._measured_speeds = {
            c.get_name(): c.get_speed() for c in self.components
        }

    def _speeds_of_params(self) -> tuple[list[list[str]], np.ndarray, np.ndarray]:
        """Blocks of params with equal component footprints, speeds, footprints."""
        dependence = self.sampled_dependence()
        comp_names = [c.get_name() for c in self._component_order]
        footprint_of = {}
        for p, comps in dependence.items():
            footprint_of[p] = tuple(
                1 if name in {c.get_name() for c in comps} else 0
                for name in comp_names
            )
        blocks_by_fp: dict[tuple, list[str]] = {}
        for p, fp in footprint_of.items():
            blocks_by_fp.setdefault(fp, []).append(p)
        blocks = list(blocks_by_fp.values())
        footprints = np.array(list(blocks_by_fp.keys()))
        speeds = np.array([
            c.get_speed() for c in self._component_order
        ])
        return blocks, speeds, footprints

    def get_param_blocking_for_sampler(
        self, oversample_power: float = 0.0, split_fast_slow: bool = False,
    ):
        """Optimal parameter blocks + oversampling factors for blocked samplers.

        Returns ``(blocks, oversample_factors)``, slowest block first.  With
        ``split_fast_slow``, blocks merge into two superblocks maximizing the
        log-cost gap (reference model.py:1399).
        """
        blocks, speeds, footprints = self._speeds_of_params()
        order, costs, oversample = sort_parameter_blocks(
            blocks, speeds, footprints, oversample_power=oversample_power
        )
        blocks_sorted = [blocks[i] for i in order]
        if split_fast_slow and len(blocks_sorted) > 1:
            # find split maximizing log-cost gap weighted by #params
            log_costs = np.log(costs)
            gaps = log_costs[:-1] - log_costs[1:]
            i_split = int(np.argmax(gaps)) + 1
            slow = [p for b in blocks_sorted[:i_split] for p in b]
            fast = [p for b in blocks_sorted[i_split:] for p in b]
            n_slow, n_fast = len(slow), len(fast)
            cost_slow = float(np.mean(costs[:i_split]))
            cost_fast = float(np.mean(costs[i_split:]))
            over_fast = max(1, int(np.round(
                (cost_slow / cost_fast) ** max(oversample_power, 1e-9)
                if oversample_power else cost_slow / cost_fast
            )))
            return [slow, fast], np.array([1, over_fast])
        return blocks_sorted, oversample

    def check_blocking(self, blocking):
        """Validate a manual blocking spec [(oversample, [params...]), ...]."""
        try:
            oversample_factors, blocks = zip(*blocking)
        except (TypeError, ValueError) as exc:
            raise LoggedError(
                self.log,
                "Manual blocking must be a list of (oversample, [params]) "
                "pairs; got %r", blocking,
            ) from exc
        all_params = [p for b in blocks for p in b]
        sampled = list(self.parameterization.sampled_params())
        if sorted(all_params) != sorted(sampled):
            raise LoggedError(
                self.log,
                "Manual blocking must contain every sampled parameter exactly "
                "once. Sampled: %r; given: %r", sampled, all_params,
            )
        if any(o != int(o) or o < 1 for o in oversample_factors):
            raise LoggedError(
                self.log, "Oversampling factors must be integers >= 1."
            )
        if list(oversample_factors) != sorted(oversample_factors):
            self.mpi_warning(
                "Oversampling factors not sorted ascending: the fast/slow "
                "hierarchy may be inverted."
            )
        return [list(b) for b in blocks], np.array(
            [int(o) for o in oversample_factors]
        )

    def dump_timing(self):
        rows = ComponentCollection(
            {c.get_name(): c for c in self.components}
        ).dump_timing()
        return rows

    def set_timing_on(self, on: bool):
        self.timing = on
        for comp in self.components:
            comp.set_timing_on(on)

    def close(self):
        for comp in self.components:
            comp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DummyModel:
    """Minimal model-shaped object for loading chains without components."""

    def __init__(self, info_params, info_likelihood, info_prior=None):
        self.parameterization = Parameterization(
            info_params, ignore_unused_sampled=True
        )
        self.prior = Prior(self.parameterization, info_prior)
        self.likelihood = {name: None for name in (info_likelihood or {})}


def get_model(
    info_or_yaml_or_file, debug=None, stop_at_error=None,
    packages_path=None, override=None,
) -> Model:
    """Build a :class:`Model` from an input dict/YAML (reference model.py:1604)."""
    info = load_input_dict(info_or_yaml_or_file)
    if override:
        from ..utils.tools import recursive_update

        info = recursive_update(info, override)
    if debug is not None:
        info["debug"] = debug
    if stop_at_error is not None:
        info["stop_at_error"] = stop_at_error
    if packages_path:
        info["packages_path"] = packages_path
    logger_setup(info.get("debug"))
    # ignore sampler/output blocks
    updated = update_info(info)
    return Model(
        updated.get("params") or {},
        updated.get("likelihood") or {},
        info_prior=updated.get("prior"),
        info_theory=updated.get("theory"),
        packages_path=updated.get("packages_path"),
        timing=updated.get("timing"),
        stop_at_error=bool(updated.get("stop_at_error", False)),
        matmul_precision=updated.get("matmul_precision", "highest"),
    )
