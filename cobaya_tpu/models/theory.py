"""Theory: base class of everything that computes, plus the Provider facade.

Capability parity with /root/reference/cobaya/theory.py: requirement
declaration (``get_requirements`` / conditional ``must_provide``), the
``calculate(state, want_derived, **params)`` contract, an LRU state cache for
the eager path, helper theories, speed attributes, and a ``Provider`` facade
routing ``get_X``/``get_param`` calls to the owning component.

TPU-first design: a component that sets ``jittable = True`` implements
``calculate_jax(params, want_derived) -> (products, derived)`` using jnp ops,
so the Model can fuse it into the jitted posterior evaluated for whole walker
batches.  Non-jittable components declare the shapes/dtypes of their products
via ``callback_output_spec`` and are bridged into the device program with a
batched ``jax.pure_callback`` (the "slow block" of the speed hierarchy).
"""

from __future__ import annotations

import threading
from collections import deque
from collections.abc import Mapping, Sequence
from typing import Any, Optional

from ..utils.log import LoggedError
from .component import CobayaComponent, ComponentCollection


def check_requirement(req) -> dict:
    """Normalize a requirements spec to {name: options-or-None}."""
    if req is None:
        return {}
    if isinstance(req, Mapping):
        return dict(req)
    if isinstance(req, str):
        return {req: None}
    if isinstance(req, Sequence):
        out = {}
        for r in req:
            if isinstance(r, str):
                out[r] = None
            elif isinstance(r, Sequence) and len(r) == 2:
                out[r[0]] = r[1]
            else:
                raise LoggedError(None, "Invalid requirement spec: %r", r)
        return out
    raise LoggedError(None, "Invalid requirements: %r", req)


class Theory(CobayaComponent):
    """Base class of calculators (theories and likelihoods)."""

    speed: float = -1  # evaluations per second; -1 = unknown
    stop_at_error: bool = False
    version: Optional[str] = None
    params: Optional[dict] = None  # params info from defaults file

    # TPU compute contract
    jittable: bool = True
    # host-bridge worker threads for non-jittable components: the batched
    # pure_callback fans the walker batch out over this many threads (theory
    # codes like CAMB release the GIL in their compiled cores, so threads
    # amortize slow evaluations the way the reference amortizes them across
    # MPI ranks, cf. /root/reference/cobaya/theories/camb/camb.py:675).
    # 0/None = serial; overridable via COBAYA_TPU_CALLBACK_POOL.
    callback_pool: Optional[int] = None

    _at_resume_prefer_new = ["speed", "stop_at_error", "version"]

    def __init__(self, info=None, name=None, timing=None, packages_path=None,
                 initialize=True, standalone=True):
        # None = "not yet assigned" sentinel (the assignment algorithm
        # distinguishes unset from explicitly-empty lists)
        self.input_params: list[str] | None = None
        self.output_params: list[str] | None = None
        self._measured_speed: float | None = None
        self._states: deque = deque(maxlen=3)
        self.provider: Provider | None = None
        self._helpers: dict[str, "Theory"] = {}
        # host-side object store for the jit callback bridge: non-jittable
        # components' per-walker states live here, addressed by int32 tokens
        # that ride the device program (see Model._component_jax_step)
        self._object_store: dict[int, dict] = {}
        self._object_counter: int = 0
        self._object_last_batch: int = 0
        self._object_lock = threading.Lock()
        # per-thread so pooled host-bridge workers can hold different
        # walkers' provider views concurrently
        self._callback_local = threading.local()
        super().__init__(info=info, name=name, timing=timing,
                         packages_path=packages_path, initialize=initialize,
                         standalone=standalone)

    def hoist(self, name: str, value):
        """A data table used in this component's traced path.

        Returns ``jnp.asarray(value)`` semantically, but lets samplers lift
        the array out of the compiled program and pass it as a runtime
        argument instead of an HLO literal (see :mod:`cobaya_tpu.ops.hoist`).
        Every ``jnp.asarray(self.<table>)`` in a ``logp_jax``/``calculate_jax``
        should be written ``self.hoist("<table>", self.<table>)``.
        """
        from ..ops.hoist import hoisted

        return hoisted(f"{self.get_name()}/{name}", value)

    # ---- requirements protocol ------------------------------------------------
    def get_requirements(self) -> dict | Sequence:
        """Unconditional requirements from other components."""
        return {}

    def must_provide(self, **requirements) -> dict | Sequence | None:
        """Called with what others need from this component; may return new
        conditional requirements of its own."""
        if requirements and not self.get_can_provide() \
                and not self.get_can_provide_methods():
            pass
        return None

    def get_can_provide(self) -> set | list:
        """Names of products this component can compute on request."""
        return []

    def get_can_provide_methods(self) -> dict:
        """{product_name: bound method} for get_X-style products."""
        methods = {}
        for k in dir(self.__class__):
            if k.startswith("get_") and k not in (
                "get_requirements", "get_can_provide", "get_can_provide_params",
                "get_can_provide_methods", "get_can_support_params",
                "get_allow_agnostic", "get_param", "get_result", "get_name",
                "get_version", "get_defaults", "get_annotations", "get_desc",
                "get_kind", "get_yaml_file", "get_bibtex", "get_class_options",
                "get_class_path", "get_qualified_class_name", "get_option",
                "get_root_file_name", "get_current_derived", "get_speed",
                "get_attr_list_with_helpers", "get_helper_theories",
            ):
                attr = getattr(self.__class__, k, None)
                if callable(attr) and not getattr(attr, "_is_abstract", False):
                    methods[k[4:]] = attr
        return methods

    def get_can_provide_params(self) -> Sequence[str]:
        """Derived params this component can compute."""
        if self.params:
            return [
                p for p, v in self.params.items()
                if (isinstance(v, Mapping) and v.get("derived")) or v is None
            ]
        return []

    def get_can_support_params(self) -> Sequence[str]:
        """Input params this component can absorb if asked to."""
        return []

    def get_allow_agnostic(self) -> bool:
        """Whether this component accepts any unassigned parameters."""
        return False

    def initialize_with_params(self):
        """Hook: input/output params have been assigned."""

    def initialize_with_provider(self, provider: "Provider"):
        self.provider = provider

    def get_helper_theories(self) -> dict[str, "Theory"]:
        return self._helpers

    def update_for_helper_theories(self, helpers: dict[str, "Theory"]):
        """Register helpers; if this component came with explicit
        input/output params, redistribute them between the helpers and the
        host by declared support (reference theory.py:347)."""
        self._helpers = dict(helpers)
        if not helpers:
            return
        components: list[Theory] = list(helpers.values()) + [self]
        for output, attr in enumerate(("input_params", "output_params")):
            pars = getattr(self, attr, None)
            if pars is None:  # unset sentinel: nothing explicit to split
                continue
            for component in components:
                if not component.get_allow_agnostic():
                    supported = (component.get_can_provide_params() if output
                                 else component.get_can_support_params())
                    setattr(component, attr, [p for p in pars if p in supported])
                    pars = [p for p in pars if p not in supported]
            for component in components:
                if component.get_allow_agnostic():
                    setattr(component, attr, pars)

    # ---- compute contract -------------------------------------------------------
    def calculate(self, state: dict, want_derived: bool = True,
                  **params_values_dict):
        """Eager computation: fill ``state['derived']`` and products.

        Default implementation delegates to :meth:`calculate_jax` so that
        jittable components only implement one method.  Upstream products are
        exposed under each provider component's name (the same view the
        jitted path threads through), backed by their current states.
        """
        provider_products = {}
        if self.provider is not None:
            for comp in self.provider.requirement_providers.values():
                provider_products.setdefault(
                    comp.get_name(), comp.current_state
                )
        products, derived = self.calculate_jax(
            params_values_dict, want_derived=want_derived,
            provider_products=provider_products,
        )
        state.update(products if isinstance(products, Mapping) else
                     {"products": products})
        state["derived"] = derived or {}
        # flat view of derived params: consumers resolving this component's
        # state as provider_products see the same keys as the traced path
        for k, v in (derived or {}).items():
            state.setdefault(k, v)

    def calculate_jax(
        self, params: Mapping[str, Any], want_derived: bool = True,
        provider_products: Mapping[str, Any] | None = None,
    ) -> tuple[dict, dict]:
        """Traced computation: return (products dict, derived dict) of jnp values."""
        return {}, {}

    def callback_output_spec(self) -> dict:
        """For non-jittable components: {product_name: ShapeDtypeStruct}."""
        return {}

    def callback_export(self, state: dict) -> dict:
        """Numeric views of a computed state for the jit bridge.

        Called by the host-callback bridge right after :meth:`calculate`;
        returned values are merged over the raw state when filling the
        declared :meth:`callback_output_spec` outputs.  Override to flatten
        structured products (e.g. a Cl dict) into the fixed-shape arrays
        that traced downstream consumers read.
        """
        return {}

    # ---- eager-path state cache --------------------------------------------------
    def check_cache_and_compute(self, params_values_dict: dict,
                                dependency_params=None,
                                want_derived: bool = True,
                                cached: bool = True) -> dict | bool:
        """Compute (or retrieve from LRU cache) the state for these params."""
        key = (
            tuple(sorted(params_values_dict.items())),
            tuple(dependency_params or ()),
        )
        if cached:
            for state in self._states:
                if state.get("_key") == key and (
                    not want_derived or state.get("derived") is not None
                ):
                    return state
        state: dict = {"_key": key, "derived": {} if want_derived else None}
        if self.timer:
            self.timer.start()
        try:
            result = self.calculate(state, want_derived, **params_values_dict)
        except Exception:
            if self.stop_at_error:
                raise
            self.log.debug("Computation failed for %r", params_values_dict)
            return False
        if result is False:
            return False
        if self.timer:
            self.timer.increment(self.log)
        self._states.appendleft(state)
        return state

    @property
    def _callback_view(self) -> dict | None:
        return getattr(self._callback_local, "view", None)

    @_callback_view.setter
    def _callback_view(self, value: dict | None):
        self._callback_local.view = value

    def get_current_derived(self) -> dict:
        if self._states:
            return self._states[0].get("derived") or {}
        return {}

    @property
    def current_derived(self) -> dict:
        """Derived params of the current state (reference theory.py:318)."""
        return self.get_current_derived()

    @property
    def type_list(self) -> list:
        """Labels classifying this component (reference theory.py:322)."""
        from ..utils.tools import str_to_list

        return str_to_list(getattr(self, "type", []) or [])

    @property
    def input_params_extra(self):
        """Params required from other components as inputs (theory.py:228)."""
        return getattr(self, "_input_params_extra", set())

    def set_cache_size(self, n: int):
        """Number of host-side computed states to cache (theory.py:234)."""
        import itertools

        n = max(int(n), 1)
        # _states is newest-first; keep the n newest (a plain deque(...,
        # maxlen=n) would evict from the left and keep the oldest)
        self._states = deque(itertools.islice(self._states, n), maxlen=n)

    def get_provider(self):
        """Object exposing get_X/get_param/get_result (theory.py:327)."""
        return self

    @property
    def current_state(self) -> dict:
        # inside a jit host callback, a consumer resolves this provider's
        # per-walker state from its token (object store); the view override
        # makes provider.get_X() calls per-walker correct
        if self._callback_view is not None:
            return self._callback_view
        return self._states[0] if self._states else {}

    # ---- object store (jit callback bridge) -----------------------------------
    def _store_state_object(self, state: dict, batch_size: int = 1) -> int:
        """Keep a per-walker state host-side; return its int32 token.

        Capacity scales with the walker batch (a token stays live while the
        device carry caches it across steps; rejected moves can keep an
        older token alive, hence the 4x margin).
        """
        # wrap below int32 max: only the ~4x-batch most recent tokens are
        # ever live, so wraparound collisions cannot occur
        with self._object_lock:
            self._object_counter = (self._object_counter + 1) % 2147483647
            token = self._object_counter
            self._object_store[token] = state
            self._object_last_batch = max(self._object_last_batch, batch_size)
            max_keep = max(1024, 4 * self._object_last_batch)
            while len(self._object_store) > max_keep:
                self._object_store.pop(next(iter(self._object_store)))
        return token

    def _resolve_state_object(self, token: int) -> dict:
        try:
            return self._object_store[int(token)]
        except KeyError:
            raise LoggedError(
                self.log, "Stale state token %s for component '%s': the "
                "host-side object store evicted it. This indicates more "
                "live walkers than store capacity; raise the batch margin.",
                token, self.get_name(),
            ) from None

    def get_param(self, p: str):
        """Value of derived param ``p`` in the current state."""
        return self.current_state.get("derived", {}).get(p)

    def get_result(self, name: str, **kwargs):
        return self.current_state.get(name)

    # ---- speed ---------------------------------------------------------------
    def get_speed(self) -> float:
        if self._measured_speed:
            return self._measured_speed
        return self.speed if self.speed > 0 else 100.0

    def set_measured_speed(self, speed: float):
        self._measured_speed = speed

    def get_attr_list_with_helpers(self, attr: str) -> list:
        out = list(getattr(self, attr, []))
        for helper in self._helpers.values():
            out += list(getattr(helper, attr, []))
        return out


class HelperTheory(Theory):
    """A theory instantiated internally by another component."""

    def get_helper_theories(self):
        return {}


class TheoryCollection(ComponentCollection):
    """Ordered collection of Theory instances."""

    def __init__(self, info_theory: Mapping | None, packages_path=None,
                 timing=None):
        super().__init__()
        from .component import get_component_class

        for name, info in (info_theory or {}).items():
            if isinstance(info, Theory):
                self.add_instance(name, info)
                continue
            info = dict(info or {})
            if isinstance(info.get("external"), Theory):
                self.add_instance(name, info["external"])
                continue
            if isinstance(info.get("external"), type) or callable(
                info.get("external")
            ):
                cls = info.pop("external")
                self.add_instance(name, cls(
                    info, name=name, timing=timing, packages_path=packages_path
                ))
                continue
            cls = get_component_class(
                name, kind="theory",
                component_path=info.pop("python_path", None),
                class_name=info.pop("class", None),
            )
            self.add_instance(name, cls(
                info, name=name, timing=timing, packages_path=packages_path
            ))


class Provider:
    """Facade through which components access their requirements.

    Routes ``get_X(...)`` to the component assigned to compute ``X``, and
    ``get_param(p)`` to the component computing derived param ``p``.
    Reference behavior: theory.py:447.
    """

    def __init__(self, model, requirement_providers: dict[str, Theory]):
        self.model = model
        self.requirement_providers = dict(requirement_providers)
        self.params: dict[str, Any] = {}

    def set_current_input_params(self, params: Mapping[str, Any]):
        self.params = dict(params)

    def get_param(self, param: str | Sequence[str]):
        if not isinstance(param, str):
            return [self.get_param(p) for p in param]
        if param in self.params:
            return self.params[param]
        provider = self.requirement_providers.get(param)
        if provider is not None:
            return provider.get_param(param)
        raise LoggedError(None, "Parameter '%s' not known to provider", param)

    def get_result(self, name: str, **kwargs):
        provider = self.requirement_providers.get(name)
        if provider is None:
            raise LoggedError(None, "No provider for requirement '%s'", name)
        return provider.get_result(name, **kwargs)

    # requirements that share a provider (requesting either yields both)
    _REQ_ALIASES = {"Pk_interpolator": "Pk_grid",
                    "Pk_grid": "Pk_interpolator"}

    def __getattr__(self, name: str):
        if name.startswith("get_"):
            requirement = name[4:]
            provider = self.requirement_providers.get(requirement)
            if provider is None:
                alias = self._REQ_ALIASES.get(requirement)
                if alias:
                    provider = self.requirement_providers.get(alias)
            if provider is not None:
                return getattr(provider, name)
        raise AttributeError(name)
