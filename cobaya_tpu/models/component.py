"""Component framework: defaults system, option handling, class loading.

Capability parity with /root/reference/cobaya/component.py: every framework
component (Theory, Likelihood, Sampler) reads default options from a
``<name>.yaml`` file next to its module and/or public class attributes, merged
down the inheritance chain; user-supplied options become instance attributes,
validated against type annotations; unknown options produce "did you mean"
errors; components carry a Timer; classes are resolved by name across internal
packages and external modules.
"""

from __future__ import annotations

import importlib
import importlib.util
import inspect
import os
import sys
import time
from collections.abc import Mapping
from typing import Any, Optional

from ..utils.log import HasLogger, LoggedError, get_logger
from ..utils.tools import deepcopy_where_possible, fuzzy_match, recursive_update
from ..utils.typing_ import enforce_type_checking, validate_type
from ..utils.yamlio import yaml_load_file

log = get_logger("component")


class ComponentNotFoundError(LoggedError):
    pass


class ComponentNotInstalledError(LoggedError):
    pass


class Timer:
    """Wall-clock timer for component evaluations.

    The first evaluation is tracked separately (compile/warm-up) and excluded
    from the mean used for speed measurements, matching the reference
    behavior (component.py:27).
    """

    def __init__(self):
        self.n = 0
        self.time_sum = 0.0
        self.first_time: float | None = None
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def increment(self, logger=None):
        delta = time.perf_counter() - self._start
        if self.first_time is None:
            self.first_time = delta
            if logger:
                logger.debug("First evaluation time: %g s", delta)
        else:
            self.n += 1
            self.time_sum += delta

    def get_time_avg(self) -> float | None:
        if self.n:
            return self.time_sum / self.n
        return self.first_time

    def n_avg(self) -> int:
        return self.n


class HasDefaults:
    """Mixin: class-level default options from YAML files + class attributes."""

    # attribute names never treated as options
    _non_option_attrs = {
        "log", "timer", "provider", "packages_path",
    }

    @classmethod
    def get_qualified_class_name(cls) -> str:
        module = cls.__module__
        if module.startswith("cobaya_tpu."):
            # internal components are referred to by their short name
            parts = module.split(".")
            # cobaya_tpu.likelihoods.gaussian_mixture.gaussian_mixture
            #   -> gaussian_mixture
            if len(parts) >= 3:
                return parts[2] if parts[-1] == parts[2] else ".".join(parts[2:])
            return cls.__name__
        return module + "." + cls.__name__

    @classmethod
    def get_class_path(cls) -> str:
        try:
            return os.path.dirname(os.path.abspath(inspect.getfile(cls)))
        except (TypeError, OSError):
            # classes defined interactively / via exec have no source file
            return ""

    @classmethod
    def get_root_file_name(cls) -> str:
        """Base path (no extension) for per-class data files (.yaml/.bibtex)."""
        module = sys.modules.get(cls.__module__)
        folder = cls.get_class_path()
        # own-class attribute only (reference component.py:158): inheriting
        # a base's file_base_name would misroute subclasses' associated
        # files (e.g. sn/pantheonplus.bibtex)
        name = cls.__dict__.get("file_base_name") or \
            cls.__module__.split(".")[-1]
        return os.path.join(folder, name)

    @classmethod
    def get_yaml_file(cls) -> Optional[str]:
        path = cls.get_root_file_name() + ".yaml"
        return path if os.path.exists(path) else None

    @classmethod
    def get_bibtex(cls) -> Optional[str]:
        # explicit per-class pointer (reference component.py:188): path
        # relative to the class's folder, e.g. shared family citations
        # like base_classes/planck2018.bibtex
        fname = cls.__dict__.get("bibtex_file")
        path = (os.path.join(cls.get_class_path(), fname) if fname
                else cls.get_root_file_name() + ".bibtex")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                return f.read()
        for base in cls.__mro__[1:]:
            if issubclass(base, HasDefaults) and base is not HasDefaults:
                result = base.get_bibtex()
                if result:
                    return result
        return None

    @classmethod
    def get_class_options(cls, input_options: Mapping | None = None) -> dict:
        """Default options from public class attributes (not yaml)."""
        opts = {}
        for klass in reversed(cls.__mro__):
            if klass in (object, HasDefaults, HasLogger):
                continue
            for k, v in klass.__dict__.items():
                if (
                    k.startswith("_")
                    or k in cls._non_option_attrs
                    or callable(v)
                    or isinstance(v, (property, classmethod, staticmethod))
                ):
                    continue
                opts[k] = v
        return deepcopy_where_possible(opts)

    @classmethod
    def get_defaults(
        cls, return_yaml: bool = False, yaml_expand_defaults: bool = True,
        input_options: Mapping | None = None,
    ):
        """Merged defaults: inherited yaml files (base first) + class attrs."""
        if return_yaml:
            path = cls.get_yaml_file()
            if path:
                with open(path, encoding="utf-8") as f:
                    return f.read()
            return ""
        defaults: dict = {}
        seen_yaml = []
        for klass in reversed(cls.__mro__):
            if not (isinstance(klass, type) and issubclass(klass, HasDefaults)):
                continue
            if klass in (HasDefaults,):
                continue
            path = klass.get_yaml_file()
            if path and path not in seen_yaml:
                seen_yaml.append(path)
                defaults = recursive_update(defaults, yaml_load_file(path) or {})
        defaults = recursive_update(defaults, cls.get_class_options(input_options))
        return defaults

    @classmethod
    def get_annotations(cls) -> dict:
        """Merged (resolved) type annotations over the class hierarchy.

        Annotations are stored as strings under ``from __future__ import
        annotations``; resolve them so runtime type validation sees real
        types (unresolvable ones are kept as strings and skipped by the
        validator).
        """
        import typing

        try:
            return dict(typing.get_type_hints(cls))
        except Exception:
            annotations: dict = {}
            for klass in reversed(cls.__mro__):
                annotations.update(
                    getattr(klass, "__annotations__", {}) or {}
                )
            return annotations

    @classmethod
    def get_desc(cls, info=None) -> str:
        return (cls.__doc__ or "").strip()

    @classmethod
    def get_kind(cls) -> str:
        """'theory' / 'likelihood' / 'sampler', determined from base classes."""
        from . import likelihood as _like
        from . import theory as _theory

        if issubclass(cls, _like.Likelihood):
            return "likelihood"
        if issubclass(cls, _theory.Theory):
            return "theory"
        return "sampler"


class CobayaComponent(HasLogger, HasDefaults):
    """Base class of all framework components.

    Options from merged defaults overridden by the user's ``info`` dict become
    instance attributes.  Reference behavior: component.py:352.
    """

    # option keys consumed by the constructor itself
    _reserved = {"class", "python_path", "package_install", "renames"}
    # option keys always accepted (parameter-routing directives)
    _always_known = {
        "input_params", "output_params", "input_params_prefix",
        "output_params_prefix", "provides", "requires", "params",
        "version", "external", "speed", "stop_at_error", "type", "aliases",
    }
    # resume preferences (per-option): new value wins / old value wins
    _at_resume_prefer_new: list[str] = []
    _at_resume_prefer_old: list[str] = []

    def __init__(
        self,
        info: Mapping | None = None,
        name: str | None = None,
        timing: bool | None = None,
        packages_path: str | None = None,
        initialize: bool = True,
        standalone: bool = True,
    ):
        self._name = name or self.get_qualified_class_name()
        self.packages_path = packages_path
        self.set_logger(self._name)
        info = dict(info or {})
        if standalone:
            defaults = self.get_defaults(input_options=info)
            defaults.pop("params", None)
            info = recursive_update(defaults, info)
        self._input_options = deepcopy_where_possible(info)
        self.set_instance_defaults()
        annotations = self.get_annotations()
        known = set(self.get_defaults(input_options=info)) | set(annotations)
        known |= {k for k in dir(self.__class__) if not k.startswith("_")}
        known |= self._always_known
        for k, v in info.items():
            if k in self._reserved:
                continue
            if k not in known:
                suggestions = fuzzy_match(k, sorted(known))
                hint = f" Did you mean: {suggestions}?" if suggestions else ""
                raise LoggedError(
                    self.log,
                    "Unknown option '%s' for component '%s'.%s",
                    k, self._name, hint,
                )
            if enforce_type_checking and k in annotations:
                validate_type(annotations[k], v, f"{self._name}.{k}")
            setattr(self, k, v)
        self.timer = Timer() if timing else None
        if initialize:
            self.initialize()

    def set_instance_defaults(self):
        """Hook to set instance-level defaults before options are applied."""

    def initialize(self):
        """Hook called after options are set."""

    def get_name(self) -> str:
        return self._name

    def __repr__(self):
        return f"{self.__class__.__name__}({self._name})"

    def close(self):
        """Release any held resources."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def set_timing_on(self, on: bool):
        self.timer = Timer() if on else None

    def get_version(self) -> str | dict | None:
        return None

    def has_version(self) -> bool:
        return False

    @classmethod
    def compare_versions(cls, version_a: str, version_b: str, equal=True) -> bool:
        from packaging import version as pv

        va, vb = pv.parse(version_a), pv.parse(version_b)
        return va >= vb if equal else va > vb

    def param_dict_debug(self, msg, params):
        if self.is_debug():
            self.log.debug(msg, dict(params))

    # install hooks (overridden by installable components)
    @classmethod
    def is_installed(cls, **kwargs) -> bool:
        return True

    @classmethod
    def install(cls, **kwargs):
        pass

    def get_option(self, name: str, default=None):
        return getattr(self, name, default)


class ComponentCollection(dict):
    """Ordered name -> component mapping with aggregate helpers."""

    def get_helper_theory_collection(self) -> "ComponentCollection":
        """Collection that receives helper theories (reference
        component.py:523); likelihoods route helpers to the theory
        collection."""
        return self

    def add_instance(self, name: str, component: CobayaComponent):
        """Add a component, pulling in any helper theories it creates
        (reference component.py:526): helpers join the (theory) collection
        so they participate in requirement resolution and blocking."""
        helpers = {}
        if hasattr(component, "get_helper_theories"):
            helpers = component.get_helper_theories() or {}
            component.update_for_helper_theories(helpers)
        self.get_helper_theory_collection().update(helpers)
        self[name] = component

    def dump_timing(self):
        rows = []
        for name, comp in self.items():
            timer = getattr(comp, "timer", None)
            if timer and timer.get_time_avg() is not None:
                rows.append((name, timer.get_time_avg(), timer.n_avg()))
        if rows:
            log.info("Average computation times:")
            for name, avg, n in sorted(rows, key=lambda r: -r[1]):
                log.info("  %-30s %10.6f s  (%d evaluations)", name, avg, n)
        return rows

    def get_versions(self, add_version_field=False) -> dict:
        out = {}
        for name, comp in self.items():
            v = comp.get_version()
            out[name] = {"version": v} if add_version_field else v
        return out

    def close(self):
        for comp in self.values():
            comp.close()


# --------------------------------------------------------------------------
# component class resolution
# --------------------------------------------------------------------------
_INTERNAL_PACKAGES = {
    "likelihood": "cobaya_tpu.likelihoods",
    "theory": "cobaya_tpu.theories",
    "sampler": "cobaya_tpu.samplers",
}


def _camel(name: str) -> str:
    return "".join(part.capitalize() for part in name.split("_"))


def get_available_internal_class_names(kind: str | None = None) -> list[str]:
    names = []
    for k, pkg_name in _INTERNAL_PACKAGES.items():
        if kind and k != kind:
            continue
        try:
            pkg = importlib.import_module(pkg_name)
        except ImportError:
            continue
        folder = os.path.dirname(pkg.__file__)
        for entry in sorted(os.listdir(folder)):
            path = os.path.join(folder, entry)
            if entry.startswith(("_", ".")):
                continue
            if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "__init__.py")
            ):
                names.append(entry)
            elif entry.endswith(".py"):
                names.append(entry[:-3])
    return names


def _class_from_module(module, name: str, kind: str | None):
    candidates = [name.split(".")[-1], _camel(name.split(".")[-1])]
    for cname in candidates:
        klass = getattr(module, cname, None)
        if isinstance(klass, type) and issubclass(klass, CobayaComponent):
            return klass
    defined_here = [
        v for v in vars(module).values()
        if isinstance(v, type) and issubclass(v, CobayaComponent)
        and v.__module__ == module.__name__
    ]
    # case-insensitive class-name match (e.g. 'camb' -> CAMB)
    short = name.split(".")[-1].lower()
    matches = [v for v in defined_here if v.__name__.lower() == short]
    if len(matches) == 1:
        return matches[0]
    # fallback: unique CobayaComponent subclass defined in the module
    if len(defined_here) == 1:
        return defined_here[0]
    return None


def get_component_class(
    name: str,
    kind: str | None = None,
    component_path: str | None = None,
    class_name: str | None = None,
    logger=None,
):
    """Resolve a component name to its class.

    Resolution order (reference behavior, component.py:598):
    1. explicit ``class_name`` / dotted external path (``pkg.module.Class``)
    2. internal package ``cobaya_tpu.<kind>s.<name>``
    3. external module on ``component_path``
    """
    logger = logger or log
    target = class_name or name
    # explicit path to a python file tree
    if component_path:
        module_name = target.split(".")[0]
        file_candidates = [
            os.path.join(component_path, module_name, "__init__.py"),
            os.path.join(component_path, module_name + ".py"),
        ]
        for fc in file_candidates:
            if os.path.exists(fc):
                spec = importlib.util.spec_from_file_location(module_name, fc)
                module = importlib.util.module_from_spec(spec)
                sys.modules[module_name] = module
                spec.loader.exec_module(module)
                klass = _class_from_module(module, target, kind)
                if klass:
                    return klass
        raise ComponentNotFoundError(
            logger, "Could not find component '%s' under path '%s'.",
            name, component_path,
        )
    # internal packages
    kinds = [kind] if kind else list(_INTERNAL_PACKAGES)
    for k in kinds:
        pkg = _INTERNAL_PACKAGES[k]
        for modname in (
            f"{pkg}.{target}.{target}", f"{pkg}.{target}", f"{pkg}.{target.split('.')[0]}",
        ):
            try:
                module = importlib.import_module(modname)
            except ImportError:
                continue
            klass = _class_from_module(module, target, k)
            if klass:
                return klass
    # fully-qualified external
    if "." in target:
        module_name, _, cls_name = target.rpartition(".")
        try:
            module = importlib.import_module(module_name)
            klass = getattr(module, cls_name, None)
            if isinstance(klass, type):
                return klass
        except ImportError:
            pass
    suggestions = fuzzy_match(name, get_available_internal_class_names(kind))
    hint = f" Did you mean: {suggestions}?" if suggestions else ""
    raise ComponentNotFoundError(
        logger, "Could not find component '%s' (kind: %s).%s", name, kind, hint
    )


def load_external_module(
    module_name: str,
    path: str | None = None,
    min_version: str | None = None,
    logger=None,
    not_installed_level: str = "error",
):
    """Import an external python module, optionally from an explicit path."""
    logger = logger or log
    try:
        if path:
            sys.path.insert(0, os.path.abspath(path))
            try:
                module = importlib.import_module(module_name)
            finally:
                sys.path.pop(0)
        else:
            module = importlib.import_module(module_name)
    except ImportError as exc:
        raise ComponentNotInstalledError(
            logger if not_installed_level == "error" else None,
            "Could not import module '%s'%s: %s",
            module_name, f" from {path}" if path else "", exc,
        ) from exc
    if min_version:
        version = getattr(module, "__version__", "0")
        from packaging import version as pv

        if pv.parse(str(version)) < pv.parse(str(min_version)):
            raise ComponentNotInstalledError(
                logger, "Module '%s' version %s < required %s",
                module_name, version, min_version,
            )
    return module
