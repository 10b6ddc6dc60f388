"""Input processing: loading, defaults expansion, resume compatibility.

Capability parity with /root/reference/cobaya/input.py: inputs load from
files/strings/dicts; ``update_info`` expands every mentioned component with
its class defaults (merging per-likelihood default params into the global
params block and aggregated ``chi2__<type>`` derived params); unknown
components produce fuzzy "did you mean" errors; ``is_equal_info`` computes the
resume-compatibility diff honoring per-class resume preferences.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from typing import Any

from ..utils import conventions as cv
from ..utils.log import LoggedError, get_logger
from ..utils.tools import (
    deepcopy_where_possible,
    recursive_update,
    str_to_list,
)
from ..utils.typing_ import InputDict
from ..utils.yamlio import yaml_load, yaml_load_file
from .component import get_component_class
from .parameterization import expand_info_param, reduce_info_param

log = get_logger("input")


def load_input_dict(info_or_yaml_or_file) -> InputDict:
    """Accept a dict, a path to a YAML/.dill file, or a YAML string."""
    if isinstance(info_or_yaml_or_file, Mapping):
        return deepcopy_where_possible(dict(info_or_yaml_or_file))
    if isinstance(info_or_yaml_or_file, (str, os.PathLike)):
        text = str(info_or_yaml_or_file)
        if text.endswith((".dill", ".dill_pickle", ".pkl", ".pickle")):
            try:
                import dill as pickler  # type: ignore
            except ImportError:
                import pickle as pickler
            with open(text, "rb") as f:
                return pickler.load(f)
        if os.path.exists(text) or text.endswith((".yaml", ".yml")):
            return yaml_load_file(text) or {}
        if "\n" in text or ":" in text:
            return yaml_load(text) or {}
        raise LoggedError(log, "Input file not found: %s", text)
    raise LoggedError(
        log, "Invalid input type %s", type(info_or_yaml_or_file)
    )


def load_input(input_file: str) -> InputDict:
    """Load an input YAML/.dill file, defaulting the output prefix to the
    file name (reference input.py:112)."""
    info = load_input_dict(input_file)
    if "output" not in info:
        # default output prefix: the input file's base name (sans extension),
        # relative to the invocation directory (reference input.py:117)
        info["output"] = os.path.splitext(
            os.path.basename(str(input_file))
        )[0]
    elif info["output"] is None:
        log.warning("Output explicitly suppressed with 'output: null'")
    return info


def get_info_path(folder, prefix, infix=None, kind="updated") -> str:
    """Path to an info file saved by Output (reference input.py:192)."""
    if kind.lower() not in ("input", "updated"):
        raise LoggedError(
            log, "kind must be 'input' or 'updated', not %r", kind
        )
    from ..io.output import OutputReadOnly

    out = OutputReadOnly(os.path.join(folder or ".", prefix), infix=infix)
    return out.file_input if kind.lower() == "input" else out.file_updated


def load_info_overrides(info: InputDict, **flags) -> InputDict:
    """Apply CLI/function-level overrides (debug, resume, force, ...)."""
    info = deepcopy_where_possible(info)
    for flag, value in flags.items():
        if value is not None and value is not False:
            info[flag] = value
    return info


def get_used_components(*infos, return_infos: bool = False):
    """All component names mentioned in the given inputs, per kind."""
    components: dict[str, list] = {k: [] for k in cv.kinds}
    comp_infos: dict[str, dict] = {}
    for info in infos:
        for kind in cv.kinds:
            for name, comp_info in (info.get(kind) or {}).items():
                if name not in components[kind]:
                    components[kind].append(name)
                    comp_infos[name] = comp_info or {}
    return (components, comp_infos) if return_infos else components


def update_info(
    info: InputDict,
    add_aggr_chi2: bool = True,
    strict: bool = True,
) -> InputDict:
    """Expand the input with every mentioned component's defaults.

    For each component in the theory/likelihood/sampler blocks: resolve its
    class, merge defaults under the user's options (user wins), pull the
    component's default ``params`` into the global params block, and record
    the class version.  Reference behavior: input.py:310.
    """
    info = deepcopy_where_possible(info)
    updated: InputDict = {k: v for k, v in info.items() if k not in cv.kinds}
    default_params_from_components: dict[str, dict] = {}
    default_priors_from_components: dict[str, dict] = {}
    for kind in cv.kinds:
        block = info.get(kind)
        if block is None:
            continue
        if isinstance(block, str):
            block = {block: None}
        updated_block: dict[str, Any] = {}
        for name, comp_info in block.items():
            comp_info = dict(comp_info or {}) if isinstance(comp_info, Mapping) \
                else ({"external": comp_info} if comp_info is not None else {})
            external = comp_info.get("external")
            if external is not None and (
                not isinstance(external, str)
                or external.lstrip().startswith("lambda")
                or "import_module(" in external
            ):
                # external callables/classes/string-lambdas: defaults come
                # from the object itself
                if isinstance(external, type):
                    defaults = external.get_defaults(input_options=comp_info) \
                        if hasattr(external, "get_defaults") else {}
                else:
                    defaults = {}
            else:
                try:
                    cls = get_component_class(
                        name, kind=kind,
                        component_path=comp_info.get("python_path"),
                        class_name=comp_info.get("class"),
                    )
                except LoggedError:
                    if strict:
                        raise
                    cls = None
                defaults = cls.get_defaults(input_options=comp_info) if cls else {}
                if cls is not None:
                    version = getattr(cls, "version", None) or None
                    if version:
                        comp_info.setdefault("version", version)
            comp_params = defaults.pop("params", None)
            if comp_params:
                default_params_from_components[name] = comp_params
            comp_prior = defaults.pop("prior", None)
            if comp_prior:
                # components may ship external priors over their nuisance
                # params (e.g. Planck plik's joint SZ prior); merge them
                # into the global prior block (reference input.py:506)
                default_priors_from_components[name] = comp_prior
            merged = recursive_update(defaults, comp_info)
            # validate options against defaults (+ annotations)
            updated_block[name] = merged
        updated[kind] = updated_block
    # merge params: component defaults first (in order), then the user's
    params_info: dict = {}
    for comp_params in default_params_from_components.values():
        params_info = merge_params_info(params_info, comp_params)
    params_info = merge_params_info(params_info, info.get("params") or {})
    # merge component-shipped external priors (user's own block wins)
    if default_priors_from_components:
        priors_info = dict(updated.get("prior") or {})
        for comp_name, comp_prior in default_priors_from_components.items():
            for pname, spec in comp_prior.items():
                if pname in priors_info and priors_info[pname] != spec:
                    if pname in (info.get("prior") or {}):
                        continue  # explicit user override
                    raise LoggedError(
                        log, "Conflicting definitions of external prior "
                        "'%s' (from component '%s').", pname, comp_name,
                    )
                priors_info[pname] = spec
        updated["prior"] = priors_info
    if add_aggr_chi2 and updated.get("likelihood"):
        types = set()
        for comp_info in updated["likelihood"].values():
            types.update(str_to_list((comp_info or {}).get("type") or []))
        for t in sorted(types):
            name = cv.chi2_name(t)
            if name not in params_info:
                params_info[name] = {"latex": rf"\chi^2_\mathrm{{{t}}}",
                                     "derived": True}
    updated["params"] = params_info
    return updated


def merge_params_info(base: Mapping, update: Mapping) -> dict:
    """Merge two params blocks; the second one wins per-parameter.

    A parameter fully re-specified in ``update`` replaces the base spec, but
    presentation-only keys (latex) are inherited if not overridden.
    """
    out = deepcopy_where_possible(dict(base or {}))
    for p, new_info in (update or {}).items():
        if p not in out:
            out[p] = deepcopy_where_possible(new_info)
            continue
        old = expand_info_param(out[p])
        new = expand_info_param(new_info) if new_info is not None else {}
        if not new:
            out[p] = out[p] if new_info is None else new_info
            continue
        # role-defining keys present in new spec replace the old role entirely
        if any(k in new for k in ("prior", "value")) or new.get("derived") not in (
            None, True,
        ):
            merged = dict(new)
            for cosmetic in ("latex", "renames", "min", "max", "periodic"):
                if cosmetic not in merged and cosmetic in old:
                    merged[cosmetic] = old[cosmetic]
            # dropping role keys of the old spec
            if "prior" in new:
                merged.pop("value", None)
            if "value" in new:
                merged.pop("prior", None)
        else:
            merged = dict(old)
            merged.update(new)
        out[p] = merged
    return out


_IGNORE_AT_RESUME = {
    "debug", "resume", "force", "output", "test", "timing", "version",
    "packages_path", "stop_at_error", "matmul_precision",
}


def is_equal_info(
    info_old: Mapping, info_new: Mapping, strict: bool = False,
    print_not_log: bool = False, ignore_blocks=(),
) -> bool:
    """Whether two (updated) infos describe the same run (resume check)."""
    diffs = get_info_diff(info_old, info_new, strict=strict,
                          ignore_blocks=ignore_blocks)
    if diffs and print_not_log:
        print("Differences at resume:", diffs)
    elif diffs:
        log.info("Input differences found: %s", diffs)
    return not diffs


def get_info_diff(info_old, info_new, strict=False, ignore_blocks=()):
    diffs = []
    keys = (set(info_old) | set(info_new)) - set(ignore_blocks)
    if not strict:
        keys -= _IGNORE_AT_RESUME
    for key in keys:
        old, new = info_old.get(key), info_new.get(key)
        if key in cv.kinds and isinstance(old, Mapping) and isinstance(new, Mapping):
            if set(old) != set(new):
                diffs.append((key, sorted(set(old) ^ set(new))))
                continue
            for name in old:
                prefer_new, prefer_old = _resume_prefs(name, key)
                o, n = dict(old[name] or {}), dict(new[name] or {})
                for opt in set(o) | set(n):
                    if opt in prefer_new or opt in prefer_old or (
                        not strict and opt in _IGNORE_AT_RESUME
                    ):
                        continue
                    if not _values_equal(o.get(opt), n.get(opt)):
                        diffs.append((f"{key}:{name}:{opt}", o.get(opt), n.get(opt)))
        elif key == "params" and isinstance(old, Mapping) and isinstance(new, Mapping):
            if set(old) != set(new):
                diffs.append(("params", sorted(set(old) ^ set(new))))
                continue
            for p in old:
                if not _values_equal(
                    reduce_info_param(expand_info_param(old[p])),
                    reduce_info_param(expand_info_param(new[p])),
                ):
                    diffs.append((f"params:{p}", old[p], new[p]))
        else:
            if not _values_equal(old, new):
                diffs.append((key, old, new))
    return diffs


def _resume_prefs(name: str, kind: str):
    try:
        cls = get_component_class(name, kind=kind)
        return (set(getattr(cls, "_at_resume_prefer_new", ())),
                set(getattr(cls, "_at_resume_prefer_old", ())))
    except Exception:
        return set(), set()


def _values_equal(a, b) -> bool:
    import numpy as np

    if isinstance(a, Mapping) and isinstance(b, Mapping):
        return set(a) == set(b) and all(_values_equal(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return np.isclose(a, b, rtol=1e-10, atol=0, equal_nan=True)
    except TypeError:
        pass
    return a == b
