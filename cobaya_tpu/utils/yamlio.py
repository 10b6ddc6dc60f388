"""YAML input/output.

Capability parity with /root/reference/cobaya/yaml.py: scientific-notation
floats without a dot (``1e5``) parse as floats, duplicate keys are an error,
the ``!defaults`` tag includes other YAML files' content as defaults, the
``!path`` tag substitutes the packages path, and the dumper knows how to
serialize numpy/JAX scalars and arrays, tuples, and callables.
"""

from __future__ import annotations

import os
import re
from collections.abc import Mapping
from typing import Any

import numpy as np
import yaml

from .log import LoggedError

_SCI_FLOAT_RE = re.compile(
    r"""^(?:
     [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)

PACKAGES_PATH_TAG = "!path"
DEFAULTS_TAG = "!defaults"


class YamlParseError(LoggedError):
    pass


class _Loader(yaml.SafeLoader):
    """SafeLoader + scientific floats + duplicate-key detection + tags."""

    current_file_dir: str | None = None
    packages_path: str | None = None


# YAML 1.1 resolves "1e5" as a string; re-register the float resolver with a
# regexp that accepts the dotless exponent form.
_Loader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _SCI_FLOAT_RE, list("-+0123456789.")
)


def _construct_mapping(loader: _Loader, node):
    loader.flatten_mapping(node)
    mapping = {}
    for key_node, value_node in node.value:
        key = loader.construct_object(key_node, deep=True)
        if key in mapping:
            raise YamlParseError(
                None, "Duplicate key %r in YAML input (line %d)",
                key, key_node.start_mark.line + 1,
            )
        mapping[key] = loader.construct_object(value_node, deep=True)
    return mapping


_Loader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _construct_mapping
)


def _construct_path(loader: _Loader, node):
    value = loader.construct_scalar(node)
    if loader.packages_path is None:
        raise YamlParseError(
            None,
            "The input contains a '%s' tag but no packages path is known.",
            PACKAGES_PATH_TAG,
        )
    return value.replace(PACKAGES_PATH_TAG, loader.packages_path)


def _construct_defaults(loader: _Loader, node):
    if loader.current_file_dir is None:
        raise YamlParseError(
            None,
            "'%s' tag can only be used when loading from a file.",
            DEFAULTS_TAG,
        )
    try:
        files = loader.construct_sequence(node)
    except yaml.constructor.ConstructorError:
        files = [loader.construct_scalar(node)]
    result: dict[str, Any] = {}
    for f in files:
        path = os.path.join(loader.current_file_dir, str(f))
        if not os.path.splitext(path)[1]:
            path += ".yaml"
        defaults = yaml_load_file(path, packages_path=loader.packages_path)
        result = deep_update(defaults, result)
    return result


_Loader.add_constructor(PACKAGES_PATH_TAG, _construct_path)
_Loader.add_constructor(DEFAULTS_TAG, _construct_defaults)
# Also trigger !path substitution when it appears mid-scalar.
_Loader.add_implicit_resolver(
    PACKAGES_PATH_TAG, re.compile(rf"^{PACKAGES_PATH_TAG}"), None
)


def deep_update(base: dict, update: Mapping) -> dict:
    """Recursively update ``base`` with ``update`` (update wins)."""
    for k, v in update.items():
        if isinstance(v, Mapping) and isinstance(base.get(k), Mapping):
            base[k] = deep_update(dict(base[k]), v)
        else:
            base[k] = v
    return base


def yaml_load(
    text: str,
    packages_path: str | None = None,
    file_dir: str | None = None,
) -> Any:
    class ContextLoader(_Loader):
        pass

    ContextLoader.current_file_dir = file_dir
    ContextLoader.packages_path = packages_path
    try:
        loaded = yaml.load(text, ContextLoader)
    except yaml.YAMLError as err:
        raise YamlParseError(None, "Error parsing YAML input:\n%s", err) from err
    # Hoist !defaults blocks: a mapping value produced by the tag merges into
    # the mapping that contains it.
    return loaded


def yaml_load_file(
    file_name: str, packages_path: str | None = None
) -> Any:
    with open(file_name, encoding="utf-8") as f:
        text = f.read()
    return yaml_load(
        text,
        packages_path=packages_path,
        file_dir=os.path.dirname(os.path.abspath(file_name)),
    )


class _Dumper(yaml.SafeDumper):
    pass


def _represent_none(dumper, _):
    return dumper.represent_scalar("tag:yaml.org,2002:null", "null")


def _represent_np_scalar(dumper, data):
    if isinstance(data, np.integer):
        return dumper.represent_int(int(data))
    return dumper.represent_float(float(data))


def _represent_array(dumper, data):
    return dumper.represent_list(np.asarray(data).tolist())


def _represent_tuple(dumper, data):
    return dumper.represent_list(list(data))


def _represent_callable(dumper, data):
    import inspect

    try:
        source = inspect.getsource(data).strip()
    except (OSError, TypeError):
        source = f"<callable {getattr(data, '__name__', repr(data))}>"
    return dumper.represent_str(source)


_Dumper.add_representer(type(None), _represent_none)
for np_type in (
    np.int8, np.int16, np.int32, np.int64, np.float16, np.float32, np.float64,
    np.bool_,
):
    _Dumper.add_representer(np_type, _represent_np_scalar)
_Dumper.add_representer(np.ndarray, _represent_array)
_Dumper.add_representer(tuple, _represent_tuple)
_Dumper.add_multi_representer(type(yaml_load), _represent_callable)  # functions


def _represent_opaque(dumper, data):
    # non-representable python objects (classes, instances) dump as `true`,
    # like the reference (yaml.py:263): the updated-info yaml then records
    # that the entry was given, without trying to serialize it
    return dumper.represent_scalar("tag:yaml.org,2002:bool", "true")


_Dumper.add_multi_representer(object, _represent_opaque)


def yaml_dump(data: Any, stream=None, **kwargs) -> str:
    # Convert JAX arrays to numpy lazily (avoid importing jax here).
    return yaml.dump(
        _sanitize(data), stream, Dumper=_Dumper, default_flow_style=False,
        allow_unicode=True, sort_keys=False, **kwargs,
    )


def _sanitize(obj: Any) -> Any:
    if isinstance(obj, Mapping):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(x) for x in obj]
    if hasattr(obj, "__array__") and not isinstance(obj, np.ndarray):
        arr = np.asarray(obj)
        if arr.ndim == 0:
            return arr.item()
        return arr.tolist()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def yaml_dump_file(file_name: str, data: Any, error_if_exists: bool = False):
    if error_if_exists and os.path.exists(file_name):
        raise OSError(f"File exists: {file_name}")
    with open(file_name, "w", encoding="utf-8") as f:
        f.write(yaml_dump(data))
